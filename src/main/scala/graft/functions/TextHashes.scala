package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native expressions for the per-document hash signatures of the dedup
  * pipeline. The composed formulation (explode shingles → 32/64 hash
  * aggregates → groupBy) shuffles O(docs·shingles) rows; these compute the
  * whole signature in one pass over the array INSIDE the scan stage —
  * map-side only, no explode, no shuffle. At 100 TB that converts the
  * dedup signature step from a full-corpus shuffle into a projection.
  */
object TextHashes {

  /** MinHash signature: for each permutation p, min over shingles of
    * XXH64(shingle bytes, seed=p). Output array<long>[numPerms]. */
  case class MinhashSig(child: Expression, numPerms: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_sig"
    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val mins = Array.fill(numPerms)(Long.MaxValue)
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val s = arr.getUTF8String(i)
        var p = 0
        while (p < numPerms) {
          val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, p.toLong)
          if (h < mins(p)) mins(p) = h
          p += 1
        }
        i += 1
      }
      new GenericArrayData(mins)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** 64-bit SimHash: sign of the per-bit ±1 sums of token hashes. */
  case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"
    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val counts = new Array[Int](64)
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
        i += 1
      }
      var sig = 0L
      var j = 0
      while (j < 64) { if (counts(j) > 0) sig |= (1L << j); j += 1 }
      java.lang.Long.valueOf(sig)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def minhashSig(shingles: Column, numPerms: Int): Column =
    GraftBridge.column(MinhashSig(GraftBridge.expression(shingles), numPerms))

  def simhash64(tokens: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(tokens)))
}
