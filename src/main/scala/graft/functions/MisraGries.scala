package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Misra–Gries heavy-hitters summary as a native Catalyst
  * `TypedImperativeAggregate` — the bounded-memory answer to "top tokens
  * of a 100 TB corpus":
  *
  *   - each map-side partial holds AT MOST `capacity` (token, count)
  *     entries whatever the data looks like (Misra & Gries 1982: an
  *     unseen token past capacity decrements every counter instead of
  *     growing the map);
  *   - partials merge by union-sum then subtracting the (capacity+1)-th
  *     largest count (Agarwal et al., "Mergeable Summaries", PODS 2012),
  *     so the reduce side sees O(partitions · capacity) entries, never a
  *     per-token shuffle — no hot-token reducer at any corpus size;
  *   - estimates carry the classic one-sided bound: true_count ≥
  *     estimate ≥ true_count − N/(capacity+1), and any token with
  *     frequency above N/(capacity+1) is guaranteed present.
  *
  * EXACTNESS ESCAPE: if `capacity` ≥ the number of distinct keys, no
  * decrement ever fires (update never overflows, merged unions never
  * exceed capacity), so every count is exact — which is what lets a
  * registered query run the genuine sketch code path and still be
  * hash-verified against an exact SQL oracle. In the approximate regime
  * the surviving set depends on partition layout (the bound above holds
  * for every layout; the specific casualties differ).
  *
  * Buffer serialization is a flat length-prefixed byte stream (no Java
  * serialization on the shuffle path).
  */
case class MisraGries(child: Expression, capacity: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(b: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val t = v.asInstanceOf[UTF8String].toString
      b.get(t) match {
        case Some(c) => b.update(t, c + 1)
        case None if b.size < capacity => b.update(t, 1L)
        case None =>
          // the MG step: a token with no counter pays by decrementing
          // every counter; counters hitting zero free their slot
          val ks = b.keys.toArray
          var i = 0
          while (i < ks.length) {
            val c = b(ks(i))
            if (c == 1L) b.remove(ks(i)) else b.update(ks(i), c - 1L)
            i += 1
          }
      }
    }
    b
  }

  override def merge(b: mutable.HashMap[String, Long], o: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    o.foreach { case (k, c) => b.update(k, b.getOrElse(k, 0L) + c) }
    if (b.size > capacity) {
      // subtract the (capacity+1)-th largest count from everyone; all
      // entries at or below it drop, so the result fits capacity again
      val counts = b.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - capacity - 1)
      val ks = b.keys.toArray
      var i = 0
      while (i < ks.length) {
        val c = b(ks(i)) - sub
        if (c <= 0L) b.remove(ks(i)) else b.update(ks(i), c)
        i += 1
      }
    }
    b
  }

  override def eval(b: mutable.HashMap[String, Long]): Any = {
    val rows: Array[Any] = b.toArray.sortBy { case (t, c) => (-c, t) }
      .map { case (t, c) => InternalRow(UTF8String.fromString(t), c) }
    new GenericArrayData(rows)
  }

  override def serialize(b: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(b.size)
    b.foreach { case (k, c) =>
      val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt()); in.readFully(kb)
      b.update(new String(kb, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    b
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType), StructField("n_occurrences", LongType))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override def prettyName: String = "misra_gries"

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MisraGries {
  /** Aggregate Column: array<struct<token,n_occurrences>> sorted by
    * (count desc, token asc). */
  def misraGries(c: Column, capacity: Int): Column =
    GraftBridge.column(
      MisraGries(GraftBridge.expression(c), capacity).toAggregateExpression())
}
