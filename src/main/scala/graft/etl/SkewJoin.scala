package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the standing fix when one join key
  * carries a disproportionate share of the rows (a null-ish default id,
  * one hot instrument, one dominant language) and the key's reducer
  * becomes the straggler.
  *
  * AQE's skew-join split already handles most sort-merge cases at
  * runtime; salting remains the right tool when AQE can't help — a
  * skewed shuffle-hash join, a streaming join (no runtime re-plan), or a
  * hot key so large that even split partitions spill. The trade: the
  * small side is replicated `saltBuckets`× (it must be small-ish, though
  * not necessarily broadcastable), and in exchange the hot key's rows
  * spread over `saltBuckets` reducers.
  *
  * The big side's salt defaults to a hash of its ENTIRE row — no
  * unique-id assumption, and task retries reproduce the same salt
  * (monotonically_increasing_id would not, forcing full-stage
  * recomputation on fetch failure). The caveat: byte-identical duplicate
  * rows all hash to ONE salt, so a hot key consisting of exact copies
  * still funnels into one reducer — when the big side has a unique (or
  * merely high-cardinality) column, pass it as `saltOn` and the salt
  * spreads every row regardless of duplication. Supported join types:
  * inner and left_outer — the salted small side makes right/full
  * semantics wrong (unmatched replicas would surface `saltBuckets`
  * times), so they are rejected rather than silently broken.
  */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltBuckets: Int, joinType: String = "inner",
                 saltOn: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    require(Seq("inner", "left", "left_outer", "leftouter").contains(joinType),
      s"salting preserves inner/left semantics only, got $joinType")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "a __salt column already exists — rename it before salting")
    val saltSrc = saltOn.getOrElse(xxhash64(struct(big.columns.map(col): _*)))
    val bigS = big.withColumn("__salt", pmod(xxhash64(saltSrc), lit(saltBuckets.toLong)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    bigS.join(smallS, keys :+ "__salt", joinType).drop("__salt")
  }
}
