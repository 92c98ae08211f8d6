package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables and partitioned layouts — the two STORAGE-side levers
  * that remove work from every downstream query, which is the whole game
  * at 100 TB:
  *
  *  - '''Bucketing''' pre-shuffles a table ONCE at write time
  *    (`bucketBy(n, key)`): every later equi-join / aggregation on the
  *    bucket key then reads co-located buckets and skips its exchange
  *    entirely. A fact table joined by a dozen nightly queries pays one
  *    shuffle instead of twelve — and the shuffle it pays is the
  *    write-side one you were doing anyway. `sortBy` additionally orders
  *    rows inside each bucket file, letting sort-merge joins skip their
  *    per-task sort when each bucket lands in one file.
  *
  *  - '''Partitioned layout''' (`partitionBy(col)`) turns a predicate on
  *    the partition column into directory pruning: a `lang = 'en'` scan
  *    of a corpus partitioned by language reads only the `lang=en`
  *    directory — the other languages cost ZERO I/O, no footer reads,
  *    nothing. With dynamic partition pruning (Spark inserts a runtime
  *    subquery filter from the dimension side of a join) the same pruning
  *    applies even when the wanted partitions are only known at run time.
  *
  * Both are plan-pinned in PlanSpec: the bucketed join executes with no
  * ShuffleExchange, the partitioned scan shows a pushed PartitionFilter,
  * and the joined scan carries a dynamicpruning subquery.
  */
object Bucketing {

  /** Write `df` as an external bucketed (and optionally bucket-sorted)
    * table at `path`, registered as `tableName` in the session catalog.
    * The write performs the one hash-exchange on `bucketCol` that all
    * downstream bucket-key joins and aggregations then avoid.
    */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
                    bucketCol: String, numBuckets: Int,
                    sortCol: Option[String] = None): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
    val w = df.write.mode("overwrite").option("path", path)
      .bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(s => w.sortBy(s)).format("parquet").saveAsTable(tableName)
  }

  /** Join two same-bucketed catalog tables on the bucket key. With equal
    * bucket counts on both sides the physical plan is a sort-merge join
    * over the bucketed scans directly — no ShuffleExchange on either side
    * (the property PlanSpec pins with broadcast disabled).
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   keys: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys)

  /** Write `df` partitioned by `partCols` (hive-style `col=value`
    * directories). Reads back with a partition-column predicate touch only
    * the matching directories.
    */
  def writePartitioned(df: DataFrame, path: String, partCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partCols: _*).parquet(path)
}
