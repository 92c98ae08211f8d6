package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, NumericType, StringType, TimestampNTZType, TimestampType}

/** One-pass column profiling — the schema-drift / data-quality sweep a
  * training-data pipeline runs on every ingested drop before anything
  * else touches it (row counts, null fractions, cardinalities, ranges).
  *
  * Scale shape: ONE aggregation over the table produces every per-column
  * statistic — no per-column scans, no driver iteration over columns at
  * runtime (the column loop unrolls at PLAN time into one wide agg).
  * count(DISTINCT …) over several columns plans as Spark's expand +
  * partial-aggregate pipeline: rows multiply by the distinct-column
  * count BUT each leg carries only its own column, partial aggregation
  * runs map-side, and nothing collects. The long-format pivot at the
  * end is a literal array explode of the SINGLE agg row — free.
  * For corpora where exact distinct counts are not worth their shuffle,
  * swap count_distinct for approx_count_distinct at the call site — the
  * shape is otherwise identical (the length_quantiles_approx posture).
  */
object Profile {

  /** Profile `cols` of `df` in one aggregation pass. Output: one row per
    * column — (column, n_rows, n_nulls, n_distinct, min_num, max_num,
    * min_str, max_str); numeric ranges land in min/max_num (cast to
    * double), string ranges in min/max_str, the other pair stays null —
    * so the frame unions heterogeneous column types without lossy
    * stringification. Timestamp columns profile as epoch MICROSECONDS
    * and date columns as epoch DAYS in the numeric slot (min/max taken
    * over the converted value — monotone, so identical to converting the
    * typed extremes; counts/distincts run on the original column) —
    * events.ts-style drift columns need no manual cast.
    *
    * Precision contract for min/max_num: the slot is an IEEE double, so
    * integral values above 2^53 and high-precision DecimalType ranges
    * round to the nearest representable double (epoch micros sit at
    * ~1.7e15, well inside exact range). Corpora needing exact wide
    * ranges should keep them in a typed sidecar — the layout `_manifest`
    * does exactly that. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: give at least one column")
    // (name, numeric-image expr or null, is-numeric, is-string)
    val kinds: Seq[(String, Column, Boolean, Boolean)] = cols.map { c =>
      df.schema(c).dataType match {
        case StringType     => (c, col(c), false, true)
        case _: NumericType => (c, col(c), true, false)
        case TimestampType  => (c, unix_micros(col(c)), true, false)
        // NTZ (what parquet timestamps without tz metadata read as):
        // interpret in the session zone — run profiling under UTC, the
        // Tables.eventsNs contract, so the image equals DuckDB's epoch
        case TimestampNTZType => (c, unix_micros(col(c).cast(TimestampType)), true, false)
        case DateType       => (c, unix_date(col(c)), true, false)
        case other          => throw new IllegalArgumentException(
          s"profile: column $c has unsupported type $other — profile " +
          "numeric, string, timestamp and date columns (cast or hash the rest first)")
      }
    }
    val aggs: Seq[Column] =
      count(lit(1)).as("__rows") +: kinds.flatMap { case (c, v, isNum, _) =>
        Seq(
          count(col(c)).as(s"__nn_$c"),
          count_distinct(col(c)).as(s"__nd_$c"),
          (if (isNum) min(v).cast("double") else min(v)).as(s"__min_$c"),
          (if (isNum) max(v).cast("double") else max(v)).as(s"__max_$c"))
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = kinds.map { case (c, _, isNum, isStr) =>
      struct(
        lit(c).as("column"),
        col("__rows").as("n_rows"),
        (col("__rows") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        (if (isNum) col(s"__min_$c") else lit(null).cast("double")).as("min_num"),
        (if (isNum) col(s"__max_$c") else lit(null).cast("double")).as("max_num"),
        (if (isStr) col(s"__min_$c") else lit(null).cast("string")).as("min_str"),
        (if (isStr) col(s"__max_$c") else lit(null).cast("string")).as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** The 100 TB leg of the cardinality half, hash-gated via the
    * bound-twin pattern (the quantileBoundCheck posture): per column,
    * approx_count_distinct's HLL++ estimate beside the exact count and a
    * boolean asserting the estimate sits inside `tol` × the sketch's
    * configured relative standard deviation. The HLL register state is a
    * pure max-merge over a deterministic hash, so the estimate — and
    * therefore the boolean — is a FIXED function of the input set
    * (order- and partitioning-independent): TRUE in the oracle, and a
    * sketch drifting outside its guarantee fails the hash rather than
    * passing silently. Production profiling at corpus scale runs the
    * approx column alone (no exact pass, no distinct-value shuffle);
    * the exact leg here exists to gate the sketch. */
  def profileBoundCheck(df: DataFrame, cols: Seq[String],
                        rsd: Double = 0.05, tol: Double = 4.0): DataFrame = {
    require(cols.nonEmpty, "profileBoundCheck: give at least one column")
    val aggs: Seq[Column] =
      count(lit(1)).as("__rows") +: cols.flatMap { c =>
        Seq(count(col(c)).as(s"__nn_$c"),
          count_distinct(col(c)).as(s"__nd_$c"),
          approx_count_distinct(col(c), rsd).as(s"__ad_$c"))
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("__rows").as("n_rows"),
        (col("__rows") - col(s"__nn_$c")).as("n_nulls"),
        (abs(col(s"__ad_$c") - col(s"__nd_$c"))
          <= lit(tol * rsd) * col(s"__nd_$c")).as("nd_ok"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** The INCREMENTAL half of profiling — what a growing corpus actually
    * needs: profile each drop once, MERGE the profiles, never rescan
    * resident data. Counts add, typed ranges min/max — exact under
    * merge — and the cardinality term rides a DataSketches HLL sketch
    * ([[org.apache.spark.sql.functions.hll_sketch_agg]]): register
    * states are max-merges, so a union of per-drop sketches estimates
    * the UNION's cardinality with the same guarantee as one pass over
    * everything. Output = [[profile]]'s row shape with the sketch
    * binary in place of the exact distinct count. Integral, string,
    * timestamp and date columns (the datetime types enter as their
    * epoch-integral image — micros / days — for both the sketch and the
    * ranges, so per-drop sketches of a time column union exactly like
    * any long column); hash or cast anything else, exactly the
    * constraint DataSketches itself imposes. */
  def profileSketch(df: DataFrame, cols: Seq[String],
                    lgConfigK: Int = 12): DataFrame = {
    require(cols.nonEmpty, "profileSketch: give at least one column")
    import org.apache.spark.sql.types._
    val kinds: Seq[(String, Column, Boolean, Boolean)] = cols.map { c =>
      df.schema(c).dataType match {
        case StringType => (c, col(c), false, true)
        case ByteType | ShortType | IntegerType | LongType => (c, col(c), true, false)
        case TimestampType => (c, unix_micros(col(c)), true, false)
        case TimestampNTZType => (c, unix_micros(col(c).cast(TimestampType)), true, false)
        case DateType => (c, unix_date(col(c)), true, false)
        case other => throw new IllegalArgumentException(
          s"profileSketch: column $c has type $other — HLL sketches take " +
          "integral, string, timestamp and date columns; cast or hash the rest first")
      }
    }
    val aggs: Seq[Column] =
      count(lit(1)).as("__rows") +: kinds.flatMap { case (c, v, isNum, _) =>
        Seq(count(col(c)).as(s"__nn_$c"),
          hll_sketch_agg(v, lit(lgConfigK)).as(s"__sk_$c"),
          (if (isNum) min(v).cast("double") else min(v)).as(s"__min_$c"),
          (if (isNum) max(v).cast("double") else max(v)).as(s"__max_$c"))
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = kinds.map { case (c, _, isNum, isStr) =>
      struct(
        lit(c).as("column"),
        col("__rows").as("n_rows"),
        (col("__rows") - col(s"__nn_$c")).as("n_nulls"),
        (if (isNum) col(s"__min_$c") else lit(null).cast("double")).as("min_num"),
        (if (isNum) col(s"__max_$c") else lit(null).cast("double")).as("max_num"),
        (if (isStr) col(s"__min_$c") else lit(null).cast("string")).as("min_str"),
        (if (isStr) col(s"__max_$c") else lit(null).cast("string")).as("max_str"),
        col(s"__sk_$c").as("nd_sketch"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Merge any union of [[profileSketch]] frames into one profile per
    * column: counts SUM, ranges MIN/MAX (both exact under merge), HLL
    * sketches UNION → estimate. This is the whole point of the sketch
    * shape: profiling a 100 TB corpus is one pass per DROP plus this
    * metadata-scale aggregation — the resident data never rescans, and
    * the estimate carries the single-pass sketch's guarantee because
    * register max-merge is associative and order-independent. */
  def profileMerge(parts: DataFrame): DataFrame =
    parts.groupBy("column").agg(
      sum("n_rows").as("n_rows"),
      sum("n_nulls").as("n_nulls"),
      min("min_num").as("min_num"), max("max_num").as("max_num"),
      min("min_str").as("min_str"), max("max_str").as("max_str"),
      round(hll_sketch_estimate(hll_union_agg(col("nd_sketch"))))
        .cast("long").as("n_distinct_est"))
}
