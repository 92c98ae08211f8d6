package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface of the native expressions, wired via
  * spark.sql.extensions — SQL and DataFrame paths must agree. */
class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .appName("graft-ext-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("cosine_sim callable from SQL, agrees with the Column API") {
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0d, 2.0d, 0.0d), array(1.0d, 2.0d, 0.0d)) AS same, " +
      "cosine_sim(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS orth, " +
      "cosine_sim(array(0.0d, 0.0d), array(1.0d, 1.0d)) AS zero").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
    assert(r.getDouble(2) == 0.0)
  }

  test("simhash64 / minhash_sig / hyperplane_sigs callable from SQL") {
    val r = spark.sql(
      "SELECT simhash64(split('the quick brown fox', ' ')) AS sh, " +
      "minhash_sig(split('the quick brown fox', ' '), 4) AS mh, " +
      "hyperplane_sigs(array(1.0d, -1.0d, 0.5d), 4, 2) AS hp").head()
    // SQL results must equal the Column-API expressions on the same input
    import org.apache.spark.sql.functions._
    val viaCols = spark.range(1).select(
      graft.functions.TextHashes.simhash64(split(lit("the quick brown fox"), " ")).as("sh"),
      graft.functions.TextHashes.minhashSig(split(lit("the quick brown fox"), " "), 4).as("mh"),
      graft.functions.TextHashes.hyperplaneSigs(
        array(lit(1.0), lit(-1.0), lit(0.5)), 4, 2).as("hp")).head()
    assert(r.getLong(0) == viaCols.getLong(0))
    assert(r.getSeq[Long](1) == viaCols.getSeq[Long](1))
    assert(r.getSeq[Int](2) == viaCols.getSeq[Int](2))
  }

  test("portable hash family callable from SQL, equal to the Column API") {
    val r = spark.sql(
      "SELECT simhash_poly64(split('the quick brown fox', ' ')) AS sh, " +
      "minhash_sig_poly(split('the quick brown fox', ' '), 4) AS mh, " +
      "minhash_shingle_poly(split('the quick brown fox jumps', ' '), 3, 4) AS mhs").head()
    import org.apache.spark.sql.functions._
    val viaCols = spark.range(1).select(
      graft.functions.TextHashes.simhashPoly64(split(lit("the quick brown fox"), " ")).as("sh"),
      graft.functions.TextHashes.minhashSigPoly(split(lit("the quick brown fox"), " "), 4).as("mh"),
      graft.functions.TextHashes.minhashShinglePoly(
        split(lit("the quick brown fox jumps"), " "), 3, 4).as("mhs")).head()
    assert(r.getLong(0) == viaCols.getLong(0))
    assert(r.getSeq[Long](1) == viaCols.getSeq[Long](1))
    assert(r.getSeq[Long](2) == viaCols.getSeq[Long](2))
  }

  test("misra_gries callable from SQL as a real aggregate, GROUP BY included") {
    val rows = spark.sql(
      "SELECT g, misra_gries(t, 16) AS mg FROM VALUES " +
      "(1, 'a'), (1, 'a'), (1, 'b'), (2, 'c') AS v(g, t) GROUP BY g ORDER BY g")
      .collect()
    val g1 = rows(0).getSeq[org.apache.spark.sql.Row](1)
      .map(r => r.getString(0) -> r.getLong(1))
    assert(g1 == Seq("a" -> 2L, "b" -> 1L))
    val g2 = rows(1).getSeq[org.apache.spark.sql.Row](1)
      .map(r => r.getString(0) -> r.getLong(1))
    assert(g2 == Seq("c" -> 1L))
  }

  test("misra_gries_weighted callable from SQL, weights summed per key") {
    val rows = spark.sql(
      "SELECT misra_gries_weighted(t, w, 16) AS mg FROM VALUES " +
      "('a', 3), ('a', 2), ('b', 4), ('c', 1) AS v(t, w)")
      .collect()
    val got = rows(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1))
    assert(got == Seq("a" -> 5L, "b" -> 4L, "c" -> 1L))
  }

  test("non-literal period argument is rejected with a clear error") {
    val e = intercept[Exception](
      spark.sql("SELECT minhash_sig(array('a'), CAST(rand() * 4 AS INT))").head())
    assert(e.getMessage.contains("integer literal"))
  }
}
