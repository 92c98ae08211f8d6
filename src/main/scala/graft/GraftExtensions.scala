package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{CosineSim, TextHashes}

/** SparkSessionExtensions entry point: registers the native Catalyst
  * expressions as SQL functions, so `spark.sql` users get the same
  * codegen'd hot paths as the DataFrame API:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  * spark.sql("SELECT cosine_sim(a.embedding, b.embedding) FROM ...")
  * }}}
  *
  * Registered: cosine_sim(arr, arr), simhash64(tokens),
  * minhash_sig(shingles, numPerms), hyperplane_sigs(vec, planes, tables),
  * the misra_gries(token, capacity) and
  * misra_gries_weighted(token, weight, capacity) heavy-hitters aggregates,
  * and the engine-portable (mod-prime, SQL-replayable) family the driver
  * oracles verify: simhash_poly64(tokens),
  * minhash_sig_poly(shingles, numPerms),
  * minhash_shingle_poly(tokens, k, numPerms).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be an integer literal, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", name) {
      override def getUsage: String = usage
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two double arrays"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_sim(a, b)")
        CosineSim(args(0), args(1))
      }))

    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of a string array"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash64(tokens)")
        TextHashes.SimHash64(args(0))
      }))

    ext.injectFunction((FunctionIdentifier("misra_gries"),
      info("misra_gries", "misra_gries(token, capacity) - heavy-hitters summary " +
        "aggregate: array<struct<token,n_occurrences>> sorted by count desc; exact " +
        "when capacity >= distinct keys"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "misra_gries(token, capacity)")
        graft.functions.MisraGries(args(0), intArg(args(1), "misra_gries", 2))
      }))

    ext.injectFunction((FunctionIdentifier("misra_gries_weighted"),
      info("misra_gries_weighted", "misra_gries_weighted(token, weight, capacity) - " +
        "weighted heavy-hitters summary aggregate (each row counts `weight`); exact " +
        "when capacity >= distinct keys"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "misra_gries_weighted(token, weight, capacity)")
        graft.functions.MisraGriesWeighted(args(0), args(1),
          intArg(args(2), "misra_gries_weighted", 3))
      }))

    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(shingles, numPerms) - MinHash signature array"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "minhash_sig(shingles, numPerms)")
        TextHashes.MinhashSig(args(0), intArg(args(1), "minhash_sig", 2))
      }))

    ext.injectFunction((FunctionIdentifier("simhash_poly64"),
      info("simhash_poly64",
        "simhash_poly64(tokens) - portable (mod-prime) 64-bit SimHash of a string array"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash_poly64(tokens)")
        TextHashes.SimHashPoly64(args(0))
      }))

    ext.injectFunction((FunctionIdentifier("minhash_sig_poly"),
      info("minhash_sig_poly",
        "minhash_sig_poly(shingles, numPerms) - portable (mod-prime) MinHash signature array"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "minhash_sig_poly(shingles, numPerms)")
        TextHashes.MinhashSigPoly(args(0), intArg(args(1), "minhash_sig_poly", 2))
      }))

    ext.injectFunction((FunctionIdentifier("minhash_shingle_poly"),
      info("minhash_shingle_poly",
        "minhash_shingle_poly(tokens, k, numPerms) - fused k-shingling + portable MinHash"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "minhash_shingle_poly(tokens, k, numPerms)")
        TextHashes.MinhashShinglePoly(args(0),
          intArg(args(1), "minhash_shingle_poly", 2), intArg(args(2), "minhash_shingle_poly", 3))
      }))

    ext.injectFunction((FunctionIdentifier("hyperplane_sigs"),
      info("hyperplane_sigs",
        "hyperplane_sigs(vec, planes, tables) - per-table random-hyperplane LSH signatures"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "hyperplane_sigs(vec, planes, tables)")
        TextHashes.HyperplaneSigs(args(0),
          intArg(args(1), "hyperplane_sigs", 2), intArg(args(2), "hyperplane_sigs", 3))
      }))
  }
}
