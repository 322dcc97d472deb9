package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions at session build time, so
  * `spark.sql("SELECT graft_simhash(...)")` works on any session built
  * with `.withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.GraftExtensions`) — the standard way a
  * Spark library ships engine extensions to a cluster.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  // analysis-time literal check with a per-function error message —
  // a column argument here would otherwise surface as an opaque NPE/CCE
  private def intArg(fn: String, e: Expression): Int =
    text.TextExprs.intLiteral(fn, e)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => plans.LevenshteinThresholdRule)
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[text.TextExprs.TokenShingles].getName, "graft_shingles"),
      (es: Seq[Expression]) => text.TextExprs.TokenShingles(es.head, intArg("graft_shingles", es(1)))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[text.TextExprs.MinHashSignature].getName, "graft_minhash"),
      (es: Seq[Expression]) => text.TextExprs.MinHashSignature(es.head,
        intArg("graft_minhash", es(1)),
        text.TextExprs.strLiteral("graft_minhash", es.lift(2).orNull, "xx"))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[text.TextExprs.SimHash64].getName, "graft_simhash"),
      (es: Seq[Expression]) => text.TextExprs.SimHash64(es.head,
        text.TextExprs.strLiteral("graft_simhash", es.lift(1).orNull, "xx"))))
    ext.injectFunction((
      FunctionIdentifier("graft_token_set_count"),
      new ExpressionInfo(classOf[text.TextExprs.TokenSetCount].getName, "graft_token_set_count"),
      (es: Seq[Expression]) => text.TextExprs.TokenSetCount(es.head, es(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[text.TextExprs.FingerprintHash].getName, "graft_fingerprint"),
      (es: Seq[Expression]) => text.TextExprs.FingerprintHash(es.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_gram_hashes"),
      new ExpressionInfo(classOf[text.TextExprs.GramWindowHashes].getName, "graft_gram_hashes"),
      (es: Seq[Expression]) => text.TextExprs.GramWindowHashes(es.head,
        intArg("graft_gram_hashes", es(1)))))
    ext.injectFunction((
      FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[text.JaroWinkler.JaroWinklerSim].getName, "graft_jaro_winkler"),
      (es: Seq[Expression]) => text.JaroWinkler.JaroWinklerSim(es.head, es(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[vector.VectorExprs.CosineSim].getName, "graft_cosine"),
      (es: Seq[Expression]) => vector.VectorExprs.CosineSim(es.head, es(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_lsh_bucket"),
      new ExpressionInfo(classOf[vector.VectorExprs.LshBucket].getName, "graft_lsh_bucket"),
      (es: Seq[Expression]) => vector.VectorExprs.LshBucket(es.head, intArg("graft_lsh_bucket", es(1)))))
  }
}
