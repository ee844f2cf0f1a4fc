package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for graft's custom expressions, so
  * `SELECT poly_hash(text)` works alongside the Column API.
  *
  * Two entry points:
  *  - `register(spark)`: imperative, for an existing session;
  *  - `GraftExtensions`: a `SparkSessionExtensions` installer for
  *    `spark.sql.extensions=graft.functions.GraftExtensions` /
  *    `.withExtensions(new GraftExtensions)` at session build time —
  *    the deployment path on a shared cluster.
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "poly_hash" -> (exprs => PolyHash(exprs.head)),
    "poly_hash_shingles" -> (exprs =>
      PolyHashShingles(exprs.head, intArg(exprs(1), "shingle width"))),
    "token_shingle_hashes" -> (exprs =>
      TokenShingleHashes(exprs.head, intArg(exprs(1), "shingle width"))),
    "word_shingles" -> (exprs =>
      WordShingles(exprs.head, intArg(exprs(1), "shingle width"))),
    "minhash_sig" -> (exprs => MinHashSig(exprs.head)),
    "dot_product" -> (exprs => DotProduct(exprs.head, exprs(1))),
    "sorted_intersect_count" -> (exprs =>
      SortedIntersectCount(exprs.head, exprs(1))))

  def register(spark: SparkSession): Unit =
    fns.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }

  private[functions] def install(e: SparkSessionExtensions): Unit = {
    fns.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[PolyHash].getName, name),
        builder))
    }
    // whole-operator extension: lower graft's AsOfJoinPlan logical
    // node to ordinary relational operators during resolution
    e.injectResolutionRule(_ => graft.plans.AsOfJoinRewrite)
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.install(e)
}
