package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL bindings for graft's native Catalyst expressions, so Plane-A SQL
  * (model bodies, ad-hoc `spark.sql`) gets the codegen'd fast path without
  * touching the DataFrame API:
  *
  *   SELECT graft_cosine(a.embedding, b.embedding) FROM ...
  *   SELECT graft_lsh_bucket(embedding, 16) ...
  *
  * Two wirings, same registrations:
  *  - [[GraftFunctions.register]] on a live session;
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` at session
  *    build (the SparkSessionExtensions injection point, which survives
  *    `newSession()` and reaches every derived session).
  */
object GraftFunctions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _)  => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  /** (name, description, builder) for every exposed function. */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_cosine",
      "graft_cosine(a, b) - cosine similarity of two float arrays (native codegen).",
      { case Seq(a, b) => VectorCosine(a, b)
        case args => throw new IllegalArgumentException(
          s"graft_cosine expects 2 arguments, got ${args.size}") }),
    ("graft_lsh_bucket",
      "graft_lsh_bucket(vec, nPlanes[, offset]) - hyperplane-LSH bucket id of a float array.",
      { case Seq(v, n)    => VectorLshBucket(v, intArg(n, "nPlanes"))
        case Seq(v, n, o) => VectorLshBucket(v, intArg(n, "nPlanes"), intArg(o, "offset"))
        case args => throw new IllegalArgumentException(
          s"graft_lsh_bucket expects 2-3 arguments, got ${args.size}") })
  )

  /** Register every function on a live session's catalog. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, usage, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name, usage),
        exprs => builder(exprs))
    }

  /** The injection half, shared with [[GraftExtensions]]. */
  private[functions] def inject(ext: SparkSessionExtensions): Unit =
    all.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name, usage),
        (exprs: Seq[Expression]) => builder(exprs)))
    }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(ext: SparkSessionExtensions): Unit = GraftFunctions.inject(ext)
}
