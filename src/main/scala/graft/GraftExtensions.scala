package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{FloatDot, FloatNorm2, Md5Hash60, SimHash64}

/** SparkSessionExtensions entry point: registers the engine's native
  * Catalyst expressions as SQL functions, so `spark.sql("SELECT
  * simhash64(...), vec_dot(...)")` works next to the Column API.
  *
  * Install with either
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions` (cluster config).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    e.injectOptimizerRule(_ => graft.plans.RewriteSelfDot)
    e.injectOptimizerRule(_ => graft.plans.RewriteWindowTopK)
    e.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of a string array"),
      (args: Seq[Expression]) => SimHash64(args.head)))
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two numeric arrays"),
      (args: Seq[Expression]) => FloatDot(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("vec_norm2"),
      info("vec_norm2", "vec_norm2(a) - squared L2 norm of a numeric array"),
      (args: Seq[Expression]) => FloatNorm2(args.head)))
    e.injectFunction((
      FunctionIdentifier("md5hash60"),
      info("md5hash60", "md5hash60(s) - first 60 bits of md5(s) as a long"),
      (args: Seq[Expression]) => Md5Hash60(args.head)))
  }
}
