package graft.plans

import graft.functions.DotProductF
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions: registers graft's custom Catalyst expressions as SQL
  * functions, so `spark.sql("... dot_f(a, b) ...")` works next to the
  * DataFrame API. Activate via
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`).
  *
  * This is the (b)-tier extension point of the build plan (custom
  * `Expression`); no custom `Rule`/`SparkStrategy` is needed for
  * correctness anywhere in the engine (SURVEY §4) — Catalyst's built-ins
  * already produce the right physical plans (TakeOrderedAndProject,
  * broadcast semi-joins, WindowGroupLimit).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("dot_f"),
      new ExpressionInfo(classOf[DotProductF].getName, "dot_f"),
      (exprs: Seq[Expression]) => DotProductF(exprs(0), exprs(1))))
  }
}
