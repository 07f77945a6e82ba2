package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DmsToDegExpr, HmsToDegExpr, NGramTuplesGenerator, VecDotExpr}
import graft.plans.AsOfJoinStrategy

/** Config-driven injection of every graft extension — the deployment path
  * for sessions the library doesn't build itself:
  *
  * {{{ spark-submit --conf spark.sql.extensions=graft.GraftExtensions ... }}}
  *
  * Injects the codegen'd scalar expressions, the n-gram generator, and the
  * as-of join planner strategy. [[Sessions.init]] performs the same
  * registrations imperatively for sessions that already exist.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("hms_to_deg"),
      info("hms_to_deg", "hms_to_deg(str) - 'h:m:s' hourangle to degrees"),
      (exprs: Seq[Expression]) => HmsToDegExpr(exprs.head)))
    e.injectFunction((FunctionIdentifier("dms_to_deg"),
      info("dms_to_deg", "dms_to_deg(str) - '[±]d:m:s' to degrees"),
      (exprs: Seq[Expression]) => DmsToDegExpr(exprs.head)))
    e.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dense-vector dot product"),
      (exprs: Seq[Expression]) => VecDotExpr(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("ngram_tuples"),
      info("ngram_tuples", "ngram_tuples(text, n) - positional word n-grams"),
      (exprs: Seq[Expression]) => NGramTuplesGenerator(exprs(0), exprs(1))))
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
