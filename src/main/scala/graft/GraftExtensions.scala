package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.{NormalizeNfc, VecDotFloat}

/** Optimizer rule: NFC normalization is idempotent, so nested
  * applications collapse to one — the kind of algebraic rewrite
  * Catalyst can't know about a library's own expressions. Composed
  * pipelines (normalize → store → normalize again defensively) pay for
  * one pass instead of two. */
object CollapseNfcNormalize extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case NormalizeNfc(inner @ NormalizeNfc(_)) => inner
    }
}

/** The engine's `SparkSessionExtensions` injector — the deployment-grade
  * registration path: `--conf spark.sql.extensions=graft.GraftExtensions`
  * (or `builder.withExtensions`) gives every session the native
  * functions with no imperative `register()` call, exactly how Spark
  * intends libraries to extend a cluster. The per-session
  * `VecDotFloat.register` stays for ad-hoc/test use; both routes bind
  * the same expression.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDotFloat].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VecDotFloat(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NormalizeNfc].getName, "nfc_normalize"),
      (exprs: Seq[Expression]) => NormalizeNfc(exprs.head)))
    ext.injectOptimizerRule(_ => CollapseNfcNormalize)
  }
}
