package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{NormalizeNfc, VecDotFloat}

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
  }
}
