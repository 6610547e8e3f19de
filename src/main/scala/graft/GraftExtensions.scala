package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.FloatDot

/** Engine extensions, installed with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`:
  * registers the native `float_dot` expression so the SQL entry path
  * can use it too (`SELECT float_dot(a, b)`). The Column-API helper
  * `FloatDot.dotF` works without this registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "float_dot"),
      (children: Seq[Expression]) => FloatDot(children(0), children(1))))
  }
}
