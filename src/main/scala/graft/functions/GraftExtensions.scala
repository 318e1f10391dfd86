package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers the engine's custom Catalyst expressions for SQL use.
  *
  * Two entry points:
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` at
  *    session build time (the SparkSessionExtensions route), or
  *  - [[GraftFunctions.register]] on a live session.
  *
  * After either, `SELECT array_dot(a, b)` / `simhash60(hs)` work in
  * spark.sql strings as well as the Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getCanonicalName, "array_dot"),
      (exprs: Seq[Expression]) => ArrayDotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60].getCanonicalName, "simhash60"),
      (exprs: Seq[Expression]) => SimHash60(exprs.head)))
  }
}

object GraftFunctions {
  /** Imperative registration on an existing session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("array_dot",
      exprs => ArrayDotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("simhash60",
      exprs => SimHash60(exprs.head), "built-in")
  }
}
