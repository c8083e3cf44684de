package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to `private[sql]` surface needed to expose custom
  * Catalyst expressions as user-facing Columns (the Expression↔Column
  * converters moved behind the Column-node API in Spark 4). Lives in a
  * subpackage of org.apache.spark.sql solely for access; no Spark
  * internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `Column.internalFn` — the internal-function constructor the
    * Spark 4 `DataFrameStatFunctions` itself uses (e.g.
    * `bloom_filter_agg`); private[sql], hence bridged here. */
  def internalFn(name: String, args: Column*): Column =
    Column.internalFn(name, args: _*)

  /** Non-blocking read of an Observation's metrics (private[sql]):
    * empty map until the async listener delivers them. */
  def observationGetOrEmpty(o: org.apache.spark.sql.Observation)
      : Map[String, Any] = o.getOrEmpty

  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** Materialize a SparkSessionExtensions' function injections into a
    * fresh registry — lets tests assert what an extensions class
    * registers without tearing down the suite's shared session (session
    * builders apply extensions only at initial session creation). */
  def buildRegistry(ext: org.apache.spark.sql.SparkSessionExtensions)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry = {
    val reg = new org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
    ext.registerFunctions(reg)
    reg
  }
}
