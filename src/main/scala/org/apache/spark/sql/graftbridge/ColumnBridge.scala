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
