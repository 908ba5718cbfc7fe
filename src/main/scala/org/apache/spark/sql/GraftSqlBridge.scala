package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.StructType

/** Bridge into `private[sql]` surface: Column ↔ Catalyst Expression
  * conversion for our custom native expressions (Spark 4 removed the
  * public `new Column(expr)` constructor; `classic.ExpressionUtils` is the
  * blessed internal path), plus `internalCreateDataFrame` for wrapping an
  * `RDD[InternalRow]` back into a DataFrame (used by iterative algorithms
  * to truncate Catalyst lineage per round without a checkpoint directory).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Executed InternalRow RDD of a DataFrame (`queryExecution.toRdd`). */
  def toInternalRdd(df: DataFrame): RDD[InternalRow] =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.toRdd

  /** Wrap an InternalRow RDD as a DataFrame leaf (LogicalRDD). The plan
    * over the result is flat — Catalyst never re-analyzes the producing
    * query — which is what bounds per-round plan growth in iterative
    * label propagation. */
  def internalCreateDataFrame(
      spark: SparkSession, rdd: RDD[InternalRow], schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)
}
