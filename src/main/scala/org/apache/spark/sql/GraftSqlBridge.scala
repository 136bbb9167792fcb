package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversions (Spark 4
  * removed the public `new Column(expr)` constructor). The standard
  * third-party-extension pattern: one tiny file declared inside the
  * `org.apache.spark.sql` package; everything else in this repo lives
  * under `graft.*`.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession, plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** DataFrame from an already-computed `RDD[InternalRow]` WITHOUT the
    * external-Row round-trip (`createDataFrame(RDD[Row], schema)` pays an
    * InternalRow→Row→InternalRow conversion per field per row). Used by
    * the distributed global row index (WindowOps.globalRowIdx), whose
    * output feeds straight back into codegen'd plans.
    */
  def internalCreateDataFrame(spark: SparkSession,
                              rdd: org.apache.spark.rdd.RDD[catalyst.InternalRow],
                              schema: types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)
}
