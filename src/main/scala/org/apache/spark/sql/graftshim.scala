package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the private[sql] Column <-> Expression converters —
  * the supported way for third-party Catalyst expressions to surface as
  * Columns on Spark 4.x (Column no longer wraps Expression directly). */
object graftshim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a SQL-callable function backed by a Catalyst expression
    * builder (FunctionRegistry is private[sql]). */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Lift an RDD[InternalRow] back into a DataFrame without the external
    * Row round-trip (internalCreateDataFrame is private[sql]). For
    * operators whose per-row work is too hot for the mapPartitions +
    * RowEncoder path — the binary rows flow straight through. */
  def internalCreateDataFrame(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)

  /** Non-blocking read of an Observation's metrics (getOrEmpty is
    * private[sql]): empty until the observed dataset's action completes
    * AND the async listener has delivered. */
  def observationGetOrEmpty(obs: Observation): Map[String, Any] =
    obs.getOrEmpty

  /** Release the block-manager storage behind a localCheckpoint'ed frame
    * (LogicalRDD and its persisted RDD are private[sql]; Dataset offers no
    * unpersist for checkpoints). Iterative operators that checkpoint per
    * round would otherwise leak every round's blocks for the life of the
    * session — across a many-query run the leaked storage squeezes
    * execution memory. No-op on frames that carry no checkpoint. */
  def unpersistCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case l: execution.LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
