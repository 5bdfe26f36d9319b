package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal accessor for the private[sql] Column↔Expression adapters —
  * the standard bridge any external library needs to expose custom
  * Catalyst expressions as Columns on Spark 4's Column API.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** True when no Dataset.persist() handles remain registered — lets
    * tests prove operators release their internal caches.
    */
  def cacheIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty
}
