package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal private[sql] bridge for the graft library: build a
  * DataFrame from a custom LogicalPlan and extract a Column's
  * Catalyst expression — the two hooks a library adding its own
  * logical operators needs, both package-private in Spark 4's
  * classic module.
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame = spark match {
    case s: classic.SparkSession => classic.Dataset.ofRows(s, plan)
    case other => throw new UnsupportedOperationException(
      s"graft: custom planner operators require a classic SparkSession, got ${other.getClass.getName}")
  }

  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** 0.0/-0.0 and NaN bit patterns collapse to canonical forms, the
    * same normalization Spark applies to Aggregate/Window/Join keys —
    * required for any custom operator that groups by raw binary rows.
    */
  def normalizeFloats(e: Expression): Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)
}
