package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Bridge into Spark's `private[sql]` Column ↔ Expression converters,
 * needed to expose custom Catalyst expressions (e.g.
 * [[graft.functions.DotProduct]]) through the public Column API.
 */
object GraftBridge {
  def toColumn(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** DataFrame from an InternalRow RDD — the zero-copy return path for
    * row-level operators (no Row/Encoder round-trip). */
  def internalCreateDataFrame(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /**
   * [[internalCreateDataFrame]] that DECLARES the physical layout the
   * RDD already has: hash-clustered on `clusterCols` (the upstream
   * `repartition(n, cols)` that built it) and sorted within partitions
   * by `sortCols`. Declared via `LogicalRDD(outputPartitioning,
   * outputOrdering)`, so `EnsureRequirements` lets downstream
   * operators that need exactly this distribution — a window over
   * (cluster key, sort key), a groupBy on the cluster key — run with
   * ZERO additional exchange or sort. Without the declaration Spark
   * re-shuffles and re-sorts the operator's ENTIRE OUTPUT (for the
   * dense-grid emitters that is the multi-billion-row grid, not the
   * input), which at sf30+ crossed the external-sort spill wall.
   *
   * CONTRACT (the caller asserts, Spark trusts): every output
   * partition holds exactly the rows whose `clusterCols` hash to it
   * under the SAME partitioning the upstream repartition used, and
   * rows within each partition are non-strictly ascending on
   * `sortCols`. A false claim silently corrupts downstream results —
   * callers are per-series streaming passes whose emission order is
   * monotone in ts by construction AND enforced at emission time
   * (graft.operators.Mutations.EmissionOrderGuard raises on the first
   * out-of-order row), plus property-tested against shuffled inputs.
   */
  def internalCreateDataFrameClustered(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType,
      clusterCols: Seq[String],
      sortCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val cs = spark.asInstanceOf[classic.SparkSession]
    val attrs =
      org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema)
    val byName = attrs.map(a => a.name -> a).toMap
    val part = HashPartitioning(
      clusterCols.map(byName(_)), rdd.getNumPartitions)
    val ord = sortCols.map(n => SortOrder(byName(n), Ascending))
    classic.Dataset.ofRows(cs,
      org.apache.spark.sql.execution.LogicalRDD(
        attrs, rdd, part, ord, isStreaming = false)(cs))
  }
}
