package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-sequence operators a large-scale analytics/training pipeline
 * needs beyond the reference's surface: gap-based sessionization and a
 * shuffle-once as-of join. No reference analog (the reference's only
 * per-series sequencing is mutation resampling — see SURVEY.md §2.1);
 * these extend the same per-key-ordered-scan execution shape to
 * activity logs.
 *
 * Scale posture (100 TB): both operators are a single hash shuffle on
 * the entity key followed by one ordered scan — no joins, no
 * per-group materialization beyond O(1) window state. Downstream
 * `groupBy(key, session)` reuses the same partitioning (Spark's
 * ClusteredDistribution is satisfied by the window's HashPartitioning
 * on `key`), so session stats add no second exchange.
 */
object Sessions {

  /**
   * Gap-based sessionization: a new session starts at the first event
   * of a key and whenever the gap since the previous event exceeds
   * `gapMs`. Adds a `session` column (1-based index per key).
   *
   * Timestamps must be unique per key for deterministic output (true
   * for the gate tables); ties would make `lag` order-dependent.
   */
  def sessionize(df: DataFrame, key: Column, ts: Column, gapMs: Long): DataFrame = {
    require(!df.columns.contains("session"),
      "input already has a 'session' column")
    val w = Window.partitionBy(key).orderBy(ts)
    val boundary = when(lag(ts, 1).over(w).isNull
      || ts - lag(ts, 1).over(w) > gapMs, 1).otherwise(0)
    // rows-frame running sum: the default RANGE frame would sum peer
    // rows at equal ts together, breaking 1-per-row indexing
    df.withColumn("session",
      sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
  }

  // As-of joins live in [[graft.operators.AsOf]] — the general
  // operator (multi-key, backward/forward, tolerance) built on the
  // same union + ordered-scan shape this file pioneered.
}
