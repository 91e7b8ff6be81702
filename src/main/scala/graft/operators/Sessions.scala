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

  /**
   * As-of join: for each left row, attach the payload of the latest
   * right row with the same `key` and `right.ts <= left.ts` (inclusive;
   * null struct when no right row precedes — left-join semantics).
   *
   * Implemented as union + ordered scan, NOT a join: both sides are
   * tagged, unioned, hash-shuffled once on `key`, and scanned in
   * (ts, side) order carrying the last-seen right payload. A range/
   * inequality join here would be O(left × right-per-key) and resists
   * pushdown; the merge form is one exchange and O(1) state per key —
   * the only as-of shape that survives 100 TB. Right rows sort before
   * left rows at equal ts, which is what makes `<=` inclusive.
   *
   * `payload` columns must exist on the right side; the result keeps
   * every left column plus an `asof` struct of the payload (null when
   * no match).
   */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
               payload: Seq[String]): DataFrame = {
    require(Seq("asof", "__p", "__side").forall(c => !left.columns.contains(c)),
      "left side must not carry asof/__p/__side columns")
    val r = right.select(col(key), col(tsCol),
        struct(payload.map(col): _*).as("__p"))
      .withColumn("__side", lit(0))
    val u = left.withColumn("__side", lit(1))
      .unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__p", "__side")
  }
}
