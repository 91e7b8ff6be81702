package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Run-length encoding of equal consecutive values within a series
 * (reference: go/.../openinstrument.go:83-105 `ValueStreamWriter`,
 * server/disk_datastore.cc:91-110).
 *
 * Encoded form: one row per run with `ts` = run start and `end_ts` =
 * last timestamp observed with that value (null for single-point runs,
 * matching the reference's unset `end_timestamp`).
 *
 * Both directions are pure window/built-in transformations — no UDFs,
 * fully codegen'd, one shuffle on the series key.
 */
object Rle {

  /** Collapse equal consecutive value runs per series (`skey`).
    * Run equality covers both payloads (double and string), null-safe —
    * the reference RLEs string values the same way
    * (go/.../openinstrument.go:88-96 compares the full value). */
  def encode(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("skey").orderBy("ts")
    val hasSval = df.columns.contains("sval")
    val sameAsPrev =
      if (hasSval)
        lag("dval", 1).over(w) <=> col("dval") &&
          lag("sval", 1).over(w) <=> col("sval") &&
          (col("dval").isNotNull || col("sval").isNotNull)
      else lag("dval", 1).over(w) <=> col("dval") && col("dval").isNotNull
    // One shuffle: run starts are the change rows; a run's end is the
    // row just BEFORE the next run start (its lag(ts), carried through
    // the filter), or the series' last ts for the final run. The second
    // window runs on already-hash(skey)-partitioned rows — sort only,
    // no second exchange (vs the previous (skey, run) window).
    // The exchange is pinned to the session's shuffle parallelism
    // (replacing the window's ENSURE_REQUIREMENTS exchange — same key,
    // no extra shuffle): AQE coalesces it by INPUT bytes, which at
    // bench SFs funnels the whole encode — and any downstream
    // [[expand]], a ×~50 row explosion — through one or two tasks.
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartition(parts, col("skey"))
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("series_end", max("ts").over(Window.partitionBy("skey")))
      .withColumn("chg",
        when(row_number().over(w) === 1 || !sameAsPrev, 1).otherwise(0))
      .filter(col("chg") === 1)
      .withColumn("run_end",
        coalesce(lead("prev_ts", 1).over(w), col("series_end")))
      .withColumn("end_ts", when(col("run_end") > col("ts"), col("run_end")))
      .drop("prev_ts", "series_end", "chg", "run_end")
  }

  /**
   * Expand RLE rows back to per-sample rows on a `stepMs` grid:
   * `explode(sequence(ts, end_ts, step))`. Rows without `end_ts` pass
   * through unchanged.
   */
  def expand(df: DataFrame, stepMs: Long): DataFrame =
    df.withColumn("ts",
        explode(sequence(col("ts"), coalesce(col("end_ts"), col("ts")),
          lit(stepMs))))
      .withColumn("end_ts", lit(null).cast("long"))
}
