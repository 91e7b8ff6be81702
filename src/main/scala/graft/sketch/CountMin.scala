package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Count-min sketch over a token stream — the bounded-memory frequency
 * estimator for corpora whose exact vocabulary does not fit anywhere
 * (Cormode & Muthukrishnan 2005). Beyond-reference operator for the
 * training-data pipeline: the exact top-k paths (`t_vocab`,
 * `t_topk_lang`) shuffle the whole vocabulary; this one's state is a
 * FIXED `depth × width` grid of counters regardless of vocab size.
 *
 * Scale shape: the cell build explodes `depth` (row, col) pairs per
 * token occurrence, then aggregates with map-side partial combine —
 * every partition reduces to at most depth×width cells before the one
 * tiny shuffle; the merged grid is depth×width rows total (KBs), so
 * point estimates join it BROADCAST. Estimates are deterministic
 * (md5-derived row hashes, no RNG) and one-sided: est ≥ true count,
 * overshooting by colliding tokens' mass — the classic accuracy /
 * memory trade, ε ≈ e/width at δ ≈ exp(−depth).
 */
object CountMin {

  /** Row-`r` bucket of a token: 60-bit md5 prefix of `"r#token"` mod
    * `width` — non-negative, and cheap for an external SQL oracle to
    * re-derive exactly (the [[graft.dedup.Dedup]] hashing idiom). */
  def bucket(tok: Column, r: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"$r#"), tok)), 1, 15), 16, 10)
      .cast("long") % width

  /**
   * Build the sketch: depth×width cell counts from one pass over the
   * token stream. Output columns: `r`, `col`, `cell` (long).
   *
   * STREAMS AS-IS: over an unbounded `readStream` source this same
   * plan runs as an update-mode aggregation whose state is the grid
   * itself — bounded at d·w rows however many distinct tokens pass,
   * no watermark needed (a count-min counter only grows). That is the
   * sketch's whole point at stream scale: live heavy-hitter counts
   * where an exact vocabulary aggregation's state is unbounded
   * (StreamingSpec proves stream-vs-batch grid equality).
   */
  def cells(toks: DataFrame, tokCol: String,
            depth: Int, width: Int): DataFrame =
    toks.select(explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"), bucket(col(tokCol), r, width).as("col"))): _*))
        .as("rc"))
      .groupBy(col("rc.r").as("r"), col("rc.col").as("col"))
      .agg(count(lit(1)).as("cell"))

  /**
   * Build the same grid from PRE-AGGREGATED (token, count) rows —
   * bit-identical to [[cells]] over the expanded stream, since a cell
   * is just the sum of its colliding tokens' counts. Batch-only
   * convenience: when a caller already pays a per-token aggregation
   * (top-k probes, vocabulary stats), deriving the grid from it
   * tokenizes once and reuses that aggregation's exchange instead of
   * re-reading the corpus. (Streaming still wants [[cells]] — a
   * per-token pre-aggregate has unbounded state; the direct grid
   * aggregation is the bounded one.)
   */
  def cellsFromCounts(tokCounts: DataFrame, tokCol: String, cntCol: String,
                      depth: Int, width: Int): DataFrame =
    tokCounts.select(col(cntCol).as("__cms_cnt"),
        explode(array((0 until depth).map(r =>
          struct(lit(r).as("r"), bucket(col(tokCol), r, width).as("col"))): _*))
          .as("__cms_rc"))
      .groupBy(col("__cms_rc.r").as("r"), col("__cms_rc.col").as("col"))
      .agg(sum(col("__cms_cnt")).as("cell"))

  /**
   * Point-estimate the probe tokens' frequencies: est = min over the
   * `depth` rows of the token's cell. The grid is depth×width rows by
   * construction — broadcast it; probes never shuffle.
   * Output: probe columns + `est_cnt`.
   *
   * Probe rows should be DISTINCT: the final group-by runs over all
   * probe columns, so duplicate probe rows merge into one output row.
   * Internal working columns use a reserved `__cms_` prefix so probe
   * tables with columns named `r`/`col`/`rc` resolve unambiguously.
   */
  def estimate(grid: DataFrame, probes: DataFrame, tokCol: String,
               depth: Int, width: Int): DataFrame = {
    val probed = probes.select(col("*"),
      explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"), bucket(col(tokCol), r, width).as("col"))): _*))
        .as("__cms_rc"))
      .select(col("*"), col("__cms_rc.r").as("__cms_r"),
        col("__cms_rc.col").as("__cms_col"))
      .drop("__cms_rc")
    val g = grid.select(col("r").as("__cms_r"), col("col").as("__cms_col"),
      col("cell").as("__cms_cell"))
    probed.join(broadcast(g), Seq("__cms_r", "__cms_col"))
      // an empty cell can only happen if the probe token never occurred
      // (then every row's cell is absent and the join drops it — the
      // estimate of an unseen token is 0 by omission)
      .groupBy(probes.columns.map(col): _*)
      .agg(min(col("__cms_cell")).as("est_cnt"))
  }
}
