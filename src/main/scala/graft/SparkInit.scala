package graft

import org.apache.spark.sql.SparkSession

/**
 * The SparkSession settings every driver main shares — ONE place, so
 * the configuration that Verify verifies is byte-for-byte the one
 * Bench times (they drifted as copy-pasted blocks before; an engine
 * setting added to one main but not another would silently unpin the
 * oracle from the timed plans).
 *
 * Masters and shuffle-partition counts stay with each main: they are
 * the per-surface contract (Bench reads $SPARK_GRAFT_CPUS, Explain
 * pins local[4], …), not shared engine semantics.
 *
 * Why each shared setting exists:
 *  - session.timeZone=UTC — the oracle (DuckDB) computes in UTC;
 *    epoch arithmetic must agree.
 *  - legacy.parquet.nanosAsLong — driver testdata generations have
 *    shipped TIMESTAMP(NANOS); reading them as raw longs keeps
 *    Tables.tsToMillis exact (see its scaladoc).
 *  - parquet.inferTimestampNTZ=false — testdata may flag timestamps
 *    isAdjustedToUTC=false; reading them as plain TIMESTAMP under the
 *    UTC session keeps unix_millis & friends resolvable.
 *  - excludedRules=InferFiltersFromGenerate — the rule re-adds
 *    `size(e) > 0 AND isnotnull(e)` below every explode-of-attribute;
 *    predicate pushdown then substitutes the attribute's defining
 *    expression into the scan filter, re-evaluating the expensive
 *    tokenize+md5 shingle chains once per inferred predicate per row
 *    (plan-audited on d_ngram_jaccard). Generate already emits
 *    nothing for null/empty arrays, so excluding the rule never
 *    changes results — it only removes the duplicated evaluation
 *    (a loss at ANY scale when the generator child is a computed
 *    expression).
 *  - ui.enabled=false — headless runs.
 */
object SparkInit {
  def common(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
}
