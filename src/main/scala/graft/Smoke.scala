package graft
import org.apache.spark.sql.SparkSession

/** Smoke-runs [[SparkEntry.entry]] the way the driver does (rows > 0). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // testdata parquet may flag timestamps isAdjustedToUTC=false; read them
      // as plain TIMESTAMP (session tz is UTC) so unix_millis & friends resolve
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // InferFiltersFromGenerate re-adds `size(e) > 0 AND isnotnull(e)`
      // below every explode-of-attribute; predicate pushdown then
      // substitutes the attribute's defining expression into the scan
      // filter, re-evaluating the expensive tokenize+md5 shingle chains
      // once per inferred predicate per row (plan-audited on
      // d_ngram_jaccard). Generate already emits nothing for null/empty
      // arrays, so excluding the rule never changes results — it only
      // removes the duplicated evaluation (a loss at ANY scale when the
      // generator child is a computed expression).
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"ENTRY_ROWS=$n")
    spark.stop()
  }
}
