package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Plain loaders for the driver's non-point tables. */
object Tables {
  def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** Raw events with `ts` normalized to epoch ms (same NANOS handling
    * as [[PointSource.events]]; `div` keeps sub-ms truncation exact and
    * bit-identical to DuckDB's epoch_ms). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val tsMs = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000000")
      case _ => unix_millis(col("ts"))
    }
    raw.withColumn("ts", tsMs)
  }
}
