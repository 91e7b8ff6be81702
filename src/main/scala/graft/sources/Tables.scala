package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Plain loaders for the driver's non-point tables. */
object Tables {
  def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
}
