package graft

import graft.streaming.StreamIngest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Drives the streaming ingest + windowed agg end-to-end on real
  * testdata: events points dropped into a watched dir → validated
  * checkpointed Parquet store → batch windowed mean over the result. */
object StreamSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    // shared engine settings live in SparkInit.common (same config as
    // the batch mains and StreamBench)
    val spark = SparkInit.common(SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_smoke").toString
    val src = s"$tmp/src"; val store = s"$tmp/store"; val ckpt = s"$tmp/ckpt"
    sources.PointSource.events(spark, sfDir).write.parquet(src)
    val q = StreamIngest.ingest(spark, src, store, ckpt, hostname = "smoke-host")
    q.awaitTermination(120000)
    val stored = spark.read.parquet(store)
    val n = stored.count()
    val hosts = stored.select(element_at(col("labels"), "hostname")).distinct().count()
    println(s"STREAM_STORE_ROWS=$n DISTINCT_HOST_LABELS=$hosts")
    val agg = StreamIngest.windowedMeanByName(
      stored.select("name", "labels", "value_type", "ts", "dval", "sval", "end_ts"),
      3600000L)
    println(s"STREAM_AGG_ROWS=${agg.count()}")
    agg.orderBy("name", "ts").show(3, truncate = false)
    spark.stop()
  }
}
