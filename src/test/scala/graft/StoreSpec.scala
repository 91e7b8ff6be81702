package graft

import graft.sources.PointSource
import org.apache.spark.sql.functions._

/** At-rest layout: round-trip, scan pushdown, and compaction. */
class StoreSpec extends SparkSpec {

  private def tmpDir() =
    java.nio.file.Files.createTempDirectory("graft_store").toString + "/store"

  private def samplePoints() =
    PointSource.events(spark, "/root/testdata/sf0.001")

  test("write/read round-trip preserves every point") {
    val dir = tmpDir()
    val in = samplePoints()
    PointSource.write(in, dir)
    val out = PointSource.read(spark, dir)
    assert(out.count() == in.count())
    val a = in.select(sum(hash(col("name"), col("ts"), col("dval")))).head().getLong(0)
    val b = out.select(sum(hash(col("name"), col("ts"), col("dval")))).head().getLong(0)
    assert(a == b)
  }

  test("store layout pushes name equality and ts range into the parquet scan") {
    val dir = tmpDir()
    PointSource.write(samplePoints(), dir)
    val q = PointSource.read(spark, dir)
      .filter(col("name") === "/events/click" && col("ts") >= 1704500000000L)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan.take(500))
    assert(plan.contains("EqualTo(name,/events/click)"), plan.take(2000))
    assert(plan.contains("GreaterThanOrEqual(ts,1704500000000)"), plan.take(2000))
    // the adapter source (derived name/ts) can NOT push these — the
    // at-rest layout is what makes the 100 TB scan cheap
  }

  test("compaction coalesces small files, preserves data and layout") {
    val dir = tmpDir()
    val in = samplePoints()
    // simulate many small ingest files: 16 shuffled splits
    in.repartition(16).withColumn("date", to_date(timestamp_millis(col("ts"))))
      .write.partitionBy("date").mode("overwrite").parquet(dir)
    def parquetFiles(): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      walk(new java.io.File(dir))
    }
    val before = parquetFiles().size
    val checksum = spark.read.parquet(dir)
      .select(sum(hash(col("name"), col("ts"), col("dval")))).head().getLong(0)
    PointSource.compact(spark, dir, targetFilesPerDate = 1)
    val after = parquetFiles().size
    assert(after < before, s"$before -> $after")
    val out = spark.read.parquet(dir)
    assert(out.select(sum(hash(col("name"), col("ts"), col("dval"))))
      .head().getLong(0) == checksum)
  }
}
