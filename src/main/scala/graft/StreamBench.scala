package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Streaming-path scale evidence (the missing counterpart of the batch
 * ladders): measures sustained micro-batch throughput and checkpoint
 * recovery for the three streaming surfaces on REAL testdata —
 *
 *  1. [[graft.streaming.StreamIngest.ingest]] — events→points dropped
 *     as chunked parquet into a watched dir, validated and sunk to the
 *     at-rest layout with exactly-once checkpointing. Reported:
 *     points/sec sustained, micro-batch count, then a SECOND drop
 *     processed by a RESTARTED query on the same checkpoint
 *     (recovery wall + an exactly-once row-count assertion: restart
 *     must process exactly the new files, no loss, no replay).
 *  2. [[graft.cli.Curate.curateFollow]] — the composed continuous
 *     curation pipeline (watermarked exact dedup → frozen-classifier
 *     gate → near-dup flag against the at-rest minhash index).
 *     Docs/sec through all three stateful/stream-static stages.
 *  3. [[graft.text.Classifier.scoreFollow]] — the stateless scoring
 *     projection; its throughput bound is the parquet scan itself.
 *
 * Setup work (chunking inputs, building the at-rest index, training
 * the model) is untimed; each timed window is one start→drain of an
 * AvailableNow query. The Bench contamination discipline rides along:
 * 1-min loadavg is sampled before each timed window and the artifact
 * carries an entry-cap verdict (`graft.Bench.contamination` semantics;
 * a busy box taints the artifact machine-visibly).
 *
 * Emits ONE JSON line (stdout + SPARK_GRAFT_STREAM_DETAIL, default
 * streaming_bench.json). Env: SPARK_GRAFT_SF_DIR (input scale),
 * SPARK_GRAFT_STREAM_CHUNKS (files per drop, default 8).
 */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val chunks = sys.env.getOrElse("SPARK_GRAFT_STREAM_CHUNKS", "8").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SparkInit.common aligns the streaming surfaces with the batch
    // mains' engine config — including the InferFiltersFromGenerate
    // exclusion the batch shingle paths rely on, which the streaming
    // session previously lacked (curateFollow's minhash stage runs the
    // same shingle chains per micro-batch).
    val spark = SparkInit.common(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nprocs = Runtime.getRuntime.availableProcessors
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    def loadAvg(): Double = osBean.getSystemLoadAverage
    // own-process CPU seconds — the batch bench's rule-4 signal
    // (graft.Bench.cpuTheft): external theft inflates a window's wall
    // but not this process's CPU, so recording both per timed window
    // makes a stolen streaming artifact adjudicable from the file alone
    def procCpuSec(): Double = osBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime / 1e9
      case _ => -1.0
    }
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    // ENTRY load must be sampled before ANY work — including this
    // process's own untimed setup (the repartition+write of the source
    // chunks pushes 1-min load past nprocs/4 on an idle box and
    // false-positived the entry rule when sampled after it)
    val entryLoad = loadAvg()
    // p50/p95 micro-batch wall from a drained query's progress history
    // (data-carrying batches only; AvailableNow runs few enough batches
    // that the 100-entry recentProgress window holds them all)
    def batchPercentiles(q: org.apache.spark.sql.streaming.StreamingQuery)
        : (Double, Double) = {
      val ds = q.recentProgress.filter(_.numInputRows > 0)
        .map(_.durationMs.getOrDefault("triggerExecution", 0L).toDouble)
        .sorted
      if (ds.isEmpty) (-1.0, -1.0)
      else (ds((ds.length - 1) / 2), ds(math.min(ds.length - 1,
        math.ceil(ds.length * 0.95).toInt - 1)))
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_bench").toString

    // ---------- 1. ingest ----------
    val points = sources.PointSource.events(spark, sfDir)
    val src = s"$tmp/src"
    points.repartition(chunks).write.parquet(src)
    val nIn = spark.read.parquet(src).count()
    val store = s"$tmp/store"; val ckpt = s"$tmp/ckpt"
    val ingestLoad = loadAvg()
    val cpu0 = procCpuSec()
    val t0 = System.nanoTime()
    val q1 = graft.streaming.StreamIngest.ingest(spark, src, store, ckpt,
      hostname = "bench-host")
    q1.awaitTermination()
    val ingestWall = (System.nanoTime() - t0) / 1e9
    val ingestCpu = procCpuSec() - cpu0
    val (ingP50, ingP95) = batchPercentiles(q1)
    val stored = spark.read.parquet(store).count()
    val batches1 = q1.recentProgress.count(_.numInputRows > 0)
    // second drop: the SAME chunk files under new names are new data to
    // the file-source log; a restarted query on the same checkpoint
    // must recover state and process exactly these
    val srcDir = new java.io.File(src)
    srcDir.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      java.nio.file.Files.copy(f.toPath,
        new java.io.File(srcDir, "redrop_" + f.getName).toPath)
    }
    val recoveryLoad = loadAvg()
    val cpu1 = procCpuSec()
    val t1 = System.nanoTime()
    val q2 = graft.streaming.StreamIngest.ingest(spark, src, store, ckpt,
      hostname = "bench-host")
    q2.awaitTermination()
    val recoveryWall = (System.nanoTime() - t1) / 1e9
    val recoveryCpu = procCpuSec() - cpu1
    val storedAfter = spark.read.parquet(store).count()
    val exactlyOnce = storedAfter == 2 * stored
    if (!exactlyOnce)
      System.err.println(s"[stream-bench] EXACTLY-ONCE VIOLATION: " +
        s"$storedAfter != 2*$stored")

    // ---------- 2. curateFollow ----------
    val docsRaw = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
    val nDocs = docsRaw.count()
    val baseTs = 1600000000000L // fixed epoch: deterministic event time
    val docsSrc = s"$tmp/docs_src"
    docsRaw.withColumn("ts", lit(baseTs) + col("doc_id") % 1000L)
      .repartition(chunks).write.parquet(docsSrc)
    // flush drop: token-less text advances the watermark past every
    // window (shingle-less docs are dropped by the pipeline itself) so
    // append mode emits all real documents
    spark.range(1).select(lit(Long.MaxValue - 1).as("doc_id"),
        lit("").as("text"), lit(baseTs + 86400000L).as("ts"))
      .write.mode("append").parquet(docsSrc)
    val idx = s"$tmp/mh_index"
    graft.dedup.Dedup.minhashIndex(docsRaw, idx)
    val model = graft.text.Classifier.train(docsRaw,
      (col("doc_id") % 2L) === 0L)
    val curateLoad = loadAvg()
    val cpu2 = procCpuSec()
    val t2 = System.nanoTime()
    val curated = graft.cli.Curate.curateFollow(spark, docsSrc, idx, model)
    val q3 = curated.writeStream.format("parquet")
      .option("path", s"$tmp/curated")
      .option("checkpointLocation", s"$tmp/curated_ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q3.awaitTermination()
    val curateWall = (System.nanoTime() - t2) / 1e9
    val curateCpu = procCpuSec() - cpu2
    val (curP50, curP95) = batchPercentiles(q3)
    val curatedRows = spark.read.parquet(s"$tmp/curated").count()

    // ---------- 3. scoreFollow ----------
    val scoreLoad = loadAvg()
    val cpu3 = procCpuSec()
    val t3 = System.nanoTime()
    val q4 = graft.text.Classifier.scoreFollow(spark, docsSrc, model)
      .writeStream.format("parquet")
      .option("path", s"$tmp/scored")
      .option("checkpointLocation", s"$tmp/scored_ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q4.awaitTermination()
    val scoreWall = (System.nanoTime() - t3) / 1e9
    val scoreCpu = procCpuSec() - cpu3
    val (scoP50, scoP95) = batchPercentiles(q4)
    val scoredRows = spark.read.parquet(s"$tmp/scored").count()

    val loadCap = nprocs / 4.0
    val loads = Seq(entryLoad, ingestLoad, recoveryLoad, curateLoad, scoreLoad)
    // entry cap applies to the FIRST sample only — taken at process
    // start, before even this bench's own setup writes (which push
    // 1-min load past the cap on an idle box); all later samples carry
    // this process's own steady-state and use the hard physical trip —
    // the graft.Bench rule split
    val contaminated = loads.head > loadCap ||
      loads.exists(_ > nprocs + loadCap)
    val line =
      s"""{"metric":"stream","sf":"$sfDir","chunks":$chunks,""" +
      s""""ingest":{"rows_in":$nIn,"rows_stored":$stored,"wall":${r3(ingestWall)},"cpu":${r3(ingestCpu)},"rows_per_sec":${r3(stored / ingestWall)},"batches":$batches1,"batch_ms_p50":${r3(ingP50)},"batch_ms_p95":${r3(ingP95)},"recovery_wall":${r3(recoveryWall)},"recovery_cpu":${r3(recoveryCpu)},"recovery_rows_per_sec":${r3(stored / recoveryWall)},"exactly_once":$exactlyOnce},""" +
      s""""curate":{"docs_in":$nDocs,"rows_out":$curatedRows,"wall":${r3(curateWall)},"cpu":${r3(curateCpu)},"docs_per_sec":${r3(nDocs / curateWall)},"batch_ms_p50":${r3(curP50)},"batch_ms_p95":${r3(curP95)}},""" +
      s""""score":{"docs_in":$nDocs,"rows_out":$scoredRows,"wall":${r3(scoreWall)},"cpu":${r3(scoreCpu)},"docs_per_sec":${r3(nDocs / scoreWall)},"batch_ms_p50":${r3(scoP50)},"batch_ms_p95":${r3(scoP95)}},""" +
      s""""loads":[${loads.map(r3).mkString(",")}],"nproc":$nprocs,"contaminated":$contaminated}"""
    println(line)
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_STREAM_DETAIL",
      "streaming_bench.json")
    try {
      val w = new java.io.PrintWriter(detailPath, "UTF-8")
      try w.println(line) finally w.close()
    } catch {
      case t: Throwable =>
        System.err.println(s"[stream-bench] artifact write failed: $t")
    }
    spark.stop()
  }
}
