package graft

import graft.cli.Curate
import graft.functions.VectorOps
import graft.text.TextOps
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end spec for the composed curation pipeline CLI. */
class CurateSpec extends SparkSpec {

  private lazy val out =
    Files.createTempDirectory("graft-curate").toString + "/run1"
  private lazy val report = Curate.run(spark,
    "/root/testdata/sf0.001/documents.parquet", out)
  private lazy val result = spark.read.parquet(out)

  test("stage counts are monotone and the report matches the output") {
    assert(report.nInput >= report.nDeduped)
    assert(report.nDeduped >= report.nGated)
    // span cut returns exactly the gated non-bench docs (rows survive,
    // text shrinks)
    assert(report.nCut == report.nGated)
    assert(report.nFinal <= report.nCut)
    assert(report.nFinal > 0)
    assert(result.count() == report.nFinal)
    assert(report.perSplit.values.sum == report.nFinal)
  }

  test("no curated doc shares an ngram-window hash with the benchmark slice") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val benchH = docs.filter(col("source") === "src1")
      .select(explode(VectorOps.shingleHash60(
        TextOps.tokens(col("text")), 8)).as("g"))
      .distinct()
    val leaked = result
      .select(explode(VectorOps.shingleHash60(
        TextOps.tokens(col("clean_text")), 8)).as("g"))
      .join(benchH, "g")
    assert(leaked.count() == 0, "decontamination cut left a leaked window")
    // and no benchmark doc leaks into the output wholesale
    assert(result.filter(col("source") === "src1").count() == 0)
  }

  test("near-duplicate outputs never straddle a split") {
    val pairs = graft.dedup.Dedup.minhashLshPairs(
      result.select(col("doc_id"), col("clean_text").as("text")),
      n = 3, numHashes = 16, bands = 4, threshold = 0.5)
    val splits = result.select("doc_id", "split")
    val straddle = pairs
      .join(splits.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("split", "sa"), "id_a")
      .join(splits.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("split", "sb"), "id_b")
      .filter(col("sa") =!= col("sb"))
    assert(straddle.count() == 0, "a near-dup pair crosses splits")
  }

  test("a training duplicate of a benchmark text never ships; null sources do") {
    import spark.implicits._
    // train doc 1 < bench doc 10 with IDENTICAL text: a dedup window
    // spanning bench rows would delete the BENCH copy and ship the
    // training duplicate uncut (the review-found ordering bug). Doc 3
    // has a NULL source — it must be treated as training data, not
    // silently dropped.
    val txt = "the secret eval answer is in the box ok"
    val docs = Seq(
      (1L, txt, Option("web")),
      (10L, txt, Option("bench")),
      (2L, "the cat and the dog is in a house of wonders", Option("web")),
      (3L, "the bird and the bee is on a tree now", Option.empty[String]))
      .toDF("doc_id", "text", "source")
    val dir = Files.createTempDirectory("graft-curate-dup").toString
    docs.write.parquet(s"$dir/in")
    val rep = Curate.run(spark, s"$dir/in", s"$dir/out",
      benchSource = "bench", qualityMin = 0.0)
    val ids = spark.read.parquet(s"$dir/out")
      .select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(1L), "benchmark-identical training doc shipped")
    assert(!ids.contains(10L), "benchmark doc shipped")
    assert(ids.contains(2L), "clean training doc lost")
    assert(ids.contains(3L), "null-source doc silently dropped")
    assert(rep.nInput == 4 && rep.nDeduped == 4)
  }

  test("the scoring stage runs bit-identical under Structured Streaming") {
    import org.apache.spark.sql.types._
    val src = "/root/testdata/sf0.001/documents.parquet"
    val schema = spark.read.parquet(src).schema
    val batch = Curate.score(spark.read.parquet(src))
      .select("doc_id", "quality", "lang_pred")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    val outDir = Files.createTempDirectory("graft-curate-stream").toString
    // file sources stream DIRECTORIES; stage the single-file table
    Files.createDirectories(java.nio.file.Paths.get(s"$outDir/in"))
    Files.copy(java.nio.file.Paths.get(src),
      java.nio.file.Paths.get(s"$outDir/in/part-0.parquet"))
    val q = Curate.score(
        spark.readStream.schema(schema).parquet(s"$outDir/in"))
      .select("doc_id", "quality", "lang_pred")
      .writeStream.format("parquet")
      .option("path", s"$outDir/out")
      .option("checkpointLocation", s"$outDir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(s"$outDir/out")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(streamed == batch, "streamed scoring diverged from batch")
  }

  test("incremental runs drop corpus near-dups and grow the index, never re-shipping") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-curate-inc").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.filter(col("doc_id") < 100).write.parquet(s"$base/in1")
    docs.write.parquet(s"$base/in2") // full snapshot: re-crawls batch 1
    val r1 = Curate.runIncremental(spark, s"$base/in1", s"$base/out1",
      s"$base/idx")
    assert(r1.nDupVsCorpus == 0, "empty index cannot produce dups")
    val ids1 = spark.read.parquet(s"$base/out1")
      .select("doc_id").as[Long].collect().toSet
    assert(ids1.nonEmpty)
    val r2 = Curate.runIncremental(spark, s"$base/in2", s"$base/out2",
      s"$base/idx")
    val ids2 = spark.read.parquet(s"$base/out2")
      .select("doc_id").as[Long].collect().toSet
    assert(ids2.nonEmpty, "novel docs must ship")
    assert((ids1 & ids2).isEmpty,
      "an already-accepted doc shipped again in the next increment")
    assert(r2.nDupVsCorpus >= ids1.size,
      "every accepted batch-1 doc re-crawled in batch 2 must count as a corpus dup")
    // index grew: batch-2 accepted docs are findable
    val setsIds = spark.read.parquet(s"$base/idx/sets")
      .select("id").as[Long].collect().toSet
    assert(ids1.subsetOf(setsIds) && ids2.subsetOf(setsIds))
  }

  test("a fully-filtered corpus reports nFinal=0 instead of throwing on the re-read") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-curate-empty").toString
    // every doc fails the language gate (no recognizable stopwords) and
    // none is benchmark-sourced — the output write emits zero part files
    Seq((1L, "xq zv qq", "srcA"), (2L, "zv qq xq", "srcB"))
      .toDF("doc_id", "text", "source").write.parquet(s"$base/in")
    val r = Curate.run(spark, s"$base/in", s"$base/out")
    assert(r.nInput == 2 && r.nGated == 0)
    assert(r.nFinal == 0 && r.perSplit.isEmpty,
      s"empty output must short-circuit to nFinal=0, got $r")
  }

  test("runIncremental rejects negative doc_ids before the surrogate remap") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-curate-neg").toString
    Seq((-1L, "the quick brown fox is here and the fox is quick", "srcA"))
      .toDF("doc_id", "text", "source").write.parquet(s"$base/in")
    val e = intercept[IllegalArgumentException] {
      Curate.runIncremental(spark, s"$base/in", s"$base/out", s"$base/idx")
    }
    assert(e.getMessage.contains("non-negative"),
      s"negative ids must fail loudly, got: ${e.getMessage}")
  }

  test("packing offsets are contiguous per (split, shard) in doc_id order") {
    import spark.implicits._
    val rows = result.select("split", "shard", "doc_id", "n_tok", "start_off")
      .as[(String, Long, Long, Long, Long)].collect()
      .groupBy(r => (r._1, r._2))
    rows.foreach { case ((sp, sh), g) =>
      var off = 0L
      g.sortBy(_._3).foreach { case (_, _, id, n, start) =>
        assert(start == off, s"split=$sp shard=$sh doc=$id offset $start != $off")
        off += n
      }
    }
    assert(rows.nonEmpty)
  }

  test("--classifier-min gates monotonically and p>=0 is a no-op") {
    val base = Files.createTempDirectory("graft-curate-cls").toString
    val in = "/root/testdata/sf0.001/documents.parquet"
    // p is in (0,1): a 0.0 threshold must reproduce the ungated run
    // bit-for-bit (same report, same shipped doc set)
    val rNoop = Curate.run(spark, in, s"$base/noop", classifierMin = Some(0.0))
    assert(rNoop.json == report.json)
    val noopIds = spark.read.parquet(s"$base/noop").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val baseIds = result.select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(noopIds == baseIds)
    // a harsh threshold strictly shrinks the gated set but the
    // pipeline (span cut, strip, split, pack, report) stays coherent
    val rHard = Curate.run(spark, in, s"$base/hard", classifierMin = Some(0.999))
    assert(rHard.nGated < report.nGated)
    assert(rHard.nFinal <= rHard.nGated)
    assert(rHard.nInput == report.nInput)
  }
}
