package graft

import graft.text.Classifier
import org.apache.spark.sql.functions._

/**
 * The classifier-gate contract: bit-deterministic training regardless
 * of physical partitioning (the decimal-sum requirement), a zero-
 * shuffle scoring projection, and a link function that actually
 * separates the classes it is given.
 */
class ClassifierSpec extends SparkSpec {

  import spark.implicits._

  /** Synthetic corpus with a real signal: label-1 docs are vowel-heavy
    * prose with spaces; label-0 docs are consonant runs. */
  private def docs(n: Int) = (0 until n).map { i =>
    val good = i % 3 == 0
    val text =
      if (good) s"the quiet house ${"aeiou " * (3 + i % 4)}rose above $i"
      else s"zxqvk$i${"bcdfg" * (4 + i % 5)}"
    (i.toLong, text, if (good) "en" else "xx")
  }.toDF("doc_id", "text", "lang")

  private def score(df: org.apache.spark.sql.DataFrame) =
    Classifier.trainAndScore(df, when(col("lang") === "en", 1.0).otherwise(0.0))

  test("training is bit-identical across partition layouts") {
    val base = docs(120)
    val a = score(base.repartition(1)).collect().map(_.toString).sorted
    val b = score(base.repartition(13, col("doc_id"))).collect().map(_.toString).sorted
    assert(a.sameElements(b),
      "decimal gradient sums must make weights independent of partition order")
  }

  test("scoring is a zero-shuffle projection with literal weights") {
    val scored = score(docs(60))
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"scoring must not shuffle — weights are plan literals:\n$plan")
  }

  test("learned model separates an actually-separable corpus") {
    val scored = score(docs(150))
      .join(docs(150).select(col("doc_id"), (col("lang") === "en").as("truth")), "doc_id")
    val agg = scored.groupBy("truth").agg(avg("score").as("mean_score")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(agg(true) > agg(false) + 0.1,
      s"positive class must score clearly higher: $agg")
    // And the decision rule is not degenerate in either direction.
    val preds = scored.groupBy("pred").count().collect().map(_.getLong(1))
    assert(preds.length == 2, "both predicted classes must be populated")
  }

  test("oracle SQL unrolls one aggregate stage per iteration") {
    val sql = Classifier.oracleSql("case when lang = 'en' then 1 else 0 end")
    (1 to 8).foreach(t =>
      assert(sql.contains(s"g$t as materialized (select")))
    assert(!sql.contains("g9 as"))
    assert(sql.contains("decimal(38,12)") && sql.contains("sqrt"))
  }
}
