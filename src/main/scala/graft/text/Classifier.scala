package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Classifier-based corpus filtering — the "model-scored quality gate"
 * stage of large-scale training-data pipelines (a fastText/linear-probe
 * stand-in): train a tiny linear classifier on cheap per-document
 * features against a weak label, then score every document with the
 * learned weights.
 *
 * Scale shape (the part that matters at 100 TB): training is
 * full-batch gradient descent where EVERY iteration is one map-side-
 * combinable aggregate over the corpus — k+1 partial sums per
 * partition, merged on the driver (O(k) state, like the k-means‖
 * trainer in similarity/Ann.scala) — and scoring is a pure projection
 * with the learned weights embedded as plan literals (zero shuffle,
 * whole-stage codegen). No per-row model state, no driver-side data.
 *
 * Bit-reproducibility across engines (the oracle contract): the link
 * function is the softsign sigmoid 0.5*(1 + z/(1+|z|)) — only IEEE
 * +,*,/,abs, each correctly rounded, so Spark and DuckDB produce the
 * SAME double for the same row, unlike exp()-based logistic whose libm
 * may differ in the last ulp. Gradient sums go through exact
 * decimal(38,12) so partition order cannot wobble the weights, and the
 * oracle re-derives the identical training trajectory with one
 * unrolled SQL stage per iteration.
 */
object Classifier {

  /** Feature columns over a `text` column — fractions of vowels,
    * spaces, and 'h' (a crude th-digraph English signal). All exact
    * IEEE arithmetic, mirrored verbatim by [[featureSql]]. */
  def features(text: Column): Seq[Column] = {
    val len = length(text).cast("double")
    def frac(stripped: Column): Column =
      (len - length(stripped).cast("double")) / (lit(1.0) + len)
    Seq(
      frac(regexp_replace(text, "[aeiou]", "")),
      frac(regexp_replace(text, " ", "")),
      frac(regexp_replace(text, "h", "")))
  }

  private val featureSqls: Seq[String] = {
    def frac(stripped: String): String =
      s"(cast(length(text) as double) - cast(length($stripped) as double))" +
        " / (cast(1 as double) + cast(length(text) as double))"
    Seq(
      frac("regexp_replace(text, '[aeiou]', '', 'g')"),
      frac("regexp_replace(text, ' ', '', 'g')"),
      frac("regexp_replace(text, 'h', '', 'g')"))
  }

  /** Softsign link: strictly increasing, range (0,1), exp-free. */
  private def link(z: Column): Column =
    lit(0.5) * (lit(1.0) + z / (lit(1.0) + abs(z)))

  /**
   * Trains on `docs` (needs `text` and the 0/1 double `label` produced
   * by `labelExpr`) and returns the per-document scores:
   * (doc_id, score = round(p, 4), pred = p >= 0.5).
   *
   * Pipeline: one standardization aggregate (per-feature mean/var via
   * decimal sums — raw fractions are too small for GD to separate),
   * then `iters` gradient aggregates over z-scored features. sqrt is
   * IEEE-correctly-rounded, so standardization stays cross-engine
   * bit-exact.
   */
  def trainAndScore(docs: DataFrame, labelExpr: Column,
                    iters: Int = 8, lr: Double = 2.0): DataFrame = {
    val xs = features(col("text"))
    val raw = docs.select(
      (col("doc_id") +: labelExpr.cast("double").as("y") +:
        xs.zipWithIndex.map { case (c, i) => c.as(s"x$i") }): _*)
    val k = xs.size
    val n = raw.count().toDouble

    val stats = raw.agg(
      sum(col("x0").cast("decimal(38,12)")).as("m0"),
      ((1 until k).map(i => sum(col(s"x$i").cast("decimal(38,12)")).as(s"m$i")) ++
        (0 until k).map(i =>
          sum((col(s"x$i") * col(s"x$i")).cast("decimal(38,12)")).as(s"q$i"))): _*)
      .head()
    val mu = (0 until k).map(i => stats.getDecimal(i).doubleValue() / n)
    val sg = (0 until k).map { i =>
      val msq = stats.getDecimal(k + i).doubleValue() / n
      math.sqrt(msq - mu(i) * mu(i) + 1e-12)
    }
    val f = raw.select(
      (col("doc_id") +: col("y") +:
        (0 until k).map(i =>
          ((col(s"x$i") - lit(mu(i))) / lit(sg(i))).as(s"x$i"))): _*)

    var w = Array.fill(k + 1)(0.0) // bias, then one weight per feature
    def z: Column =
      (0 until k).foldLeft(lit(w(0)): Column) { (acc, i) =>
        acc + lit(w(i + 1)) * col(s"x$i")
      }

    for (_ <- 0 until iters) {
      val err = link(z) - col("y")
      val sums = f.agg(
        sum(err.cast("decimal(38,12)")).as("s0"),
        (0 until k).map(i =>
          sum((err * col(s"x$i")).cast("decimal(38,12)")).as(s"s${i + 1}")): _*)
        .head()
      w = w.indices.map { j =>
        w(j) - lr * (sums.getDecimal(j).doubleValue() / n)
      }.toArray
    }

    val p = link(z)
    f.select(col("doc_id"), round(p, 4).as("score"), (p >= 0.5).as("pred"))
  }

  /**
   * DuckDB oracle replicating [[trainAndScore]] exactly: one CTE stage
   * per gradient-descent iteration (an aggregate over the corpus), the
   * same decimal(38,12) sums, the same IEEE evaluation order.
   */
  def oracleSql(labelSql: String, iters: Int = 8, lr: Double = 2.0): String = {
    val k = featureSqls.size
    val feat = featureSqls.zipWithIndex
      .map { case (s, i) => s"$s as x$i" }.mkString(", ")
    // Standardization: means/vars from decimal sums, sigma via sqrt —
    // the same evaluation order as the Scala side.
    val statSums = ((0 until k).map(i =>
      s"cast(sum(cast(x$i as decimal(38,12))) as double) as m$i") ++
      (0 until k).map(i =>
        s"cast(sum(cast(x$i * x$i as decimal(38,12))) as double) as q$i"))
      .mkString(", ")
    val stdCols = (0 until k).map(i =>
      s"(r.x$i - st.m$i / n.c) / sqrt(st.q$i / n.c - (st.m$i / n.c) * (st.m$i / n.c) + 1e-12) as x$i")
      .mkString(", ")
    def zSql(w: String): String =
      (0 until k).foldLeft(s"$w.w0")((acc, i) => s"($acc + $w.w${i + 1} * f.x$i)")
    def pSql(w: String): String = {
      val z = zSql(w)
      s"cast(0.5 as double) * (cast(1 as double) + $z / (cast(1 as double) + abs($z)))"
    }
    val w0 = (0 to k).map(j => s"cast(0 as double) as w$j").mkString(", ")
    val stages = (1 to iters).map { t =>
      val prev = s"w${t - 1}"
      val err = s"(${pSql(prev)} - f.y)"
      val sums = (s"sum(cast($err as decimal(38,12))) as s0" +:
        (0 until k).map(i =>
          s"sum(cast($err * f.x$i as decimal(38,12))) as s${i + 1}")).mkString(", ")
      val upd = (0 to k).map(j =>
        s"$prev.w$j - cast($lr as double) * (cast(g$t.s$j as double) / n.c) as w$j")
        .mkString(", ")
      s"g$t as (select $sums from f, $prev),\n" +
        s"w$t as (select $upd from g$t, $prev, n)"
    }.mkString(",\n")
    s"""with r as (
       |  select doc_id, $labelSql as y, $feat from documents
       |),
       |n as (select cast(count(*) as double) as c from r),
       |st as (select $statSums from r),
       |f as (select r.doc_id, r.y, $stdCols from r, st, n),
       |w0 as (select $w0),
       |$stages
       |select f.doc_id, round(${pSql(s"w$iters")}, 4) as score,
       |       ${pSql(s"w$iters")} >= cast(0.5 as double) as pred
       |from f, w$iters""".stripMargin
  }
}
