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

  /** Feature columns over a `text` column — stripped-length fractions
    * of vowels, spaces, 'h', the 'th' digram (counts 2 chars per hit;
    * a scaled count), and non-ASCII characters (accents/CJK — the
    * strong negative signal for an English-vs-rest label). All exact
    * IEEE arithmetic, mirrored verbatim by the oracle's feature SQL. */
  def features(text: Column): Seq[Column] = {
    val len = length(text).cast("double")
    def frac(stripped: Column): Column =
      (len - length(stripped).cast("double")) / (lit(1.0) + len)
    Seq(
      frac(regexp_replace(text, "[aeiou]", "")),
      frac(regexp_replace(text, " ", "")),
      frac(regexp_replace(text, "h", "")),
      frac(regexp_replace(text, "th", "")),
      frac(regexp_replace(text, "[^\\x00-\\x7F]", "")))
  }

  private val featureSqls: Seq[String] = {
    def frac(stripped: String): String =
      s"(cast(length(text) as double) - cast(length($stripped) as double))" +
        " / (cast(1 as double) + cast(length(text) as double))"
    Seq(
      frac("regexp_replace(text, '[aeiou]', '', 'g')"),
      frac("regexp_replace(text, ' ', '', 'g')"),
      frac("regexp_replace(text, 'h', '', 'g')"),
      frac("regexp_replace(text, 'th', '', 'g')"),
      frac("regexp_replace(text, '[^\\x00-\\x7f]', '', 'g')"))
  }

  /** Softsign link: strictly increasing, range (0,1), exp-free. */
  private def link(z: Column): Column =
    lit(0.5) * (lit(1.0) + z / (lit(1.0) + abs(z)))

  /** A trained model: per-feature standardization (mean, sigma) and
    * the learned weights (bias first). Plain values — scoring embeds
    * them as plan literals, so a frozen model scores batch OR
    * streaming frames identically. */
  final case class Model(mu: Seq[Double], sigma: Seq[Double], w: Seq[Double])

  /**
   * Trains on `docs` (needs `text` and the 0/1 double `label` produced
   * by `labelExpr`).
   *
   * Pipeline: one standardization aggregate (per-feature mean/var via
   * decimal sums — raw fractions are too small for GD to separate),
   * then `iters` gradient aggregates over z-scored features. sqrt is
   * IEEE-correctly-rounded, so standardization stays cross-engine
   * bit-exact.
   */
  def train(docs: DataFrame, labelExpr: Column,
            iters: Int = 8, lr: Double = 2.0): Model = {
    val xs = features(col("text"))
    // Narrow-scan fan-out before the featurization (guide §2.5): the
    // bench corpus is one parquet row group, so the 5-regexp pass —
    // and the persisted partitions every gradient aggregate reads —
    // would otherwise live in ONE task. Identity at production scan
    // widths (condition reads the actual split count).
    val raw = graft.sources.Tables.fanOut(docs).select(
      (col("doc_id") +: labelExpr.cast("double").as("y") +:
        xs.zipWithIndex.map { case (c, i) => c.as(s"x$i") }): _*)
    val k = xs.size
    // The featurization (5 regexp_replace passes over every document)
    // is the expensive per-row work, and the count, the stats pass and
    // all `iters` gradient passes aggregate over the SAME featurized
    // rows — without a persist each of those 2+iters actions re-runs
    // the regexps over the full corpus. The persisted frame is k+2
    // numerics per row (orders of magnitude narrower than the text it
    // derives from), and it is released before returning, inside the
    // one training call — nothing outlives the query. Caching cannot
    // move a bit of the trajectory: every aggregate over it is an
    // exact decimal(38,12) sum, partition- and order-independent.
    raw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // n rides the stats aggregate (guide §1.2: one corpus pass, not
      // two — count() as a separate action re-ran a full aggregate job
      // over the persisted frame for one long). Same sums, same n,
      // identical trajectory.
      val stats = raw.agg(
        count(lit(1)).as("cnt"),
        ((0 until k).map(i => sum(col(s"x$i").cast("decimal(38,12)")).as(s"m$i")) ++
          (0 until k).map(i =>
            sum((col(s"x$i") * col(s"x$i")).cast("decimal(38,12)")).as(s"q$i"))): _*)
        .head()
      val n = stats.getLong(0).toDouble
      val mu = (0 until k).map(i => stats.getDecimal(1 + i).doubleValue() / n)
      val sg = (0 until k).map { i =>
        val msq = stats.getDecimal(1 + k + i).doubleValue() / n
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
        // err is PROJECTED once below the aggregate: written inline,
        // every one of the k+1 sums embeds its own copy of the full
        // link(z) chain, so each pass's generated aggregate code is
        // (k+1)× larger — and because the weights are fresh literals
        // every pass, that source is Janino-recompiled per pass. The
        // projection computes the identical expression (same IEEE ops,
        // same order — err*x_i is unchanged arithmetic), once per row.
        val sums = f.select((link(z) - col("y")).as("e") +:
            (0 until k).map(i => col(s"x$i")): _*)
          .agg(
            sum(col("e").cast("decimal(38,12)")).as("s0"),
            (0 until k).map(i =>
              sum((col("e") * col(s"x$i")).cast("decimal(38,12)")).as(s"s${i + 1}")): _*)
          .head()
        w = w.indices.map { j =>
          w(j) - lr * (sums.getDecimal(j).doubleValue() / n)
        }.toArray
      }
      Model(mu, sg, w.toSeq)
    } finally raw.unpersist(false)
  }

  /** The model's probability as a plain column over a text column —
    * a pure expression (model as literals), usable inline as a gate
    * predicate or a streaming projection. */
  def probability(text: Column, m: Model): Column = {
    val xs = features(text)
    val z = xs.zipWithIndex.foldLeft(lit(m.w(0)): Column) { case (acc, (x, i)) =>
      acc + lit(m.w(i + 1)) * ((x - lit(m.mu(i))) / lit(m.sigma(i)))
    }
    link(z)
  }

  /** Scores any frame carrying (doc_id, text) with a frozen model —
    * a pure projection (zero shuffle, no aggregation), so it applies
    * unchanged to a streaming source: (doc_id, score, pred). */
  def score(docs: DataFrame, m: Model): DataFrame = {
    val p = probability(col("text"), m)
    docs.select(col("doc_id"), round(p, 4).as("score"), (p >= 0.5).as("pred"))
  }

  /** Train-then-score over the same corpus (the gate shape). */
  def trainAndScore(docs: DataFrame, labelExpr: Column,
                    iters: Int = 8, lr: Double = 2.0): DataFrame =
    score(docs, train(docs, labelExpr, iters, lr))

  /**
   * Live curation scoring — the `follow=` analog for the classifier
   * stage, closing the batch/stream symmetry the alert engine has
   * ([[graft.streaming.StreamIngest.alertRulesFollow]]): watches
   * `sourceDir` for document-parquet drops (`doc_id`, `text`) and
   * scores each arriving document with the FROZEN model. Because
   * [[score]] embeds the weights as plan literals, the streaming plan
   * is the same zero-shuffle stateless projection as batch — no
   * watermark, no state store, exactly-once per file via the source's
   * file log — so streamed scores are bit-identical to batch scores
   * of the same rows. `minScore` turns the stream into the curation
   * gate itself (`--classifier-min` semantics: keep docs scoring at
   * or above the threshold). Model REFRESH is a stream restart with
   * new weights against the same checkpoint: the file-source log
   * guarantees already-scored drops are not re-emitted, so each doc
   * is scored by exactly the model live at its arrival.
   */
  def scoreFollow(spark: org.apache.spark.sql.SparkSession,
                  sourceDir: String, m: Model,
                  minScore: Option[Double] = None): DataFrame = {
    val docSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType, nullable = true)))
    val docs = spark.readStream.schema(docSchema).parquet(sourceDir)
    val scored = score(docs, m)
    minScore.fold(scored)(t => scored.filter(col("score") >= t))
  }

  /**
   * ROC-AUC over a frame carrying (score, y) — the filter-model
   * evaluation half of classifier-based curation. The label rides the
   * scoring projection itself (compute `y` inline rather than joining
   * a label frame back on doc_id: that join would shuffle two
   * corpus-sized frames and scan the table twice for nothing).
   *
   * Mann-Whitney over the score DISTRIBUTION: counts per distinct
   * (4dp-rounded) score, exclusive prefix of negatives via a window
   * over that bounded aggregated table (≤10001 rows — never the raw
   * corpus; the de-skew precedent), then
   * AUC = Σ np·(2·negBelow + nn) / (2·Npos·Nneg) in exact decimal
   * integer arithmetic, so 1e11-scale counts cannot lose bits in
   * doubles. Output: one row (auc, n_pos, n_neg).
   */
  def auc(scored: DataFrame): DataFrame = {
    val g = scored
      .groupBy("score").agg(
        sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("np"),
        sum(when(col("y") === 1.0, 0L).otherwise(1L)).as("nn"))
    // asc_nulls_last: Spark defaults NULLS FIRST ascending, DuckDB
    // defaults NULLS LAST — a single null score (null text) would
    // shift every exclusive negative-prefix count between the engines
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").asc_nulls_last).rowsBetween(Long.MinValue, -1)
    val c = g.withColumn("cb", coalesce(sum("nn").over(w), lit(0L)))
    c.agg(
        sum(col("np").cast("decimal(18,0)") *
          (lit(2).cast("decimal(18,0)") * col("cb").cast("decimal(18,0)") +
            col("nn").cast("decimal(18,0)"))).as("num"),
        sum("np").as("tp"), sum("nn").as("tn"))
      .select(
        round(col("num").cast("double") /
          (lit(2.0) * col("tp").cast("double") * col("tn").cast("double")), 4)
          .as("auc"),
        col("tp").cast("long").as("n_pos"),
        col("tn").cast("long").as("n_neg"))
  }

  /** DuckDB twin of [[auc]] over the [[oracleSql]] scored set. */
  def aucOracleSql(labelSql: String): String =
    s"""with scored as (select * from (${oracleSql(labelSql)})),
       |lab as (select doc_id, $labelSql as y from documents),
       |g as (
       |  select s.score,
       |         sum(case when l.y = 1 then 1 else 0 end) as np,
       |         sum(case when l.y = 1 then 0 else 1 end) as nn
       |  from scored s join lab l using (doc_id) group by 1
       |),
       |c as (
       |  select score, np, nn,
       |         coalesce(sum(nn) over (order by score asc nulls last
       |           rows between unbounded preceding and 1 preceding), 0) as cb
       |  from g
       |),
       |t as (
       |  select sum(cast(np as decimal(18,0)) *
       |             (cast(2 as decimal(18,0)) * cast(cb as decimal(18,0)) +
       |              cast(nn as decimal(18,0)))) as num,
       |         sum(np) as tp, sum(nn) as tn
       |  from c
       |)
       |select round(cast(num as double) /
       |         (cast(2 as double) * cast(tp as double) * cast(tn as double)), 4)
       |         as auc,
       |       cast(tp as bigint) as n_pos, cast(tn as bigint) as n_neg
       |from t""".stripMargin

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
      s"g$t as materialized (select $sums from f, $prev),\n" +
        s"w$t as materialized (select $upd from g$t, $prev, n)"
    }.mkString(",\n")
    // every stage is AS MATERIALIZED: DuckDB inlines multiply-referenced
    // CTEs, and each w_t is referenced by BOTH g_{t+1} and w_{t+1} — the
    // inlined tree doubles per iteration (2^8 re-expansions of the
    // 5-regexp corpus scan; the sf1 oracle timed out). Materialized, the
    // corpus is scanned once per gradient aggregate, exactly like the
    // Spark side. A pure plan hint — identical arithmetic and output.
    s"""with r as materialized (
       |  select doc_id, $labelSql as y, $feat from documents
       |),
       |n as materialized (select cast(count(*) as double) as c from r),
       |st as materialized (select $statSums from r),
       |f as materialized (select r.doc_id, r.y, $stdCols from r, st, n),
       |w0 as materialized (select $w0),
       |$stages
       |select f.doc_id, round(${pSql(s"w$iters")}, 4) as score,
       |       ${pSql(s"w$iters")} >= cast(0.5 as double) as pred
       |from f, w$iters""".stripMargin
  }
}
