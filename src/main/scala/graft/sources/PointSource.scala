package graft.sources

import graft.model.Point
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Readers producing the canonical point schema ([[graft.model.Point]]).
 *
 * The at-rest format is Parquet partitioned by date with a bloom filter
 * on `name` — the Spark-native replacement for the reference's indexed
 * store files (header index → Parquet footer stats; bloom filter →
 * parquet.bloom.filter.*; per-file time pruning → row-group min/max;
 * see reference go/.../store_manager/indexed_store_file.go:110-146).
 */
object PointSource {

  /**
   * Adapts the driver's `events` table onto the canonical schema:
   * one series per (event_type, user) pair, GAUGE-typed, ms timestamps.
   */
  /** `eventTypes` non-empty restricts the scan to those types — the
    * filter lands on the RAW `event_type` column, before the
    * name-mapping select, so it reaches the parquet scan as a pushed
    * filter. (A filter on the derived `name` — a concat over
    * event_type — can never push; a 5-metric query would scan every
    * event at 100 TB.) */
  def events(spark: SparkSession, sfDir: String,
             eventTypes: Seq[String] = Nil): DataFrame = {
    val raw0 = Tables.parquetCached(spark, s"$sfDir/events.parquet")
    val raw = if (eventTypes.isEmpty) raw0
      else raw0.filter(col("event_type").isin(eventTypes: _*))
    // ts physical type has varied across driver testdata generations
    // (TIMESTAMP(NANOS)→LongType ns, timestamp[us]→TIMESTAMP_NTZ, or
    // tz-adjusted TIMESTAMP); Tables.tsToMillis handles all three.
    val tsMs = Tables.tsToMillis(raw, "ts")
    raw.select(
        concat(lit("/events/"), col("event_type")).as("name"),
        map(lit("user"), col("user_id").cast("string")).as("labels"),
        lit("GAUGE").as("value_type"),
        tsMs.as("ts"),
        col("value").as("dval"),
        col("props").as("sval"), // string payload column (proto:75-76)
        lit(null).cast("long").as("end_ts"))
  }

  /**
   * [[events]] with the series key pre-built by the adapter.
   *
   * The adapter's label set is statically `{user → user_id}` and its
   * names/values contain none of the characters the generic
   * [[graft.model.Point.seriesKey]] escapes (`\,={}`): `name` is
   * `"/events/" + event_type` where the driver's oracle CTE already
   * relies on `'/events/' || event_type` round-tripping unescaped, and
   * `user_id` casts from a number. On that domain the generic key —
   * escape-regexes over name/key/value plus a map-entry sort per row —
   * collapses to one concat, bit-identically. This matters because the
   * events scan is a single parquet row group at bench scale factors,
   * so everything below the first exchange runs in ONE task: the
   * generic key costs ~0.2 s of serial wall per events gate (measured,
   * MicroProfile) and the concat is free.
   */
  def eventsKeyed(spark: SparkSession, sfDir: String,
                  eventTypes: Seq[String] = Nil): DataFrame =
    events(spark, sfDir, eventTypes).withColumn("skey",
      concat(col("name"), lit("{user="),
        element_at(col("labels"), "user"), lit("}")))

  /** Reads a point store written by [[write]]. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select(Point.columns.map(col): _*)

  /**
   * Writes a point DataFrame as the at-rest layout: partitioned by UTC
   * date (partition pruning for time-range queries), bloom filter on
   * `name` (exact-series lookup skips files, like the reference's
   * per-file bloom filter), sorted by (name, ts) within partitions so
   * row-group stats prune tightly.
   */
  def write(df: DataFrame, path: String): Unit = {
    df.withColumn("date", to_date(timestamp_millis(col("ts"))))
      .repartition(col("date"), col("name"))
      .sortWithinPartitions("name", "ts")
      .write
      .option("parquet.bloom.filter.enabled#name", "true")
      .partitionBy("date")
      .mode("overwrite")
      .parquet(path)
  }

  /**
   * Bucketed at-rest layout — the shuffle-paid-once story for 100 TB.
   * The series key is materialized and hash-bucketed into `nBuckets`
   * files at write time (`bucketBy` + `sortBy`), registered as `table`
   * with data under `path`. Every per-series operator that would
   * shuffle on the series key — groupBy aggregations, lag/window rate,
   * series self-joins, joins between two stores bucketed alike — then
   * starts from a bucket-aligned scan and skips its Exchange entirely:
   * the biggest shuffle of every per-series query is paid once, at
   * ingest. `nBuckets` sizes to cluster width (buckets ≳ executor
   * cores; 32 matches the local harness).
   *
   * Bucket metadata lives in the catalog — in-memory per session here,
   * a persistent metastore in production (the parquet files alone
   * carry no bucket contract; reference analog: the hash-ring routing
   * SURVEY §4 maps to partitioning).
   */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    nBuckets: Int = 32): Unit =
    // Pre-repartition on skey with numPartitions = nBuckets: Spark's
    // repartition hash and the bucket-id hash are the same
    // murmur3-mod-n, so each task holds exactly one bucket's rows →
    // ONE file per bucket. Without it every input task writes its own
    // file per bucket (P×nBuckets small files at ingest width), and a
    // multi-file bucket forfeits the sorted-scan path sortBy buys
    // (per-file order only).
    Point.withSeriesKey(df)
      .repartition(nBuckets, col("skey"))
      .write.bucketBy(nBuckets, "skey").sortBy("skey", "ts")
      .option("path", path)
      .option("parquet.bloom.filter.enabled#name", "true")
      .format("parquet").mode("overwrite").saveAsTable(table)

  /** Reads a [[writeBucketed]] store; the scan reports its bucket
    * hash-partitioning on `skey`, which is what lets the planner drop
    * per-series exchanges (asserted in StoreSpec). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /**
   * Gorilla value-block tier — the cold-storage layout for NUMERIC
   * series (the reference's encoded value stream analog,
   * lib/protobuf.cc EncodeValueStream; here the VLDB'15 XOR format via
   * [[graft.codec.Gorilla]]). Each (series, UTC day) collapses to one
   * (skey, block_ts, n, blob) row, date-partitioned with a bloom
   * filter on `skey`: a time-range scan prunes whole days BEFORE any
   * decompression, and an exact-series lookup skips files on the
   * bloom. String payloads (`sval`) and typed metadata do not ride
   * this tier — it is the ~10× smaller numeric mirror the hot Parquet
   * tier ages into, not a replacement for it.
   *
   * Input must carry (skey, ts, dval) — [[graft.model.Point
   * .withSeriesKey]] upstream keeps the key injective.
   */
  def writeGorilla(df: DataFrame, path: String,
                   blockMs: Long = 86400000L): Unit =
    graft.codec.Gorilla.encode(df, blockMs)
      .withColumn("date", to_date(timestamp_millis(col("block_ts"))))
      .write
      .option("parquet.bloom.filter.enabled#skey", "true")
      .partitionBy("date")
      .mode("overwrite")
      .parquet(path)

  /**
   * Reads a [[writeGorilla]] tier back to (skey, ts, dval) points.
   * `minTs`/`maxTs` (ms, half-open) drive DATE PARTITION pruning on
   * the block grain before decode — only surviving blobs decompress —
   * then the exact per-point bound applies post-decode (a block
   * straddling the range boundary decodes and trims).
   */
  def readGorilla(spark: SparkSession, path: String,
                  minTs: Option[Long] = None,
                  maxTs: Option[Long] = None): DataFrame = {
    val blocks0 = spark.read.parquet(path)
    val blocks1 = minTs.fold(blocks0)(t => blocks0.filter(
      col("date") >= to_date(timestamp_millis(lit(t)))))
    val blocks = maxTs.fold(blocks1)(t => blocks1.filter(
      col("date") <= to_date(timestamp_millis(lit(t)))))
    val pts0 = graft.codec.Gorilla.decode(blocks)
    val pts1 = minTs.fold(pts0)(t => pts0.filter(col("ts") >= t))
    maxTs.fold(pts1)(t => pts1.filter(col("ts") < t))
  }

  /**
   * Reconstructs CANONICAL points from a [[writeGorilla]] tier, so the
   * whole Engine/HTTP query surface runs unchanged against the cold
   * tier: `skey` is the reference's text form (`/name{k=v,…}`) and
   * parses back losslessly via [[graft.model.Variable.parse]];
   * `sval`/`end_ts` are null by tier contract (numeric blocks only)
   * and `value_type` reports GAUGE.
   */
  def readGorillaPoints(spark: SparkSession, path: String,
                        minTs: Option[Long] = None,
                        maxTs: Option[Long] = None): DataFrame = {
    readGorilla(spark, path, minTs, maxTs)
      .withColumn("__v",
        graft.functions.ParseVariable.parseVariable(col("skey")))
      .select(
        col("__v.name").as("name"),
        col("__v.labels").as("labels"),
        lit("GAUGE").as("value_type"),
        col("ts"), col("dval"),
        lit(null).cast("string").as("sval"),
        lit(null).cast("long").as("end_ts"))
  }

  /**
   * Compaction job — the Spark-native replacement for the reference's
   * background compact/split/join cycle (go/.../datastore/datastore.go:
   * 519-557 compactBlock, 354-479 split/join, triggers at 687-705):
   * rewrites the store re-sorted and re-clustered so many small ingest
   * files (e.g. streaming micro-batch output) become few large ones,
   * restoring tight row-group stats and bloom filters. Runs per date
   * partition at scale; `targetFilesPerDate` bounds output file count
   * (the reference's split threshold analog).
   */
  def compact(spark: SparkSession, path: String,
              targetFilesPerDate: Int = 1): Unit = {
    val staged = path.stripSuffix("/") + ".compact"
    val df = spark.read.parquet(path)
    df.repartition(targetFilesPerDate, col("date"), col("name"))
      .sortWithinPartitions("name", "ts")
      .write
      .option("parquet.bloom.filter.enabled#name", "true")
      .partitionBy("date")
      .mode("overwrite")
      .parquet(staged)
    // atomic-ish swap (single filesystem rename pair); FS resolved
    // from the store path, not the default FS (s3a/hdfs stores)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val s = new org.apache.hadoop.fs.Path(staged)
    val old = new org.apache.hadoop.fs.Path(path + ".old")
    fs.rename(p, old)
    fs.rename(s, p)
    fs.delete(old, true)
  }

  /**
   * Retention sweep job — the Spark-native analog of the reference's
   * background retention runner (server/store_file_manager.cc:87-191:
   * during background file management each policy item drops or
   * downsamples points aged past its window): rewrites at-rest date
   * partitions through [[graft.retention.Retention.apply]] so DROPped
   * points physically disappear and downsample items shrink aged data
   * to their mutated grid. Only days the policy can touch are
   * rewritten — a partition younger than the smallest item `min_age`
   * is left alone, so read amplification is bounded by affected days.
   * Re-runnable: a second sweep over age-stable survivors is a no-op
   * rewrite (downsampled grids map to themselves). Crash safety: each
   * swept day moves to a trash dir BEFORE its replacement renames in,
   * and sweep start replays any interrupted swap (a trash day whose
   * store partition is missing renames back) — no window exists where
   * a day's only copy lives in a dir a re-run would overwrite.
   * Survivors whose mutated timestamps land on a day the sweep did not
   * touch (an Interpolate grid can emit into an empty day) are
   * merge-moved file-by-file into that day rather than replacing it.
   */
  def retentionSweep(spark: SparkSession, path: String,
                     policy: graft.retention.Retention.Policy,
                     nowMs: Long): Seq[String] = {
    val trash = new org.apache.hadoop.fs.Path(
      path.stripSuffix("/") + ".rettrash")
    val fs = trash.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash recovery: a prior run that died between trash-move and
    // rename left the day's only copy in trash — restore it first
    if (fs.exists(trash)) {
      fs.listStatus(trash).foreach { st =>
        val target = new org.apache.hadoop.fs.Path(path, st.getPath.getName)
        if (!fs.exists(target)) fs.rename(st.getPath, target)
      }
      fs.delete(trash, true)
    }
    // Pruning bound: only items that CHANGE data (DROP, or KEEP with a
    // downsample chain) make a rewrite worthwhile; an UNBOUNDED plain
    // KEEP never alters a partition. A KEEP with a finite max_age DOES
    // change data: a point aging past that window falls through to the
    // items below it — or to the implicit default-DROP when nothing
    // else matches — so the sweep must revisit days once they cross
    // the keep window (otherwise a KEEP-only policy like
    // "KEEP max_age 7d" would retain aged unmatched data at rest
    // forever, diverging from the reference's periodic runner). Days
    // younger than the earliest changing age are skipped; a policy
    // wanting immediate default-drops adds an explicit catch-all DROP
    // at min_age 0.
    val changing = policy.items.collect {
      case it if it.policy == graft.retention.Retention.Drop ||
        it.mutations.nonEmpty => it.minAgeMs
      case it if it.policy == graft.retention.Retention.Keep &&
        it.maxAgeMs > 0L => it.maxAgeMs
    }
    if (changing.isEmpty) return Nil
    val cutoffDay = java.time.Instant.ofEpochMilli(nowMs - changing.min)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
    val hot = spark.read.parquet(path)
    val dates = hot.filter(col("date") <= cutoffDay)
      .select(col("date").cast("string")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq // O(#days) driver rows
    if (dates.isEmpty) return Nil
    val survivors = graft.retention.Retention.apply(
        hot.filter(col("date") <= cutoffDay).drop("date"), policy, nowMs)
      // the canonical columns ONLY: Retention.apply's internal skey
      // must not leak into the at-rest schema (a mixed-schema store
      // would read skey = null for old partitions and collapse every
      // series into one group on the next sweep)
      .select(graft.model.Point.columns.map(col): _*)
    val staged = path.stripSuffix("/") + ".retstage"
    survivors
      .withColumn("date", to_date(timestamp_millis(col("ts"))))
      .repartition(col("date"))
      .sortWithinPartitions("name", "ts")
      .write
      .option("parquet.bloom.filter.enabled#name", "true")
      .partitionBy("date")
      .mode("overwrite")
      .parquet(staged)
    // swap: trash-move the swept source day, then rename its staged
    // replacement in (crash between the two is recovered at next start)
    dates.foreach { d =>
      val src = new org.apache.hadoop.fs.Path(s"$path/date=$d")
      if (fs.exists(src)) {
        fs.mkdirs(trash)
        fs.rename(src, new org.apache.hadoop.fs.Path(trash, s"date=$d"))
      }
      val s = new org.apache.hadoop.fs.Path(s"$staged/date=$d")
      if (fs.exists(s))
        fs.rename(s, new org.apache.hadoop.fs.Path(s"$path/date=$d"))
    }
    // staged days OUTSIDE the swept set (mutations emitted timestamps
    // into a day the sweep didn't rewrite): merge file-by-file —
    // replacing such a partition would clobber young data
    val stagedRoot = new org.apache.hadoop.fs.Path(staged)
    if (fs.exists(stagedRoot)) {
      fs.listStatus(stagedRoot)
        .filter(_.getPath.getName.startsWith("date="))
        .foreach { st =>
          val target = new org.apache.hadoop.fs.Path(path, st.getPath.getName)
          if (!fs.exists(target)) fs.rename(st.getPath, target)
          else fs.listStatus(st.getPath).foreach { f =>
            fs.rename(f.getPath,
              new org.apache.hadoop.fs.Path(target, f.getPath.getName))
          }
        }
      fs.delete(stagedRoot, true)
    }
    fs.delete(trash, true)
    dates
  }

  /**
   * Tier-aging job: moves every hot date partition strictly older than
   * `olderThanMs` into the Gorilla cold tier, then drops those
   * partitions from the hot store — the background companion of
   * [[compact]] that completes the hot→cold lifecycle
   * ([[writeGorilla]]'s "ages into" contract; reference analog: the
   * datastore's background compact cycle, go/.../datastore.go:519-557,
   * except the output is the compressed value tier, not a rewrite).
   *
   * The cutoff is a whole-day boundary (a block never straddles
   * tiers); numeric points move, string-valued points (null dval, not
   * representable in value blocks) STAY in the hot store — dropping a
   * date partition therefore requires it to carry no svals, else that
   * date is rewritten in place with only its sval rows. Cold append
   * uses dynamic partition overwrite on the moved dates: re-running
   * after a crash between the cold write and the hot delete is
   * idempotent, never duplicating blocks — and a moved date that
   * already holds cold blocks (crash residue OR a late write to an
   * aged date) is re-encoded from the union of both tiers, so the
   * overwrite never discards previously aged points.
   */
  /**
   * Hybrid tier read: one canonical point frame spanning the hot
   * Parquet store and the Gorilla cold tier — queries cross the aging
   * boundary transparently. Crash-consistent with [[ageIntoGorilla]]'s
   * write-cold-then-delete-hot order, WITHOUT hiding late writes: hot
   * numerics on a date the cold tier also holds are reconciled via an
   * exact (skey, ts) anti-join against that date's decoded cold points
   * — crash residue (rows the aging job already copied cold) drops,
   * while a late `/add` to an already-aged date (a point cold does NOT
   * have) stays visible. A hot revision at an (skey, ts) the cold tier
   * holds is suppressed — cold wins, matching [[ageIntoGorilla]]'s
   * merge preference. Checked against the reference's semantics
   * (server/disk_datastore.cc:91-111 RecordNoLog): its store is
   * append-only and never reconciles duplicate timestamps — a second
   * write to an existing ts just appends and BOTH values survive the
   * read-side timestamp merge, so "update an aged point" is not a
   * defined operation there. One-value-per-(skey,ts) is our
   * strengthening; cold-wins = first-durable-write-wins, the closest
   * analog of a store that never revises what it already persisted
   * (and the only direction that keeps replayed crash residue
   * idempotent). String-valued rows always come from hot (not
   * representable in value blocks). The cold/overlap date lists are
   * O(#days) driver rows, and the anti-join decodes ONLY the
   * overlapping dates' blocks (normally zero).
   */
  def readTiered(spark: SparkSession, hotPath: String,
                 coldPath: String): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(coldPath), spark.sparkContext.hadoopConfiguration)
    val hasCold = fs.exists(new org.apache.hadoop.fs.Path(coldPath))
    if (!hasCold) return read(spark, hotPath)
    val coldBlocks = spark.read.parquet(coldPath)
    val coldDates = coldBlocks
      .select(col("date").cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq
    val hot0 = spark.read.parquet(hotPath)
    val safeHot = hot0
      .filter(col("dval").isNull ||
        !col("date").cast("string").isin(coldDates: _*))
      .select(Point.columns.map(col): _*)
    // hot numerics landing on cold-held dates: crash residue or late
    // writes — decide per point, not per date
    val overlapDates = hot0
      .filter(col("dval").isNotNull &&
        col("date").cast("string").isin(coldDates: _*))
      .select(col("date").cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq
    val hotAll =
      if (overlapDates.isEmpty) safeHot
      else {
        val overlapping = Point.withSeriesKey(
          hot0.filter(col("dval").isNotNull &&
            col("date").cast("string").isin(overlapDates: _*)))
        val coldPts = graft.codec.Gorilla.decode(
          coldBlocks.filter(col("date").cast("string")
            .isin(overlapDates: _*)))
        safeHot.unionByName(
          overlapping
            .join(coldPts.select("skey", "ts"), Seq("skey", "ts"),
              "left_anti")
            .select(Point.columns.map(col): _*))
      }
    hotAll.unionByName(readGorillaPoints(spark, coldPath))
  }

  def ageIntoGorilla(spark: SparkSession, hotPath: String, coldPath: String,
                     olderThanMs: Long, nowMs: Long,
                     blockMs: Long = 86400000L): Seq[String] = {
    val cutoffDay = java.time.Instant
      .ofEpochMilli(nowMs - olderThanMs)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
    // Replay an interrupted sval-residue swap before reading anything:
    // a crash between the hot-partition delete and the stage rename
    // leaves that date's string-valued rows ONLY in the stage dir —
    // rename them home (or drop a stale stage if the partition still
    // exists, i.e. the crash happened before the delete).
    val fs0 = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(hotPath), spark.sparkContext.hadoopConfiguration)
    val stageRoot = new org.apache.hadoop.fs.Path(
      s"${hotPath.stripSuffix("/")}.svalstage")
    if (fs0.exists(stageRoot)) {
      fs0.listStatus(stageRoot)
        .filter(_.getPath.getName.startsWith("date=")).foreach { st =>
          val dest = new org.apache.hadoop.fs.Path(
            s"$hotPath/${st.getPath.getName}")
          if (!fs0.exists(dest)) fs0.rename(st.getPath, dest)
          else fs0.delete(st.getPath, true)
        }
      fs0.delete(stageRoot, true)
    }
    val hot = spark.read.parquet(hotPath)
    // dates are drawn from the NUMERIC doomed rows: a date already
    // reduced to its sval residue has nothing left to move and must
    // not re-select on the next run (idempotence)
    val numericDoomed = hot.filter(col("date") < cutoffDay &&
      col("dval").isNotNull)
    val dates = numericDoomed.select(col("date").cast("string")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq // O(#days) driver rows
    if (dates.isEmpty) return Nil
    val numericHot = graft.model.Point.withSeriesKey(numericDoomed)
      .select(col("skey"), col("ts"), col("dval"))
    // A selected date may ALREADY hold cold blocks — either crash
    // residue (the previous run copied cold but died before the hot
    // delete) or a late `/add` that landed hot on an aged date. The
    // dynamic partition overwrite below rewrites those dates wholesale,
    // so the re-encode must carry the existing cold points too: union
    // the overlap dates' decoded cold points with the hot rows,
    // deduping on (skey, ts) with cold preferred (matches
    // [[readTiered]]'s anti-join). Crash replay is a no-op merge (hot
    // rows ⊆ cold); a late write adds its fresh points to the block.
    val fsCold = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(coldPath), spark.sparkContext.hadoopConfiguration)
    val overlapDates =
      if (!fsCold.exists(new org.apache.hadoop.fs.Path(coldPath))) Nil
      else {
        val coldDates = spark.read.parquet(coldPath)
          .select(col("date").cast("string")).distinct()
          .collect().map(_.getString(0)).toSet
        dates.filter(coldDates)
      }
    val numeric =
      if (overlapDates.isEmpty) numericHot
      else {
        val coldPts = graft.codec.Gorilla.decode(
          spark.read.parquet(coldPath)
            .filter(col("date").cast("string").isin(overlapDates: _*)))
        numericHot
          .join(coldPts.select("skey", "ts"), Seq("skey", "ts"),
            "left_anti")
          .unionByName(coldPts)
      }
    // per-date idempotent append: overwrite ONLY the moved dates
    graft.codec.Gorilla.encode(numeric, blockMs)
      .withColumn("date", to_date(timestamp_millis(col("block_ts"))))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .option("parquet.bloom.filter.enabled#skey", "true")
      .partitionBy("date")
      .mode("overwrite")
      .parquet(coldPath)
    val fs = new org.apache.hadoop.fs.Path(hotPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    dates.foreach { d =>
      val part = new org.apache.hadoop.fs.Path(s"$hotPath/date=$d")
      val svals = hot.filter(col("date") === d && col("dval").isNull)
      if (svals.isEmpty) fs.delete(part, true)
      else {
        // keep the date's string-valued rows hot: rewrite in place
        // (stage OUTSIDE the store dir — a crash must not leave a
        // stray dir the partition discovery would misparse)
        val staged = new org.apache.hadoop.fs.Path(
          s"${hotPath.stripSuffix("/")}.svalstage/date=$d")
        svals.drop("date").write.mode("overwrite").parquet(staged.toString)
        fs.delete(part, true)
        fs.rename(staged, part)
      }
    }
    dates
  }
}
