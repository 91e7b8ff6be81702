package graft

import java.nio.file.Files

import graft.sources.Tables
import org.apache.spark.sql.functions._

/**
 * Regression net for the driver-testdata hazard that broke round 8:
 * `events.parquet`'s `ts` physical type has changed across testdata
 * generations — parquet TIMESTAMP(NANOS) (read as LongType ns under
 * nanosAsLong), plain `timestamp[us]` (read as TIMESTAMP_NTZ by
 * Spark 4, which `unix_millis` rejects outright), and tz-adjusted
 * TIMESTAMP. [[Tables.tsToMillis]] must produce identical epoch-ms
 * for the same instant regardless of which flavor is on disk.
 */
class SourcesTsSpec extends SparkSpec {

  // Epoch micros for 2024-03-01T12:34:56.789123Z (sub-ms digits check
  // exact truncation, not rounding).
  private val micros = 1709296496789123L
  private val wantMs = 1709296496789L

  private def roundtrip(writeSql: String): Long = {
    val dir = Files.createTempDirectory("graft-ts").toFile
    dir.deleteOnExit()
    val path = s"${dir.getAbsolutePath}/t.parquet"
    spark.sql(writeSql).write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
    df.select(Tables.tsToMillis(df, "ts").as("ms"))
      .collect().head.getLong(0)
  }

  test("tsToMillis: LongType nanoseconds (legacy NANOS testdata)") {
    assert(roundtrip(s"SELECT CAST(${micros}000 AS BIGINT) AS ts") === wantMs)
  }

  test("tsToMillis: TIMESTAMP_NTZ (plain timestamp[us], current testdata)") {
    assert(roundtrip(
      s"SELECT CAST(timestamp_micros($micros) AS TIMESTAMP_NTZ) AS ts") === wantMs)
  }

  test("tsToMillis: tz-adjusted TIMESTAMP") {
    assert(roundtrip(s"SELECT timestamp_micros($micros) AS ts") === wantMs)
  }

  test("events loader survives every ts flavor end-to-end") {
    val dir = Files.createTempDirectory("graft-ev").toFile
    dir.deleteOnExit()
    for ((cast, sub) <- Seq(
        (s"CAST(${micros}000 AS BIGINT)", "ns"),
        (s"CAST(timestamp_micros($micros) AS TIMESTAMP_NTZ)", "ntz"),
        (s"timestamp_micros($micros)", "ltz"))) {
      val sf = s"${dir.getAbsolutePath}/$sub"
      spark.sql(
        s"""SELECT 1L AS event_id, $cast AS ts, 7L AS user_id,
           |'click' AS event_type, 1.5 AS value, 'p' AS props""".stripMargin)
        .write.mode("overwrite").parquet(s"$sf/events.parquet")
      val got = Tables.events(spark, sf).select("ts").collect().head.getLong(0)
      assert(got === wantMs, s"flavor $sub")
    }
  }
}
