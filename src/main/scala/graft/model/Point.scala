package graft.model

import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * One data point of one series — the engine's single logical relation
 * (reference: lib/openinstrument.proto:72-89; ms timestamps per
 * lib/openinstrument.proto:73-74).
 *
 * `endTs` carries the reference's run-length encoding: a point with
 * `endTs` set means "value held from ts through endTs"
 * (lib/openinstrument.proto:78-79).
 */
final case class Point(
    name: String,
    labels: Map[String, String],
    value_type: String,
    ts: Long,
    dval: Option[Double],
    sval: Option[String],
    end_ts: Option[Long])

object Point {

  /** Canonical at-rest / in-flight schema for point DataFrames. */
  val schema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("labels", MapType(StringType, StringType), nullable = true),
    StructField("value_type", StringType, nullable = true),
    StructField("ts", LongType, nullable = false),
    StructField("dval", DoubleType, nullable = true),
    StructField("sval", StringType, nullable = true),
    StructField("end_ts", LongType, nullable = true)))

  val columns: Seq[String] =
    Seq("name", "labels", "value_type", "ts", "dval", "sval", "end_ts")

  /**
   * Injective, codegen-friendly series key built from built-in functions
   * only — `name{k=v,...}` with keys sorted. Used as the shuffle /
   * window-partition key everywhere (Spark can't group on a MapType
   * column directly). Separator characters inside keys/values are
   * backslash-escaped so distinct label maps can never collide (e.g.
   * {"a" -> "1,b=2"} vs {"a" -> "1", "b" -> "2"}); values without
   * specials — the overwhelming case — pass through unchanged, so
   * `unkey`-style regex extraction of clean values still works.
   */
  def seriesKey(name: Column, labels: Column): Column = {
    def esc(c: Column): Column =
      regexp_replace(c, "([\\\\,={}])", "\\\\$1")
    concat(
      esc(name), // a name containing '{' must not fake a label block
      when(size(labels) > 0,
        concat(
          lit("{"),
          concat_ws(",",
            transform(
              array_sort(map_entries(labels)),
              e => concat(esc(e.getField("key")), lit("="), esc(e.getField("value"))))),
          lit("}"))).otherwise(lit("")))
  }

  /** Adds the `skey` series-key column to a canonical point DataFrame. */
  def withSeriesKey(df: DataFrame): DataFrame =
    df.withColumn("skey", seriesKey(col("name"), col("labels")))
}
