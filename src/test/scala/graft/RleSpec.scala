package graft

import graft.model.Point
import graft.operators.Rle

/** RLE golden (FIXTURES §H) + encode∘expand identity property. */
class RleSpec extends SparkSpec {

  test("RLE golden: runs collapse with end_ts, singletons keep null end_ts") {
    val pts = Seq(0L -> 5.0, 10L -> 5.0, 20L -> 5.0, 30L -> 7.0, 40L -> 7.0, 50L -> 5.0)
    val enc = Rle.encode(Point.withSeriesKey(series(pts)))
      .select("ts", "dval", "end_ts").collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .sortBy(_._1).toSeq
    assert(enc === Seq(
      (0L, 5.0, Some(20L)), (30L, 7.0, Some(40L)), (50L, 5.0, None)))
  }

  test("string-valued runs collapse too (reference compares the full value)") {
    import org.apache.spark.sql.functions._
    val df = Point.withSeriesKey(series(
        Seq(0L -> 0.0, 10L -> 0.0, 20L -> 0.0, 30L -> 0.0)))
      .withColumn("dval", lit(null).cast("double"))
      .withColumn("sval",
        element_at(array(lit("up"), lit("up"), lit("down"), lit("down")),
          (col("ts") / 10 + 1).cast("int")))
    val enc = Rle.encode(df).select("ts", "sval", "end_ts").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).sortBy(_._1).toSeq
    assert(enc === Seq((0L, "up", Some(10L)), (20L, "down", Some(30L))))
  }

  test("expand(encode(x)) == x on the sampling grid (seeded property)") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val pts = (0 until 40).map(i => (i * 10L, rnd.nextInt(4).toDouble))
      val df = Point.withSeriesKey(series(pts))
      val roundTrip = collectTsVal(Rle.expand(Rle.encode(df), 10L))
      assert(roundTrip === pts.sortBy(_._1))
    }
  }
}
