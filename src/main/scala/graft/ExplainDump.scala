package graft
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.toSeq.foreach { q =>
      val p = SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
        .queryExecution.executedPlan.toString
      println(s"===== $q")
      p.linesIterator.filter(l => l.contains("ReadSchema") || l.contains("PushedFilters"))
        .foreach(l => println("  " + l.trim.take(220)))
    }
    spark.stop()
  }
}
