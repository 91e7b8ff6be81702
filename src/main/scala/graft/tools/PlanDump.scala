package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch tool: dump executed plans for named queries (comma list in
  * SPARK_GRAFT_ONLY). Not part of the library surface. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("plandump")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "t_winnow_pairs").split(",")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sf)
      df.collect()
      println(s"===== $n (final) =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
