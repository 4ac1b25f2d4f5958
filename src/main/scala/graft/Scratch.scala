package graft

/** Profiling scratch main (contents change per investigation). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/scratch_wh_" + System.nanoTime())
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // targeted oracle dump for a single query at a given SF
    val name = args(0)
    val sf = args(1)
    val out = args(2)
    SparkEntry.queries(name)(spark, sf)
      .coalesce(1).write.mode("overwrite").parquet(out)
    println(s"[scratch] wrote $name from $sf to $out")
    spark.stop()
  }
}
