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
    // targeted oracle dump for a single query at a given SF, in the
    // Verify output layout ($out/$name/*.parquet + oracle_sql.json)
    // so `tools/local_verify.py <sf> $out --skip-spark` gates just
    // this query
    val name = args(0)
    val sf = args(1)
    val out = args(2)
    SparkEntry.queries(name)(spark, sf)
      .coalesce(1).write.mode("overwrite").parquet(s"$out/$name")
    val sqlJson = SparkEntry.oracleSql.get(name).map { sql =>
      val esc = sql.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n").replace("\t", "\\t")
      s"""{"$name": "$esc"}"""
    }.getOrElse("{}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$out/oracle_sql.json"),
      sqlJson.getBytes("UTF-8"))
    println(s"[scratch] wrote $name from $sf to $out/$name")
    spark.stop()
  }
}
