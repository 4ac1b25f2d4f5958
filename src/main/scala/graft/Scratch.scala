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
    // b20b determinism probe: run the r14 tolerance form N times at
    // sf0.1 and show the booleans + margin each run
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type").isNotNull)
      .select(col("event_type"), col("user_id"),
        pmod(crc32(col("user_id").cast("string")), lit(8)).as("split"))
    val viaUnion = ev.groupBy(col("event_type"), col("split"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy(col("event_type")).agg(hll_union_agg(col("sk")).as("msk"))
    val direct = ev.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("dsk"),
        countDistinct(col("user_id")).as("exact_users"))
    viaUnion.join(direct, Seq("event_type"))
      .select(col("event_type"),
        hll_sketch_estimate(col("msk")).as("em"),
        hll_sketch_estimate(col("dsk")).as("ed"),
        col("exact_users")).collect().foreach { r =>
        val (em, ed, n) = (r.getLong(1), r.getLong(2), r.getLong(3))
        println(f"[scratch] ${r.getString(0)}%-10s exact=$n em=$em ed=$ed gap_pct=${100.0*math.abs(em-ed)/n}%.3f err_pct=${100.0*math.abs(em-n)/n}%.3f")
      }
    spark.stop()
  }
}
