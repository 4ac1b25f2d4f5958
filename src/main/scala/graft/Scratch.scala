package graft

import org.apache.spark.sql.SparkSession

/** Profiling scratch main (contents change per investigation).
  * Last: quantified the single-row-group scan bottleneck — timed six
  * heavy entries at sf0.1 with and without a Tables-level spread.
  * Result: NO wins, d77/d85 regressed (the round-robin exchange pays
  * a serialized local materialization right where it was meant to
  * help); the spread was REJECTED — see SURVEY §11k item 23. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir", "/tmp/scratch_wh")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val names = Seq("d60_bpe_train", "d61_trained_tokenize",
      "d85_video_index_screen", "d94_line_dedup", "d77_model_pipeline",
      "d30_minhash_oracle")
    names.foreach { n =>
      SparkEntry.queries.get(n).foreach { q =>
        def once(): Double = {
          val t0 = System.nanoTime()
          q(spark, sf).write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        }
        val t = math.min(once(), once())
        println(f"$n%-26s $t%7.2f s")
      }
    }
    spark.stop()
  }
}
