package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Profiling scratch main (contents change per investigation). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    graft.sources.Tables.documents(spark, sf).count()

    for (q <- Seq("d13_corpus_filter", "d9_quality_score", "d10_token_count");
         i <- 1 to 2)
      time(s"$q $i") {
        graft.queries.DBlock.queries(q)(spark, sf)
          .write.mode("overwrite").format("noop").save()
      }
    spark.stop()
  }
}
