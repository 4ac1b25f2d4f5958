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
    import graft.operators.Dedup
    import graft.sources.Tables

    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      val sims = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sim"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      var brute = 0L
      var i = 0
      while (i < sims.length) {
        var j = i + 1
        while (j < sims.length) {
          if (java.lang.Long.bitCount(sims(i)._2 ^ sims(j)._2) <= 8) brute += 1
          j += 1
        }
        i += 1
      }
      val got = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 8).count()
      println(s"[scratch] $sf docs=${sims.length} brute=$brute simhashPairs=$got")
    }
    spark.stop()
  }
}
