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
    import graft.operators.Dedup
    import graft.sources.Tables

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val docs = Tables.documents(spark, sf)
    docs.write.mode("overwrite").format("noop").save()

    for (i <- 1 to 2) time(s"d3 full (maxDist=8) run$i") {
      Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 8)
        .write.mode("overwrite").format("noop").save()
    }
    println(s"[scratch] d3 pairs=${Dedup.simhashPairs(docs, "doc_id", "text", 8).count()}")

    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      blockCols = Seq(col("lang"), expr("n_chars DIV 100").cast("int")),
      shingleK = 3, threshold = 0.2)
    for (i <- 1 to 2) time(s"d18 components run$i") {
      Dedup.components(pairs).write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
