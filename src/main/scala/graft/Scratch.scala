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
    import graft.operators.Similarity
    import graft.sources.Tables

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val emb = Tables.embeddings(spark, sf)
    emb.write.mode("overwrite").format("noop").save()
    // cold per refineIters (fresh plans each — new session would be
    // cleaner but codegen cache is global anyway)
    for (it <- Seq(0, 1, 2)) time(s"ivf cold iters=$it") {
      Similarity.ivfTopK(emb.filter(col("vec_id") < 50), emb, "vec_id",
        "embedding", 10, 16, 4, refineIters = it)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
