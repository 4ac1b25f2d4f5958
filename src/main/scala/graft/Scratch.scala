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
    import graft.operators.Similarity
    import graft.sources.Tables

    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")) {
      val emb = Tables.embeddings(spark, sf)
      val queries = emb.filter(col("vec_id") < 20)
      def pairsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      val exact = pairsOf(Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 10))
      for (iters <- Seq(0, 1, 2, 3)) {
        val approx = pairsOf(Similarity.ivfTopK(queries, emb, "vec_id", "embedding", 10,
          nlist = 16, nprobe = 4, refineIters = iters))
        val recall = (exact intersect approx).size.toDouble / exact.size
        println(f"[scratch] $sf iters=$iters recall=$recall%.3f")
      }
      // determinism: same call twice
      val r1 = pairsOf(Similarity.ivfTopK(queries, emb, "vec_id", "embedding", 10, 16, 4, 2))
      val r2 = pairsOf(Similarity.ivfTopK(queries, emb, "vec_id", "embedding", 10, 16, 4, 2))
      println(s"[scratch] $sf deterministic=${r1 == r2}")
    }
    spark.stop()
  }
}
