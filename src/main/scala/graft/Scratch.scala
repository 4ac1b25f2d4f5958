package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Profiling scratch main (contents change per investigation).
  * Current: where do d55's sf1 seconds go — gram stream, counts
  * aggregate, or the final collapse? */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Dedup, TextAnalysis}

    val live = spark.read.parquet("/root/repo/tmp/sf1/documents.parquet")
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
    val tk = Dedup.tokens(col("text"))
    val tagged = Seq(1, 2, 3, 5).map { n =>
      transform(graft.functions.SketchFunctions.wordGrams(tk, n),
        g => struct(lit(n).as("n"), g.as("g")))
    }.reduce(concat(_, _))
    val grams = live
      .select(col("doc_id"), explode(tagged).as("t"))
      .select(col("doc_id"), col("t.n").as("n"),
        xxhash64(col("t.n"), col("t.g")).as("gh"),
        length(col("t.g")).as("gl"))
    def time(label: String)(mk: () => DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      println(f"$label%-26s ${once()}%7.2f s")
    }
    val gramsStr = live
      .select(col("doc_id"), explode(tagged).as("t"))
      .select(col("doc_id"), col("t.n").as("n"), col("t.g").as("g"))
    time("counts agg HASH-keyed")(() => grams.groupBy(col("doc_id"),
      col("n"), col("gh")).agg(count(lit(1)).as("c"),
      min(col("gl")).as("gl")))
    time("counts agg STRING-keyed")(() => gramsStr.groupBy(col("doc_id"),
      col("n"), col("g")).agg(count(lit(1)).as("c")))
    time("full repetitionStats")(() =>
      TextAnalysis.repetitionStats(live, "doc_id", "text"))
    spark.stop()
  }
}
