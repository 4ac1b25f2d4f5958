package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Profiling scratch main (contents change per investigation).
  * Current: does AQE lose the d94 ReuseExchange? Full production
  * lineDedup with AQE on vs off on the mega corpus. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    val w = 8
    val ws = split(trim(col("text")), "\\s+")
    val nl = ceil(size(ws) / lit(w.toDouble)).cast("int")
    val docs = spark.read.parquet("/root/repo/tmp/sfmega/documents.parquet")
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"),
        array_join(transform(sequence(lit(1), nl), i =>
          array_join(slice(ws, (i - 1) * lit(w) + 1, lit(w)), " ")), "\n")
          .as("text"))

    def time(label: String)(mk: () => DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      println(f"$label%-28s ${once()}%7.2f s")
    }

    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val df1 = Dedup.lineDedup(docs, "doc_id", "text")
    time("full prod AQE on")(() => Dedup.lineDedup(docs, "doc_id", "text"))
    df1.write.mode("overwrite").format("noop").save()
    val ep = df1.queryExecution.executedPlan.toString
    println("AQE-on executed plan ReusedExchange lines: " +
      ep.linesIterator.count(_.contains("ReusedExchange")))
    println("AQE-on executed plan Generate lines: " +
      ep.linesIterator.count(_.contains("Generate")))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("full prod AQE off")(() => Dedup.lineDedup(docs, "doc_id", "text"))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
