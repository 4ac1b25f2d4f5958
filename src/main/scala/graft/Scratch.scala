package graft

import org.apache.spark.sql.SparkSession

/** Profiling scratch main (contents change per investigation). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Does the reused gram exchange actually fire at runtime under
    // AQE for the de-skewed d33/d36/d37/d38 shapes? Execute, then
    // inspect the FINAL adaptive plan for reused stages.
    for (name <- Seq("d33_unigram_logprob", "d36_substring_dedup",
        "d37_gram_profile", "d38_span_cut")) {
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
      df.collect()
      val s = df.queryExecution.executedPlan.toString
      def c(tag: String) = s.linesIterator.count(_.contains(tag))
      println(s"[scratch] $name final=${s.contains("isFinalPlan=true")} " +
        s"reusedExchange=${c("ReusedExchange")} " +
        s"shuffleStages=${c("ShuffleQueryStage")} " +
        s"exchanges=${c("Exchange") - c("ReusedExchange")} " +
        s"generates=${c("Generate")} windows=${c("Window")} " +
        s"sortAgg=${c("SortAggregate")}")
    }
    spark.stop()
  }
}
