package graft

import org.apache.spark.sql.SparkSession

/** Profiling scratch main (contents change per investigation). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // make ANY skew qualify so the question is purely structural:
      // does OptimizeSkewedJoin fire on the flag join's plan shape?
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet("/root/repo/tmp/sfmega/documents.parquet")
    val df = graft.operators.Dedup.crossDocSpans(docs, "doc_id", "text", 8)
    df.write.mode("overwrite").format("noop").save()
    // the noop write has its own QueryExecution; re-execute the df
    // itself so ITS adaptive plan finalizes
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    def c(tag: String) = s.linesIterator.count(_.contains(tag))
    println(s"[scratch] final=${s.contains("isFinalPlan=true")} " +
      s"skewMarks=${c("isSkew=true") + c("skewed=true")} " +
      s"aqeSkewRead=${c("AQEShuffleRead")} " +
      s"shj=${c("ShuffledHashJoin")}")
    s.linesIterator.filter(l => l.contains("ShuffledHashJoin") ||
      l.contains("AQEShuffleRead") || l.contains("Skew"))
      .foreach(l => println("[scratch] " + l.trim.take(160)))
    spark.stop()
  }
}
