package graft

import org.apache.spark.sql.SparkSession

/** Prints a compact plan audit for every registered query: pushdown
  * reaching the scan, read-schema width, join strategies, and shuffle
  * (Exchange) counts. Driver-side only — nothing executes. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val detail = args.drop(1)
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        val s = plan.toString
        def count(tag: String) = s.linesIterator.count(_.contains(tag))
        val pushed = s.linesIterator.filter(_.contains("PushedFilters: ["))
          .count(l => !l.contains("PushedFilters: []"))
        val scans = count("FileScan")
        val shuffles = count("Exchange")
        val bcast = count("BroadcastExchange")
        val smj = count("SortMergeJoin")
        val bhj = count("BroadcastHashJoin")
        // codegen'd operators print with a "*(stageId)" prefix
        val codegen = s.linesIterator.count(_.trim.matches("^[+:-]*\\s*\\*\\(\\d+\\).*"))
        println(f"$name%-24s scans=$scans pushed=$pushed shuffle=${shuffles - bcast} bcast=$bcast bhj=$bhj smj=$smj wsc=$codegen")
        if (detail.contains(name)) println(s)
      } catch {
        case e: Throwable => println(f"$name%-24s PLAN FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
