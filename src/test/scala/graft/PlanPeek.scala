package graft
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    for (n <- args) {
      val p = SparkEntry.queries(n)(spark, TestSpark.sf)
        .queryExecution.executedPlan.toString
      println(s"===== $n =====")
      println(p.linesIterator.map(_.take(140)).mkString("\n"))
    }
    spark.stop()
  }
}
