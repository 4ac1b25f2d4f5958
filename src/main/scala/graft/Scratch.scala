package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sorted-layout pruning comparison (scratch main). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.model.EventAdapter
    import graft.sources.{EventStore, Tables}

    val ke = EventAdapter.keycloakEvents(Tables.events(spark, "/root/testdata/sf0.01"))
    val total = ke.count()

    def scannedRows(dir: String): Long = {
      val q = EventStore.read(spark, dir).filter(col("userid") === "user-7")
      q.collect()
      q.queryExecution.executedPlan.collectLeaves()
        .map(_.metrics.get("numOutputRows").map(_.value).getOrElse(0L)).sum
    }

    val plain = java.nio.file.Files.createTempDirectory("plain_").toString
    EventStore.write(ke, plain, maxRecordsPerFile = 50)
    val sorted = java.nio.file.Files.createTempDirectory("sorted_").toString
    EventStore.write(ke, sorted, maxRecordsPerFile = 50, sortWithin = Seq("userid"))

    println(s"[e2e] total=$total plainScan=${scannedRows(plain)} sortedScan=${scannedRows(sorted)}")
    val a = EventStore.read(spark, plain).filter(col("userid") === "user-7").count()
    val b = EventStore.read(spark, sorted).filter(col("userid") === "user-7").count()
    println(s"[e2e] results equal: ${a == b} (n=$a)")
    spark.stop()
  }
}
