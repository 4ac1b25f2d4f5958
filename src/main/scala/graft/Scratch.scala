package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Sample-code drive: bucketed co-located join + compaction of a
  * streaming-written store (scratch main). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("wh_").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.model.EventAdapter
    import graft.sources.{Bucketing, EventStore, Tables}
    import graft.streaming.StreamingIngest

    // 1. bucketed join: zero exchange below the aggregate
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    Bucketing.writeBucketed(Tables.lineitem(spark, "/root/testdata/sf0.001"),
      "li_b", "l_orderkey", 4)
    Bucketing.writeBucketed(Tables.orders(spark, "/root/testdata/sf0.001"),
      "ord_b", "o_orderkey", 4)
    val j = Bucketing.read(spark, "li_b")
      .join(Bucketing.read(spark, "ord_b"), col("l_orderkey") === col("o_orderkey"))
      .agg(round(sum(col("l_quantity")), 2).as("q"))
    val plan = j.queryExecution.executedPlan.toString
    val exch = plan.linesIterator.count(_.contains("Exchange"))
    println(s"[e2e] bucketed join: exchanges=$exch (1 = only final agg) " +
      s"bucketedScan=${plan.contains("Bucketed: true")} q=${j.head.getDouble(0)}")
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    // 2. compact a STREAMING-written store (carries _spark_metadata)
    val out = java.nio.file.Files.createTempDirectory("cstore_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cckpt_").toString
    val ke = EventAdapter.keycloakEvents(Tables.events(spark, "/root/testdata/sf0.001"))
    val lines = StreamingIngest.toJsonLines(ke).collect().toSeq
    val input = MemoryStream[String](spark)
    val q = StreamingIngest.toPartitionedSink(
      StreamingIngest.fromJsonLines(input.toDS()), out, ckpt)
    // several micro-batches → several files per partition
    lines.grouped(300).foreach { g => input.addData(g); q.processAllAvailable() }
    q.stop()
    val before = spark.read.parquet(out).count()
    val n = EventStore.compact(spark, out, maxFilesPerPartition = 1)
    val after = spark.read.parquet(out).count()
    println(s"[e2e] compact streaming store: partitions=$n before=$before after=$after")

    // 3. probe: compact of a missing path is a clean no-op
    println(s"[e2e] compact missing path: ${EventStore.compact(spark, "/tmp/does_not_exist_graft")}")
    spark.stop()
  }
}
