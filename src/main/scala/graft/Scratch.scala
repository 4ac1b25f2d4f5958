package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** End-to-end drive of the library surface, as a user would compose
  * it: JSON-lines stream → partitioned store → fluent query →
  * retention sweep. Scratch main, not part of the driver contract. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.api._
    import graft.model.EventAdapter
    import graft.sources.{EventStore, Tables}
    import graft.streaming._

    val store = java.nio.file.Files.createTempDirectory("e2e_store_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("e2e_ckpt_").toString

    // 1. stream reference-wire JSON lines into the dt/hour store
    val ke = EventAdapter.keycloakEvents(Tables.events(spark, "/root/testdata/sf0.001"))
    val lines = StreamingIngest.toJsonLines(ke).collect().toSeq
    val input = MemoryStream[String](spark)
    val sink = StreamingIngest.toPartitionedSink(
      StreamingIngest.fromJsonLines(input.toDS()), store, ckpt)
    input.addData(lines)
    sink.processAllAvailable()
    sink.stop()
    println(s"[e2e] landed=${spark.read.parquet(store).count()} of ${lines.size}")

    // 2. query the store through the fluent builder
    val q = EventQuery(EventStore.read(spark, store))
      .types("ERROR").realm("realm-1")
      .orderByAscTime.maxResults(5)
    val hits = q.results(spark).collect()
    println(s"[e2e] query hits=${hits.length} first=${hits.headOption.map(e => (e.id, e.eventtype, e.realmid, e.error))}")
    println("[e2e] plan: " + q.toDF.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PushedFilters")).getOrElse("NO PUSHDOWN"))

    // 3. retention: clear everything older than min+24h
    val minT = spark.read.parquet(store).agg(min(col("time"))).head.getLong(0)
    val cutoff = minT + 24 * 3600000L
    val before = spark.read.parquet(store).count()
    val dropped = EventStore.clearExpired(spark, store, cutoff)
    val after = spark.read.parquet(store).count()
    val oldest = spark.read.parquet(store).agg(min(col("time"))).head.getLong(0)
    println(s"[e2e] retention: before=$before after=$after droppedParts=$dropped oldestOk=${oldest >= cutoff}")
    spark.stop()
  }
}
