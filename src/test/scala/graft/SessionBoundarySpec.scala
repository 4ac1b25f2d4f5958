package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the session-gap boundary rule on the exact-gap case the bulk
  * testdata happens not to contain. Empirical ground truth (test 1):
  * Spark's native session_window MERGES a pair exactly `gap` apart —
  * touching [t, t+gap) windows coalesce — and splits only a strictly
  * larger gap. The lag/cumsum batch form (c3 + both DuckDB oracles)
  * and the streaming sessionize operator must follow the same rule.
  */
class SessionBoundarySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val GapUs = 30L * 60 * 1000 * 1000

  /** (user, µs) events: u_edge is exactly gap apart (must merge),
    * u_over is gap + 1µs apart (must split). */
  private def events() = {
    import spark.implicits._
    val t0 = 1704067200000000L // 2024-01-01T00:00:00Z in µs
    Seq(
      ("u_edge", t0), ("u_edge", t0 + GapUs),
      ("u_over", t0), ("u_over", t0 + GapUs + 1)
    ).toDF("user_id", "us")
  }

  private val expected = Map("u_edge" -> 1L, "u_over" -> 2L)

  private def sessionCounts(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("native session_window merges an exact-gap pair, splits past it") {
    val got = sessionCounts(
      events()
        .select(col("user_id"), timestamp_micros(col("us")).as("tsu"))
        .groupBy(session_window(col("tsu"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)))
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_sessions")))
    assert(got == expected, got.toString)
  }

  test("lag/cumsum form (c3 / the DuckDB oracles) uses the same rule") {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("us"))
    val got = sessionCounts(
      events()
        .withColumn("new_session",
          when(col("us") - lag(col("us"), 1).over(byUser) > GapUs ||
            lag(col("us"), 1).over(byUser).isNull, lit(1)).otherwise(lit(0)))
        .groupBy(col("user_id"))
        .agg(sum(col("new_session")).as("n_sessions")))
    assert(got == expected, got.toString)
  }

  test("streaming sessionize uses the same rule on an exact-gap pair") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{StreamOps, StreamingIngest}
    import spark.implicits._
    val gapMs = 30L * 60 * 1000
    val t0 = 1704067200000L
    def ev(id: String, user: String, t: Long) =
      s"""{"id":"$id","type":"CLICK","realmid":"r","userid":"$user","time":$t,"detailsjson":"{}"}"""
    val input = MemoryStream[String](spark)
    val sessions = StreamOps.sessionize(spark,
      StreamingIngest.fromJsonLines(input.toDS()), gapMs = gapMs)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sb").start()
    try {
      input.addData(Seq(
        ev("e1", "u_edge", t0), ev("e2", "u_edge", t0 + gapMs),
        ev("o1", "u_over", t0), ev("o2", "u_over", t0 + gapMs + 1)))
      q.processAllAvailable()
      // push the watermark far past every gap so all sessions close
      input.addData(Seq(ev("z1", "u_z", t0 + 12 * 3600000L)))
      q.processAllAvailable()
      input.addData(Seq(ev("z2", "u_z", t0 + 13 * 3600000L)))
      q.processAllAvailable()
      val got = spark.table("sb").collect()
        .map(r => (r.getAs[String]("userid"), r.getAs[Int]("n_events")))
        .groupBy(_._1).view.mapValues(_.length.toLong).toMap
      assert(got.getOrElse("u_edge", 0L) == 1L, s"exact-gap pair must merge: $got")
      assert(got.getOrElse("u_over", 0L) == 2L, s"past-gap pair must split: $got")
    } finally q.stop()
  }
}
