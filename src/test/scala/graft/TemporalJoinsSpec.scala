package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TemporalJoins

/** Boundary exactness for the temporal joins (the oracle checks whole
  * distributions; these pin the edges). */
class TemporalJoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("asOfPrior: strictly prior, per key, ties broken by id") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      // (id, key, ts, type)
      (1L, "u1", 100L, "ref"),
      (2L, "u1", 100L, "probe"), // same ts as ref id 1 → ref is prior by tiebreak
      (3L, "u1", 200L, "probe"), // sees ref at 100
      (4L, "u2", 50L, "probe"),  // no ref for u2 → null
      (5L, "u1", 300L, "ref"),
      (6L, "u1", 300L, "probe")  // ref id 5 at same ts is prior by tiebreak
    ).toDF("id", "k", "ts", "typ")
    val got = TemporalJoins.asOfPrior(df, col("k"), col("ts"), col("id"),
      probeWhen = col("typ") === "probe", refWhen = col("typ") === "ref")
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[java.lang.Long]("asof_ts")).map(_.toLong)).toMap
    assert(got(2L).contains(100L), s"same-ts earlier-id ref counts: $got")
    assert(got(3L).contains(100L))
    assert(got(4L).isEmpty)
    assert(got(6L).contains(300L))
  }

  test("priorCountInWindow: [ts-W, ts) bounds are exact") {
    import spark.implicits._
    val W = 100L
    val right = Seq(
      (10L, "k", 100L), (11L, "k", 150L), (12L, "k", 199L),
      (13L, "k", 200L), // equal to probe ts → excluded
      (14L, "k", 99L),  // below ts-W (200-100=100; 99 < 100) → excluded
      (15L, "other", 150L) // different key → excluded
    ).toDF("event_id", "k", "us")
    val left = Seq((1L, "k", 200L)).toDF("event_id", "k", "us")
    val got = TemporalJoins.priorCountInWindow(left, right, "k", "us",
      "event_id", W).collect()
    assert(got.length == 1)
    // 100 (inclusive lower bound), 150, 199 count; 200, 99, other-key don't
    assert(got.head.getAs[Long]("n_prior") == 3L, got.mkString)
  }
}
