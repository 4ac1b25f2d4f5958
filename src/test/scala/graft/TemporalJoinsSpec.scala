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

  test("asOfJoin: two-table front door matches the tagged-union core") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val probe = Seq(
      (2L, "u1", 100L, "p-a"), (3L, "u1", 200L, "p-b"),
      (4L, "u2", 50L, "p-c"), (6L, "u1", 300L, "p-d")
    ).toDF("id", "k", "ts", "payload")
    val ref = Seq(
      (1L, "u1", 100L), (5L, "u1", 300L), (9L, "u3", 10L)
    ).toDF("id", "k", "ts")
    val got = TemporalJoins.asOfJoin(probe, ref, "k", "ts", "id")
      .collect()
      .map(r => r.getAs[Long]("id") ->
        Option(r.getAs[java.lang.Long]("asof_ts")).map(_.toLong)).toMap
    assert(got(2L).contains(100L)) // same-ts ref with smaller id is prior
    assert(got(3L).contains(100L))
    assert(got(4L).isEmpty)        // no ref for u2
    assert(got(6L).contains(300L)) // ref id 5 at same ts is prior
    // probe payload columns survive
    val cols = TemporalJoins.asOfJoin(probe, ref, "k", "ts", "id").columns.toSeq
    assert(cols == Seq("id", "k", "ts", "payload", "asof_ts"))
  }

  test("asOfPriorSalted equals the classic window on edges and on a zipf-head key") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // edge corpus: same-ts ties, bucket-boundary timestamps, a key
    // with no refs, negative timestamps — each at several bucketUs
    // values including ones that split ties across bucket edges
    val edge = Seq(
      (1L, "u1", 100L, "ref"), (2L, "u1", 100L, "probe"),
      (3L, "u1", 200L, "probe"), (4L, "u2", 50L, "probe"),
      (5L, "u1", 300L, "ref"), (6L, "u1", 300L, "probe"),
      (7L, "u1", -150L, "ref"), (8L, "u1", -150L, "probe"),
      (9L, "u3", 0L, "probe"), (10L, "u3", -1L, "ref")
    ).toDF("id", "k", "ts", "typ")
    // zipf-head corpus: one key carries 2000 rows, others 10 each
    val rnd = new scala.util.Random(11)
    val zipf = ((0 until 2000).map(i =>
      (i.toLong, "head", rnd.nextInt(5000).toLong,
        if (rnd.nextBoolean()) "ref" else "probe")) ++
      (0 until 100).map(i =>
        (10000L + i, s"t${i % 10}", rnd.nextInt(500).toLong,
          if (i % 3 == 0) "ref" else "probe")))
      .toDF("id", "k", "ts", "typ")
    for (df <- Seq(edge, zipf); bucketUs <- Seq(1L, 7L, 100L, 1000L)) {
      def read(r: org.apache.spark.sql.Row) =
        r.getAs[Long]("id") ->
          Option(r.getAs[java.lang.Long]("asof_ts")).map(_.toLong)
      val classic = TemporalJoins.asOfPrior(df, col("k"), col("ts"),
        col("id"), col("typ") === "probe", col("typ") === "ref")
        .collect().map(read).toMap
      val salted = TemporalJoins.asOfPriorSalted(df, col("k"), col("ts"),
        col("id"), col("typ") === "probe", col("typ") === "ref", bucketUs)
        .collect().map(read).toMap
      assert(salted == classic,
        s"bucketUs=$bucketUs diverged: ${
          (salted.toSet diff classic.toSet).take(5)} vs ${
          (classic.toSet diff salted.toSet).take(5)}")
    }
    // the front door flag routes to the same answers
    val probe = Seq((2L, "u1", 100L, "p"), (6L, "u1", 300L, "p"))
      .toDF("id", "k", "ts", "payload")
    val ref = Seq((1L, "u1", 100L), (5L, "u1", 300L)).toDF("id", "k", "ts")
    val a = TemporalJoins.asOfJoin(probe, ref, "k", "ts", "id")
      .orderBy("id").collect().toSeq
    val b = TemporalJoins.asOfJoin(probe, ref, "k", "ts", "id",
      bucketUs = 60L).orderBy("id").collect().toSeq
    assert(a == b, s"front-door flag diverged: $a vs $b")
  }

  test("priorCountInWindow: negative timestamps bucket by floor division") {
    import spark.implicits._
    val W = 100L
    // probes and refs straddling zero; expected counts computed naively
    val rights = Seq(-250L, -199L, -105L, -100L, -50L, -1L, 0L, 40L, 99L, 150L)
    val lefts = Seq(-150L, -99L, -1L, 0L, 5L, 120L)
    val right = rights.zipWithIndex
      .map { case (ts, i) => (100L + i, "k", ts) }.toDF("event_id", "k", "us")
    val left = lefts.zipWithIndex
      .map { case (ts, i) => (i.toLong, "k", ts) }.toDF("event_id", "k", "us")
    val expected = lefts.zipWithIndex.map { case (lts, i) =>
      i.toLong -> rights.count(r => r >= lts - W && r < lts).toLong
    }.toMap
    val got = TemporalJoins.priorCountInWindow(left, right, "k", "us",
      "event_id", W).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("n_prior")).toMap
    assert(got == expected, s"got $got expected $expected")
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
