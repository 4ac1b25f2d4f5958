package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Snapshot

/** Property checks for the corpus snapshot diff (D70). */
class SnapshotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("corpusDiff: all four statuses, null rows excluded, fingerprints on the present sides") {
    import spark.implicits._
    val old = Seq(
      (1L, "same"), (2L, "before edit"), (3L, "gone"),
      (5L, "also same")
    ).toDF("doc_id", "text")
      .unionByName(Seq((null.asInstanceOf[java.lang.Long], "null id"))
        .toDF("doc_id", "text"))
    val neu = Seq(
      (1L, "same"), (2L, "after edit"), (4L, "brand new"),
      (5L, "also same")
    ).toDF("doc_id", "text")
    val res = Snapshot.corpusDiff(old, neu, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("status"),
          r.getAs[String]("fp_old") != null,
          r.getAs[String]("fp_new") != null))).toMap
    assert(res.size == 5)
    assert(res(1L) == (("unchanged", true, true)))
    assert(res(2L) == (("changed", true, true)))
    assert(res(3L) == (("removed", true, false)))
    assert(res(4L) == (("added", false, true)))
    assert(res(5L) == (("unchanged", true, true)))
  }

  test("corpusDiffSummary rolls the statuses up") {
    import spark.implicits._
    val old = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val neu = Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("doc_id", "text")
    val sum = Snapshot.corpusDiffSummary(old, neu, "doc_id", "text")
      .collect().map(r => r.getAs[String]("status") ->
        r.getAs[Long]("n")).toMap
    assert(sum == Map("unchanged" -> 1L, "changed" -> 1L, "added" -> 1L))
  }

  test("vocabDrift: hand-computed counts, smoothing, drift order and the top-k cut") {
    import spark.implicits._
    // old: "a a b", "c"      → N_old = 4, counts a:2 b:1 c:1
    // new: "a b b", "c", "d" → N_new = 5, counts a:1 b:2 c:1 d:1
    // union vocab V = 4
    val old = Seq((1L, "a a b"), (2L, "c")).toDF("doc_id", "text")
    val neu = Seq((1L, "a b b"), (2L, "c"), (3L, "d")).toDF("doc_id", "text")
    val rows = Snapshot.vocabDrift(old, neu, "doc_id", "text", topK = 3)
      .collect()
    // drift_num = |c_new·4 − c_old·5|: a |4−10|=6, b |8−5|=3, d |4−0|=4,
    // c |4−5|=1 → top-3 order a, d, b (ties none)
    assert(rows.map(_.getAs[String]("t")).toSeq == Seq("a", "d", "b"))
    val byT = rows.map(r => r.getAs[String]("t") ->
      ((r.getAs[Long]("c_old"), r.getAs[Long]("c_new"),
        r.getAs[Double]("shift")))).toMap
    assert(byT("a")._1 == 2L && byT("a")._2 == 1L)
    assert(byT("d")._1 == 0L && byT("d")._2 == 1L)
    def sh(cn: Long, co: Long): Double =
      BigDecimal(math.log((cn + 1).toDouble / (5.0 + 4.0))
        - math.log((co + 1).toDouble / (4.0 + 4.0)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(byT("a")._3 == sh(1, 2))
    assert(byT("d")._3 == sh(1, 0))
  }
}
