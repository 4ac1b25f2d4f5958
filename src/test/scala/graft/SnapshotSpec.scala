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
}
