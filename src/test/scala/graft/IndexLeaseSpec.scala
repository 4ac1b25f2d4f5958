package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retrieval
import graft.sources.Bucketing

/** The single-writer lease on index lifecycle verbs: every verb is
  * crash-safe alone, but two sessions interleaving verbs on one
  * index could interleave stage/marker states SILENTLY (a streaming
  * append racing a reband is the realistic 100 TB window). The lease
  * turns that into a loud failure, steals from dead holders after a
  * stale window, and stays re-entrant for verbs that nest verbs. */
class IndexLeaseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs: DataFrame = {
    import spark.implicits._
    Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"),
      (3L, "eta theta iota")).toDF("doc_id", "text")
  }

  private def leasePath(name: String) =
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), s"${name}__lease")

  private def fs = leasePath("x")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("a live foreign lease makes a verb fail loudly; release clears it") {
    Retrieval.buildBm25Index(docs, "doc_id", "text", "lease_a",
      numBuckets = 2)
    assert(!fs.exists(leasePath("lease_a")),
      "verb must release its lease on completion")
    // simulate ANOTHER SESSION's in-flight verb: a fresh lease file
    // (thread-local re-entrancy can't see it — exactly like a second
    // JVM's lease)
    val p = leasePath("lease_a")
    val out = fs.create(p, false)
    out.write("rebandDedupIndex".getBytes("UTF-8")); out.close()
    val e = intercept[IllegalStateException] {
      Retrieval.appendToBm25Index(docs.limit(1), "doc_id", "text",
        "lease_a")
    }
    assert(e.getMessage.contains("locked") &&
      e.getMessage.contains("rebandDedupIndex"))
    fs.delete(p, false)
  }

  test("a stale lease (dead holder) is stolen and the verb proceeds") {
    import spark.implicits._
    Retrieval.buildBm25Index(docs, "doc_id", "text", "lease_b",
      numBuckets = 2)
    val p = leasePath("lease_b")
    val out = fs.create(p, false)
    out.write("compactBm25Index".getBytes("UTF-8")); out.close()
    // age the lease past the stale window
    fs.setTimes(p, System.currentTimeMillis() -
      Bucketing.DefaultLeaseStaleMs - 60000L, -1L)
    Retrieval.appendToBm25Index(
      Seq((9L, "kappa lambda")).toDF("doc_id", "text"),
      "doc_id", "text", "lease_b")
    assert(!fs.exists(p), "stolen lease must be released after the verb")
    assert(spark.table("lease_b_docs").count() == 4L)
  }

  test("nested verbs are re-entrant under one lease; a crashing verb still releases") {
    // reconcile nests appendToBm25Index and repairBm25Stats — all
    // three are lease-wrapped, and the composition must hold ONE
    // lease (a non-re-entrant lease would deadlock itself)
    Retrieval.buildBm25Index(docs.filter("doc_id <= 2"), "doc_id",
      "text", "lease_c", numBuckets = 2)
    assert(Retrieval.reconcileBm25Index(docs, "doc_id", "text",
      "lease_c") == 1L)
    assert(!fs.exists(leasePath("lease_c")))
    // a verb that THROWS must still release (finally path)
    intercept[Exception] {
      Retrieval.appendToBm25Index(docs, "doc_id", "text",
        "lease_missing_index")
    }
    assert(!fs.exists(leasePath("lease_missing_index")))
  }

  test("heartbeat keeps a SLOW verb's lease fresh — slow is not stolen") {
    // the 100 TB hole the heartbeat closes: a verb legitimately
    // longer than the stale window must not read as crashed — a
    // second writer arriving after staleMs has elapsed since ACQUIRE
    // must still refuse, because the heartbeat kept the mtime fresh
    val name = "lease_hb"
    Bucketing.withIndexLease(spark, name, "slowVerb", staleMs = 400L) {
      Thread.sleep(1200L) // three stale windows; heartbeat every ~133ms
      @volatile var res: Option[Throwable] = None
      val t = new Thread(() => {
        res =
          try {
            Bucketing.withIndexLease(spark, name, "intruder",
              staleMs = 400L) { () }
            None
          } catch { case e: Throwable => Some(e) }
      })
      t.start(); t.join()
      assert(res.exists(_.isInstanceOf[IllegalStateException]),
        "a live (heartbeating) lease must refuse a second writer " +
          "even past the stale window")
      assert(res.exists(_.getMessage.contains("slowVerb")))
    }
    assert(!fs.exists(leasePath(name)))
  }

  test("a stolen lease is never released by the old holder (token fence)") {
    val name = "lease_fence"
    val p = leasePath(name)
    Bucketing.withIndexLease(spark, name, "victim", staleMs = 60000L) {
      // simulate a steal (clock-skewed second writer): the lease file
      // now carries the NEW holder's verb + token
      fs.delete(p, false)
      val out = fs.create(p, false)
      out.write("thief\nother-token".getBytes("UTF-8")); out.close()
    }
    assert(fs.exists(p),
      "the old holder's finally must not delete a lease it no longer " +
        "owns — that would open the index to a third writer")
    assert(Bucketing.leaseHolder(spark, name).contains("thief"))
    fs.delete(p, false)
  }
}
