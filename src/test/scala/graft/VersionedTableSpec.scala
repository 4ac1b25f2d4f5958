package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Bucketing, VersionedTable}

/** Reader-vs-writer consistency — the one operational window the
  * lease (writers only, by design) does not cover: a reader racing a
  * compact/retire swap. [[VersionedTable]] closes it with immutable
  * generations behind an atomic pointer; [[Bucketing.stableTable]]
  * closes the legacy swap path's catalog-resolve window. */
class VersionedTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(n: Int): DataFrame = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"doc number $i"))
      .toDF("doc_id", "text")
  }

  test("a reader pinned to the PREVIOUS generation survives a rewrite") {
    val v1 = VersionedTable.publishBucketed(docs(8), "vt_a", "doc_id", 2)
    assert(v1 == 1L)
    // the reader resolves BEFORE the maintenance rewrite…
    val pinned = VersionedTable.read(spark, "vt_a")
    assert(pinned.count() == 8L)
    // …the writer rewrites (a retention sweep dropping half)…
    val v2 = VersionedTable.rewriteBucketed(spark, "vt_a",
      _.filter("doc_id <= 4"), "doc_id", 2)
    assert(v2 == 2L)
    // …and the pinned reader STILL scans its own untouched snapshot
    // to completion, while a new reader sees the new generation —
    // no instant at which either observes a missing table
    assert(pinned.count() == 8L)
    assert(VersionedTable.read(spark, "vt_a").count() == 4L)
  }

  test("generations retire one rewrite later — the disclosed reader window") {
    VersionedTable.publishBucketed(docs(6), "vt_b", "doc_id", 2)
    VersionedTable.rewriteBucketed(spark, "vt_b",
      _.filter("doc_id <= 5"), "doc_id", 2) // v2; v1 kept
    assert(spark.catalog.tableExists(
      VersionedTable.physicalName("vt_b", 1L)))
    VersionedTable.rewriteBucketed(spark, "vt_b",
      _.filter("doc_id <= 4"), "doc_id", 2) // v3; retires v1, keeps v2
    assert(!spark.catalog.tableExists(
      VersionedTable.physicalName("vt_b", 1L)))
    assert(spark.catalog.tableExists(
      VersionedTable.physicalName("vt_b", 2L)))
    assert(VersionedTable.currentVersion(spark, "vt_b").contains(3L))
    assert(VersionedTable.read(spark, "vt_b").count() == 4L)
    // explicit time travel: the kept previous generation reads by
    // number; the retired one fails loudly naming the live version
    assert(VersionedTable.readVersion(spark, "vt_b", 2L).count() == 5L)
    val e = intercept[IllegalArgumentException] {
      VersionedTable.readVersion(spark, "vt_b", 1L)
    }
    assert(e.getMessage.contains("retired") &&
      e.getMessage.contains("3"))
  }

  test("keepGenerations widens the reader grace window") {
    VersionedTable.publishBucketed(docs(6), "vt_g", "doc_id", 2)
    VersionedTable.rewriteBucketed(spark, "vt_g",
      _.filter("doc_id <= 5"), "doc_id", 2, keepGenerations = 2)
    VersionedTable.rewriteBucketed(spark, "vt_g",
      _.filter("doc_id <= 4"), "doc_id", 2, keepGenerations = 2)
    // v3 live; v1 AND v2 both still scannable under the wider grace
    assert(VersionedTable.readVersion(spark, "vt_g", 1L).count() == 6L)
    assert(VersionedTable.readVersion(spark, "vt_g", 2L).count() == 5L)
    // a narrower rewrite retires back down to one kept generation
    VersionedTable.rewriteBucketed(spark, "vt_g",
      _.filter("doc_id <= 3"), "doc_id", 2)
    assert(!spark.catalog.tableExists(
      VersionedTable.physicalName("vt_g", 2L)))
    assert(VersionedTable.readVersion(spark, "vt_g", 3L).count() == 4L)
    intercept[IllegalArgumentException] {
      VersionedTable.rewriteBucketed(spark, "vt_g", identity,
        "doc_id", 2, keepGenerations = 0)
    }
  }

  test("retireBelow walks O(generations retired), not O(all history)") {
    VersionedTable.publishBucketed(docs(4), "vt_f", "doc_id", 2)
    (1 to 5).foreach { _ =>
      VersionedTable.rewriteBucketed(spark, "vt_f", identity, "doc_id", 2)
    }
    // live v6, floor advanced to 5 by the per-rewrite retirements —
    // a further retire probes exactly the one generation below the
    // live one (the pre-fix walk would have re-probed 1..5)
    assert(VersionedTable.retireBelow(spark, "vt_f", 6L) == 1)
    // and a repeat probes NOTHING — the floor marker remembers
    assert(VersionedTable.retireBelow(spark, "vt_f", 6L) == 0)
    assert(VersionedTable.read(spark, "vt_f").count() == 4L)
  }

  test("publishBucketed retires like rewrite — refresh loops don't leak") {
    VersionedTable.publishBucketed(docs(3), "vt_p", "doc_id", 2)
    VersionedTable.publishBucketed(docs(4), "vt_p", "doc_id", 2)
    VersionedTable.publishBucketed(docs(5), "vt_p", "doc_id", 2)
    // v3 live, v2 kept for pinned readers, v1 retired
    assert(!spark.catalog.tableExists(
      VersionedTable.physicalName("vt_p", 1L)))
    assert(spark.catalog.tableExists(
      VersionedTable.physicalName("vt_p", 2L)))
    assert(VersionedTable.read(spark, "vt_p").count() == 5L)
  }

  test("cross-session time travel keeps the bucket layout (zero-Exchange agg)") {
    import org.apache.spark.sql.functions._
    VersionedTable.publishBucketed(docs(8), "vt_tt", "doc_id", 2)
    VersionedTable.rewriteBucketed(spark, "vt_tt",
      _.filter("doc_id <= 4"), "doc_id", 2) // v2 live, v1 kept
    val s2 = {
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      org.apache.spark.sql.SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.warehouse.dir",
          spark.conf.get("spark.sql.warehouse.dir"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    }
    try {
      assert(!s2.catalog.tableExists(
        VersionedTable.physicalName("vt_tt", 1L)),
        "restart simulation failed: catalog still knows the generation")
      val prevAqe = s2.conf.get("spark.sql.adaptive.enabled")
      s2.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        // the bucketSpec passes through registerExisting, so the
        // re-registered generation still satisfies the clustering its
        // layout paid for — a per-key agg plans ZERO Exchange (the
        // pre-fix re-register as unbucketed planned one)
        val pinned = VersionedTable.readVersion(s2, "vt_tt", 1L,
          bucketSpec = Some(("doc_id", 2)))
        val agg = pinned.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        val plan = agg.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"time-travel read lost the bucket spec:\n$plan")
        assert(agg.count() == 8L)
      } finally s2.conf.set("spark.sql.adaptive.enabled", prevAqe)
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(spark)
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }

  test("a crash between pointer create and sweep still resolves to max") {
    VersionedTable.publishBucketed(docs(3), "vt_c", "doc_id", 2)
    VersionedTable.rewriteBucketed(spark, "vt_c", identity, "doc_id", 2)
    // simulate the crash window: the OLD pointer resurfaces beside
    // the new one (publish died between create and sweep)
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(wh, "vt_c__ptr_v1"),
      true).close()
    assert(VersionedTable.currentVersion(spark, "vt_c").contains(2L),
      "two pointers on disk must resolve to the max generation")
    // the next publish sweeps the straggler
    VersionedTable.rewriteBucketed(spark, "vt_c", identity, "doc_id", 2)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(wh, "vt_c__ptr_v1")))
    assert(VersionedTable.currentVersion(spark, "vt_c").contains(3L))
  }

  test("resolve before any publish fails loudly") {
    val e = intercept[IllegalStateException] {
      VersionedTable.resolve(spark, "vt_never_published")
    }
    assert(e.getMessage.contains("no published version"))
  }

  test("stableTable waits out a swap window instead of failing the reader") {
    import org.apache.spark.sql.functions.col
    Bucketing.writeTable(docs(5), "vt_swap")
    // simulate the middle of compactBucketed's drop→rename: marker
    // up, table momentarily absent from the catalog
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mk = new org.apache.hadoop.fs.Path(wh, "vt_swap__swap_pending")
    fs.create(mk, true).close()
    spark.sql("DROP TABLE `vt_swap`")
    @volatile var writerErr: Option[Throwable] = None
    val writer = new Thread(() => {
      try {
        Thread.sleep(400L)
        // raw saveAsTable, NOT writeTable — writeTable's dropStale
        // would delete the marker BEFORE the slow write, reopening the
        // very window the marker exists to describe
        docs(5).filter(col("doc_id") <= 3).write.format("parquet")
          .saveAsTable("vt_swap")
        fs.delete(mk, false)
      } catch { case e: Throwable => writerErr = Some(e) }
    })
    writer.start()
    // the reader arrives inside the window: plain spark.table would
    // throw TABLE_OR_VIEW_NOT_FOUND; stableTable waits for the rename.
    // Generous deadline: in a full-suite JVM late-run GC can stretch
    // the writer's saveAsTable well past interactive timings
    val seen = Bucketing.stableTable(spark, "vt_swap",
      maxWaitMs = 120000L).count()
    writer.join(120000L)
    assert(writerErr.isEmpty, s"writer thread failed: $writerErr")
    assert(seen == 3L)
    // and with NO swap in flight, a missing table still fails fast
    intercept[org.apache.spark.sql.AnalysisException] {
      Bucketing.stableTable(spark, "vt_absent")
    }
  }
}
