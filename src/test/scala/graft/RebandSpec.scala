package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** The dedup-index RE-BAND verb: changing the LSH geometry of an
  * existing index from its own stored state must be
  * indistinguishable from a fresh build at the new parameters —
  * band rows, meta, and the resulting screen all bit-equal — and a
  * death anywhere inside the two-table promotion must recover. */
class RebandSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Corpus with planted near-dup structure: docs 1-6 the corpus,
    * 101-106 an arriving batch (101 exact dup of 1, 102 near-dup of
    * 2 with one word changed, 103-106 novel). */
  private def corpus: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog every day"),
      (2L, "spark shuffles are the dominant cost of large joins"),
      (3L, "minhash signatures estimate jaccard similarity cheaply"),
      (4L, "bucketed layouts avoid the exchange under the join"),
      (5L, "watermarks bound state in streaming aggregations"),
      (6L, "predicate pushdown reaches the parquet scan")
    ).toDF("doc_id", "text")
  }

  private def batch: DataFrame = {
    import spark.implicits._
    Seq(
      (101L, "the quick brown fox jumps over the lazy dog every day"),
      (102L, "spark shuffles are the dominant cost of big joins"),
      (103L, "an entirely novel document about nothing at all"),
      (104L, "codegen keeps expressions inside the tungsten pipeline"),
      (105L, "minhash signatures estimate jaccard similarity cheaply today"),
      (106L, "completely fresh content with no corpus overlap")
    ).toDF("doc_id", "text")
  }

  private def survivors(name: String): Seq[Long] =
    Dedup.dedupAgainstIndex(batch, "doc_id", "text", name)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

  private def bandRows(table: String): Set[(Long, Int, Int, Long)] =
    spark.table(table).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSet

  test("rebanded index equals a fresh build at the new geometry, bit for bit") {
    Dedup.buildDedupIndex(corpus, "doc_id", "text", name = "t_reband_a",
      numPerms = 32, bands = 16, md5Sig = true, numBuckets = 4)
    Dedup.rebandDedupIndex(spark, "t_reband_a", bands = 8, numPerms = 32)
    Dedup.buildDedupIndex(corpus, "doc_id", "text", name = "t_reband_b",
      numPerms = 32, bands = 8, md5Sig = true, numBuckets = 4)
    assert(bandRows("t_reband_a_bands") == bandRows("t_reband_b_bands"),
      "rebanded band rows must equal a fresh build's at the new geometry")
    val metaA = spark.table("t_reband_a_meta").head()
    assert(metaA.getAs[Int]("bands") == 8 &&
      metaA.getAs[Int]("num_perms") == 32)
    assert(survivors("t_reband_a") == survivors("t_reband_b"))
    // the screen still works: the exact dup (101) is always caught
    assert(!survivors("t_reband_a").contains(101L))
    // appends after the reband encode at the NEW geometry (params are
    // read from the promoted meta): appending to both indexes keeps
    // them identical
    import spark.implicits._
    val extra = Seq((7L, "one more corpus document arrives later on"))
      .toDF("doc_id", "text")
    Dedup.appendToDedupIndex(extra, "doc_id", "text", "t_reband_a")
    Dedup.appendToDedupIndex(extra, "doc_id", "text", "t_reband_b")
    assert(bandRows("t_reband_a_bands") == bandRows("t_reband_b_bands"))
  }

  test("rebandSweep: per-geometry candidate census from the index alone, exact against a manual recount") {
    import spark.implicits._
    // corpus + one exact twin: every geometry must count its pair
    val twin = corpus.unionByName(
      Seq((7L, "the quick brown fox jumps over the lazy dog every day"))
        .toDF("doc_id", "text"))
    Dedup.buildDedupIndex(twin, "doc_id", "text", name = "t_sweep_idx",
      numPerms = 32, bands = 16, md5Sig = true, numBuckets = 4)
    val rows = Dedup.rebandSweep(spark, "t_sweep_idx",
      bandsChoices = Seq(16, 8))
      .collect().map(r => r.getAs[Int]("bands") ->
        ((r.getAs[Int]("rows_per_band"), r.getAs[Long]("n_buckets"),
          r.getAs[Long]("candidate_pairs"),
          r.getAs[Long]("max_band_occ")))).toMap
    assert(rows.keySet == Set(16, 8))
    assert(rows(16)._1 == 2 && rows(8)._1 == 4)
    // manual recount of the 8×4 geometry from the same stored sets
    val sig = spark.table("t_sweep_idx_docs")
      .select(col("doc_id"),
        graft.functions.SketchFunctions.md5Minhash30FromHashes(
          col("shh"), 32).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
    val buckets = sig.flatMap { case (_, s) =>
      (0 until 8).map(b => (b, s.slice(b * 4, b * 4 + 4).toList)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rows(8)._2 == buckets.size)
    assert(rows(8)._3 == buckets.values.map(n => n * (n - 1) / 2).sum)
    assert(rows(8)._4 == buckets.values.max)
    // the exact twin (identical signature) pairs in every geometry
    assert(rows(16)._3 >= 1 && rows(8)._3 >= 1)
    // looser geometry (r=2) can only see MORE candidates than r=4
    assert(rows(16)._3 >= rows(8)._3)
  }

  test("rechunkSimIndex: geometry change from stored sigs equals a fresh build; video side follows; crash windows recover") {
    import spark.implicits._
    val S = 0x0123456789ABCDEFL
    val sigs = Seq((1L, S), (2L, S ^ 0xF0L)).toDF("doc_id", "sim")
    val batch = Seq(
      (101L, S ^ 1L),           // hamming 1: screened at either geometry
      (102L, S ^ 3L),           // hamming 2: screened only at maxDist 2
      (103L, S ^ 7L))           // hamming 3: survives both
      .toDF("doc_id", "sim")
    def survivors(name: String): Set[Long] =
      Dedup.screenAgainstSimIndex(batch, name)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    def chunks(table: String): Set[(Long, Long, Long)] =
      spark.table(table).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    Dedup.buildSimIndex(sigs, "t_rechunk_a", maxDist = 1, numBuckets = 2)
    // the video-frame side follows the geometry: stage some frames
    val frames = Seq((7L, 0, S), (7L, 1, S ^ 0x10L))
      .toDF("doc_id", "frame_idx", "sim")
    Dedup.appendVideoFramesToSimIndex(frames, "t_rechunk_a")
    assert(survivors("t_rechunk_a") == Set(102L, 103L))
    Dedup.rechunkSimIndex(spark, "t_rechunk_a", maxDist = 2)
    assert(survivors("t_rechunk_a") == Set(103L))
    // bit-equal to a fresh build + append at the new geometry
    Dedup.buildSimIndex(sigs, "t_rechunk_b", maxDist = 2, numBuckets = 2)
    Dedup.appendVideoFramesToSimIndex(frames, "t_rechunk_b")
    assert(chunks("t_rechunk_a_chunks") == chunks("t_rechunk_b_chunks"))
    assert(chunks("t_rechunk_a_vchunks") == chunks("t_rechunk_b_vchunks"))
    assert(spark.table("t_rechunk_a_meta").head().getAs[Int]("max_dist") == 2)

    // crash window 1: pre-marker stage drops, live untouched
    graft.sources.Bucketing.writeTable(
      Seq((9, 2)).toDF("max_dist", "num_buckets"),
      "t_rechunk_a_meta_stage")
    Dedup.rechunkSimIndex(spark, "t_rechunk_a", maxDist = 1)
    assert(!spark.catalog.tableExists("t_rechunk_a_meta_stage"))
    assert(spark.table("t_rechunk_a_meta").head().getAs[Int]("max_dist") == 1)

    // crash window 2: post-marker roll-forward across a restart —
    // stage the 2-geometry (the fresh index b's state), set the
    // marker, and let a fresh session's open() promote it
    graft.sources.Bucketing.writeBucketed(
      spark.table("t_rechunk_b_chunks"), "t_rechunk_a_chunks_stage",
      "chunk_hash", 2)
    graft.sources.Bucketing.writeTable(
      spark.table("t_rechunk_b_meta"), "t_rechunk_a_meta_stage")
    graft.sources.Bucketing.createMarker(spark,
      "t_rechunk_a__rechunk_pending")
    val old = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir",
        old.conf.get("spark.sql.warehouse.dir"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      Dedup.openSimIndex(s2, "t_rechunk_a")
      assert(!graft.sources.Bucketing.markerExists(s2,
        "t_rechunk_a__rechunk_pending"))
      assert(s2.table("t_rechunk_a_meta").head().getAs[Int]("max_dist") == 2,
        "staged meta must have been promoted")
      val promoted = s2.table("t_rechunk_a_chunks").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      graft.sources.Bucketing.registerExisting(s2, "t_rechunk_b_chunks",
        Some(("chunk_hash", 2)))
      val staged = s2.table("t_rechunk_b_chunks").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(promoted == staged)
    } finally {
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      org.apache.spark.sql.SparkSession.setDefaultSession(old)
      org.apache.spark.sql.SparkSession.setActiveSession(old)
    }
  }

  test("shh_basis format guard: a pre-basis md5Sig index refuses loudly; a basis-less xx64 index still opens") {
    import spark.implicits._
    // forge the OLD meta format (no shh_basis column) over a real
    // md5Sig index: this is exactly what a pre-upgrade index looks
    // like on disk — its _docs sets were stored under xxhash64, which
    // this version's md5Hash60 batch hashing cannot screen against
    Dedup.buildDedupIndex(corpus, "doc_id", "text", "basis_old",
      shingleK = 3, numPerms = 16, bands = 8, md5Sig = true,
      numBuckets = 4)
    graft.sources.Bucketing.writeTable(
      Seq((3, 16, 8, true, 4))
        .toDF("shingle_k", "num_perms", "bands", "md5_sig",
          "num_buckets"),
      "basis_old_meta")
    val e = intercept[IllegalArgumentException] {
      Dedup.dedupAgainstIndex(batch, "doc_id", "text", "basis_old")
    }
    assert(e.getMessage.contains("shh_basis") &&
      e.getMessage.contains("rebuild"))
    // the xxh64 family's basis never changed, so a basis-less
    // non-md5 meta keeps working (no forced rebuild for fine indexes)
    Dedup.buildDedupIndex(corpus, "doc_id", "text", "basis_xx",
      shingleK = 3, numPerms = 16, bands = 8, md5Sig = false,
      numBuckets = 4)
    graft.sources.Bucketing.writeTable(
      Seq((3, 16, 8, false, 4))
        .toDF("shingle_k", "num_perms", "bands", "md5_sig",
          "num_buckets"),
      "basis_xx_meta")
    val sXx = survivors("basis_xx")
    assert(!sXx.contains(101L) && sXx.contains(103L) &&
      sXx.contains(106L))
    // a WRONG recorded basis (operator hand-edited, tool drift)
    // also refuses
    Dedup.buildDedupIndex(corpus, "doc_id", "text", "basis_bad",
      shingleK = 3, numPerms = 16, bands = 8, md5Sig = true,
      numBuckets = 4)
    graft.sources.Bucketing.writeTable(
      Seq((3, 16, 8, true, "xxh64", 4))
        .toDF("shingle_k", "num_perms", "bands", "md5_sig",
          "shh_basis", "num_buckets"),
      "basis_bad_meta")
    val e2 = intercept[IllegalArgumentException] {
      Dedup.dedupAgainstIndex(batch, "doc_id", "text", "basis_bad")
    }
    assert(e2.getMessage.contains("shh_basis"))
  }

  test("a non-md5 index refuses to reband index-locally") {
    Dedup.buildDedupIndex(corpus, "doc_id", "text", name = "t_reband_xx",
      numPerms = 32, bands = 16, md5Sig = false, numBuckets = 4)
    val e = intercept[IllegalArgumentException] {
      Dedup.rebandDedupIndex(spark, "t_reband_xx", bands = 8,
        numPerms = 32)
    }
    assert(e.getMessage.contains("md5Sig"))
  }

  test("reband crash windows: pre-marker stage drops; post-marker stage rolls forward across a restart") {
    import spark.implicits._
    val name = "t_reband_crash"
    val marker = s"${name}__reband_pending"
    Dedup.buildDedupIndex(corpus, "doc_id", "text", name = name,
      numPerms = 32, bands = 16, md5Sig = true, numBuckets = 4)
    val liveBefore = bandRows(s"${name}_bands")

    // ---- window 1: death BEFORE the marker — the staged tables
    // never became the truth; the next verb drops them and the live
    // index is untouched
    graft.sources.Bucketing.writeTable(
      Seq((3, 32, 8, true, 4)).toDF("shingle_k", "num_perms", "bands",
        "md5_sig", "num_buckets"), s"${name}_meta_stage")
    Dedup.rebandDedupIndex(spark, name, bands = 8, numPerms = 32)
    assert(!spark.catalog.tableExists(s"${name}_meta_stage"),
      "pre-marker stage must be dropped")
    // (the reband itself then ran: geometry is now 8 bands)
    assert(spark.table(s"${name}_meta").head().getAs[Int]("bands") == 8)
    assert(bandRows(s"${name}_bands") != liveBefore)

    // ---- window 2: death AFTER the marker — the staged state is
    // the declared truth; a fresh session's open() must roll forward
    // (promote both tables, clear marker and stages). Stage a
    // distinguishable state — the 16-band geometry again — via a
    // scratch fresh index whose band rows become the stage.
    Dedup.buildDedupIndex(corpus, "doc_id", "text",
      name = "t_reband_scratch", numPerms = 32, bands = 16,
      md5Sig = true, numBuckets = 4)
    graft.sources.Bucketing.writeBucketed(
      spark.table("t_reband_scratch_bands"), s"${name}_bands_stage",
      "band_hash", 4)
    graft.sources.Bucketing.writeTable(
      spark.table("t_reband_scratch_meta"), s"${name}_meta_stage")
    graft.sources.Bucketing.createMarker(spark, marker)
    val old = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        old.conf.get("spark.sql.warehouse.dir"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      Dedup.openDedupIndex(s2, name)
      assert(!graft.sources.Bucketing.markerExists(s2, marker),
        "roll-forward must clear the marker")
      assert(!s2.catalog.tableExists(s"${name}_bands_stage") &&
        !s2.catalog.tableExists(s"${name}_meta_stage"),
        "roll-forward must clear the stages")
      assert(s2.table(s"${name}_meta").head().getAs[Int]("bands") == 16,
        "staged meta must have been promoted")
      val promoted = s2.table(s"${name}_bands").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
        .toSet
      // the scratch index lives in the same warehouse; the fresh
      // session's catalog forgot it — re-register to read it back
      graft.sources.Bucketing.registerExisting(s2,
        "t_reband_scratch_bands", Some(("band_hash", 4)))
      val staged = s2.table("t_reband_scratch_bands").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
        .toSet
      assert(promoted == staged, "staged band rows must have been promoted")
    } finally {
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      org.apache.spark.sql.SparkSession.setDefaultSession(old)
      org.apache.spark.sql.SparkSession.setActiveSession(old)
    }
  }
}
