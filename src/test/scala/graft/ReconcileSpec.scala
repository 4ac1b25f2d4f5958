package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}

/** The reconcile verbs of the dedup/sim/url/ANN families: each must
  * COUNT exactly the landed items its index is missing, heal them
  * through the family's normal append, and find nothing on a second
  * run. (End-state equality with a fresh full build is the d126-d129
  * oracles' job; this spec pins the verb's own contract.) */
class ReconcileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs: DataFrame = {
    import spark.implicits._
    Seq((1L, "alpha beta gamma delta"), (2L, "epsilon zeta eta theta"),
      (3L, "iota kappa lambda mu"), (4L, "nu xi omicron pi"))
      .toDF("doc_id", "text")
  }

  test("reconcileDedupIndex heals exactly the missing docs, idempotent") {
    Dedup.buildDedupIndex(docs.filter("doc_id <= 2"), "doc_id", "text",
      "rec_dx", md5Sig = true, numBuckets = 2)
    assert(Dedup.reconcileDedupIndex(docs, "doc_id", "text",
      "rec_dx") == 2L)
    assert(spark.table("rec_dx_docs").count() == 4L)
    assert(Dedup.reconcileDedupIndex(docs, "doc_id", "text",
      "rec_dx") == 0L)
  }

  test("dedup tokenizer family: a re-punctuated near-dup sails through a ws index and is caught by a norm index") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog every day"))
      .toDF("doc_id", "text")
    // same words, punctuation glued onto most of them — and
    // different BYTES, so the exact content-hash screen cannot save
    // the ws family
    val batch = Seq(
      (2L, "the, quick. brown! fox? jumps; over: the lazy dog, every day."))
      .toDF("doc_id", "text")
    Dedup.buildDedupIndex(corpus, "doc_id", "text", "fam_ws",
      md5Sig = true, numBuckets = 2)
    assert(Dedup.dedupAgainstIndex(batch, "doc_id", "text", "fam_ws")
      .count() == 1L,
      "ws family: punctuated twin shares no shingles and survives")
    Dedup.buildDedupIndex(corpus, "doc_id", "text", "fam_norm",
      md5Sig = true, numBuckets = 2, tokenizer = "norm")
    assert(Dedup.dedupAgainstIndex(batch, "doc_id", "text", "fam_norm")
      .count() == 0L,
      "norm family: identical normalized shingles — caught")
    // the family is meta state: appends read it from there (an
    // appended punctuated copy of an indexed doc self-screens)
    Dedup.appendToDedupIndex(batch, "doc_id", "text", "fam_norm")
    assert(spark.table("fam_norm_meta").head()
      .getAs[String]("tokenizer") == "norm")
  }

  test("decontaminate tokenizer family: differently-punctuated leak invisible at ws, caught at norm") {
    import spark.implicits._
    val train = Seq(
      (1L, "(the. benchmark. question. leaked. into. training. here)"),
      (2L, "(totally. unrelated. training. text. nothing. shared. at. all)"))
      .toDF("doc_id", "text")
    val hold = Seq(
      (10L, "the, benchmark, question, leaked, into, training, here"))
      .toDF("doc_id", "text")
    val ws = Dedup.decontaminate(train, hold, "doc_id", "text", k = 5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(ws == Map(1L -> false, 2L -> false),
      "ws family: zero shared grams across punctuation styles")
    val norm = Dedup.decontaminate(train, hold, "doc_id", "text",
      k = 5, tokenizer = "norm")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(norm == Map(1L -> true, 2L -> false),
      "norm family: the leak's normalized 5-grams match")
  }

  test("reconcileSimIndex heals from signatures, never media; idempotent") {
    import spark.implicits._
    val sigs = Seq((1L, 11L), (2L, 22L), (3L, 33L), (4L, 44L))
      .toDF("doc_id", "sim")
    Dedup.buildSimIndex(sigs.filter("doc_id % 2 = 0"), "rec_sx",
      maxDist = 2, numBuckets = 2)
    assert(Dedup.reconcileSimIndex(sigs, "rec_sx") == 2L)
    // 3 chunk rows per sig (maxDist + 1)
    assert(spark.table("rec_sx_chunks").count() == 12L)
    assert(Dedup.reconcileSimIndex(sigs, "rec_sx") == 0L)
  }

  test("reconcileUrlIndex counts DISTINCT missing canonical keys; idempotent") {
    import spark.implicits._
    val landed = Seq((1L, "http://a.com/x"), (2L, "HTTP://A.COM/x"),
      (3L, "http://b.com/y"), (4L, "http://c.com/z"))
      .toDF("doc_id", "url")
    Dedup.buildUrlIndex(landed.filter("doc_id = 4"), "url", "rec_ux",
      numBuckets = 2)
    // rows 1 and 2 canonicalize to ONE key; row 3 is another; row 4
    // is already indexed — 2 distinct keys heal
    assert(Dedup.reconcileUrlIndex(landed, "url", "rec_ux") == 2L)
    assert(spark.table("rec_ux_url").count() == 3L)
    assert(Dedup.reconcileUrlIndex(landed, "url", "rec_ux") == 0L)
  }

  test("reconcileAnnIndex encodes against the stored book; idempotent") {
    import spark.implicits._
    val vecs = (0L until 16L)
      .map(i => (i, Array.tabulate(64)(j => ((i * 7 + j) % 13).toFloat)))
      .toDF("vec_id", "v")
    Similarity.buildAnnIndex(vecs.filter("vec_id % 2 = 0"), "vec_id",
      "v", name = "rec_ax", nlist = 4, m = 4, ksub = 4, md5Sig = true,
      numBuckets = 2)
    assert(Similarity.reconcileAnnIndex(vecs, "vec_id", "v",
      "rec_ax") == 8L)
    assert(spark.table("rec_ax_vectors").count() == 16L)
    assert(Similarity.reconcileAnnIndex(vecs, "vec_id", "v",
      "rec_ax") == 0L)
  }
}
