package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retrieval

/** The persistent BM25 index family: serving from the index must
  * equal the fresh corpus scan BIT FOR BIT (same weight expression,
  * same rounding, same tie-breaks), and every maintenance verb must
  * leave an index that serves as if freshly built over the verb's
  * resulting doc set — no tombstones, no stale statistics. */
class Bm25IndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox"),
      (3L, "spark shuffles are expensive at scale"),
      (4L, "brown dogs and lazy cats sleep"),
      (5L, "fox fox fox"),
      (6L, "a completely unrelated document about nothing"),
      (7L, ""), // empty text tokenizes to [""] — still a live doc
      (8L, "the dog jumps over spark")
    ).toDF("doc_id", "text")
      .unionByName(Seq((9L, null.asInstanceOf[String]))
        .toDF("doc_id", "text")) // null text: dropped by both paths
  }

  private def topKRows(df: DataFrame): Seq[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  private def rankRows(df: DataFrame): Seq[(Long, Int, Long, Double)] =
    df.orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq

  private val terms = Seq("fox", "lazy", "spark")

  test("indexed top-k equals the fresh scan bit for bit") {
    Retrieval.buildBm25Index(docs, "doc_id", "text", "bmspec_idx",
      numBuckets = 4)
    val fresh = topKRows(Retrieval.bm25TopK(docs, "doc_id", "text",
      terms, topK = 5, k1 = 1.5, b = 0.75))
    val served = topKRows(Retrieval.bm25TopKAgainstIndex(spark,
      "bmspec_idx", terms, topK = 5, k1 = 1.5, b = 0.75))
    assert(fresh.nonEmpty && served == fresh)
  }

  test("append: build-half then append-half serves equal to build-full") {
    Retrieval.buildBm25Index(docs.filter("doc_id % 2 = 0"), "doc_id",
      "text", "bmspec_app", numBuckets = 4)
    Retrieval.appendToBm25Index(docs.filter("doc_id % 2 = 1"), "doc_id",
      "text", "bmspec_app")
    val fresh = topKRows(Retrieval.bm25TopK(docs, "doc_id", "text",
      terms, topK = 8))
    val served = topKRows(Retrieval.bm25TopKAgainstIndex(spark,
      "bmspec_app", terms, topK = 8))
    assert(served == fresh)
    // derived stats refreshed too: df/meta describe the full doc set
    val card = Retrieval.bm25IndexStats(spark, "bmspec_app").head()
    assert(card.getAs[Long]("n_docs") == 8L)
  }

  test("retire: survivors serve equal to a fresh build over survivors") {
    import spark.implicits._
    Retrieval.buildBm25Index(docs, "doc_id", "text", "bmspec_ret",
      numBuckets = 4)
    Retrieval.retireFromBm25Index(Seq(3L, 5L).toDF("doc_id"), "doc_id",
      "bmspec_ret")
    val survivors = docs.filter("doc_id not in (3, 5)")
    val fresh = topKRows(Retrieval.bm25TopK(survivors, "doc_id", "text",
      terms, topK = 8))
    val served = topKRows(Retrieval.bm25TopKAgainstIndex(spark,
      "bmspec_ret", terms, topK = 8))
    assert(served == fresh)
    // 'spark' appeared in docs 3 and 8: df must have decremented, and
    // doc 5's retirement must drop its postings — a term whose last
    // doc retires disappears outright (no tombstones)
    val dfRow = spark.table("bmspec_ret_df")
      .filter("term = 'spark'").head()
    assert(dfRow.getAs[Long]("df_t") == 1L)
    assert(spark.table("bmspec_ret_df").filter("term = 'shuffles'")
      .isEmpty)
  }

  test("batch ranks from the index equal bm25PerQueryRanks, excludeSelf") {
    import spark.implicits._
    Retrieval.buildBm25Index(docs, "doc_id", "text", "bmspec_rank",
      numBuckets = 4)
    val queries = Seq(
      (1L, Seq("fox", "lazy")),
      (3L, Seq("spark", "scale")),
      (6L, Seq("zzz_unseen"))) // no posting matches: absent from output
      .toDF("query_id", "terms")
    val fresh = rankRows(Retrieval.bm25PerQueryRanks(docs, "doc_id",
      "text", queries, "query_id", "terms", topK = 4, k1 = 1.5,
      b = 0.75, excludeSelf = true))
    val served = rankRows(Retrieval.bm25RanksAgainstIndex(spark,
      "bmspec_rank", queries, "query_id", "terms", topK = 4, k1 = 1.5,
      b = 0.75, excludeSelf = true))
    assert(fresh.nonEmpty && served == fresh)
    assert(!served.exists(_._1 == 6L))
    // the bounded driver pull fails loudly past the guard
    val e = intercept[IllegalArgumentException] {
      Retrieval.bm25RanksAgainstIndex(spark, "bmspec_rank", queries,
        "query_id", "terms", topK = 4, maxQueryTerms = 2)
    }
    assert(e.getMessage.contains("distinct terms"))
  }

  test("stats card matches direct recomputation from the corpus") {
    Retrieval.buildBm25Index(docs, "doc_id", "text", "bmspec_stats",
      numBuckets = 4)
    val card = Retrieval.bm25IndexStats(spark, "bmspec_stats").head()
    assert(card.getAs[Long]("n_docs") == 8L)
    // 8 live docs; doc 7 contributes one "" token
    val expectedSumDl = docs.filter("text is not null")
      .selectExpr("sum(size(split(lower(trim(text)), '\\\\s+')))")
      .head().getLong(0)
    assert(card.getAs[Long]("sum_dl") == expectedSumDl)
    assert(card.getAs[Long]("n_postings") ==
      spark.table("bmspec_stats_postings").count())
    assert(card.getAs[Long]("n_terms") ==
      spark.table("bmspec_stats_df").count())
  }

  test("repairBm25Stats re-derives df/meta from postings after a stats-window death") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    Retrieval.buildBm25Index(docs, "doc_id", "text", "bmspec_rep",
      numBuckets = 4)
    // simulate a death inside appendToBm25Index AFTER the postings/
    // docs appends but BEFORE the df/meta refresh: append the raw
    // rows directly, leaving the derived stats stale
    val extra = Seq((10L, "fox among sparks")).toDF("doc_id", "text")
    val batchPost = extra
      .select(col("doc_id"),
        graft.operators.Dedup.tokens(col("text")).as("tk"))
      .select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
        explode(graft.functions.SketchFunctions.termPositions(
          col("tk"))).as("e"))
      .select(col("e.term").as("term"), col("doc_id"),
        size(col("e.positions")).cast("long").as("tf"), col("dl"),
        col("e.positions").as("positions"))
    graft.sources.Bucketing.appendBucketed(batchPost,
      "bmspec_rep_postings", "term", 4)
    graft.sources.Bucketing.appendBucketed(
      batchPost.groupBy("doc_id").agg(max("dl").as("dl")),
      "bmspec_rep_docs", "doc_id", 4)
    Retrieval.repairBm25Stats(spark, "bmspec_rep")
    val full = docs.unionByName(extra)
    val fresh = topKRows(Retrieval.bm25TopK(full, "doc_id", "text",
      terms, topK = 8))
    val served = topKRows(Retrieval.bm25TopKAgainstIndex(spark,
      "bmspec_rep", terms, topK = 8))
    assert(served == fresh)
  }

  test("compaction folds accreted appends; a fresh session re-opens the index and serves identically") {
    Retrieval.buildBm25Index(docs.filter("doc_id <= 4"), "doc_id",
      "text", "bmspec_open", numBuckets = 4)
    Retrieval.appendToBm25Index(docs.filter("doc_id in (5, 6)"),
      "doc_id", "text", "bmspec_open")
    Retrieval.appendToBm25Index(docs.filter("doc_id >= 7"), "doc_id",
      "text", "bmspec_open")
    val before = topKRows(Retrieval.bm25TopKAgainstIndex(spark,
      "bmspec_open", terms, topK = 8))
    Retrieval.compactBm25Index(spark, "bmspec_open")
    assert(topKRows(Retrieval.bm25TopKAgainstIndex(spark,
      "bmspec_open", terms, topK = 8)) == before,
      "compaction must be value-invisible")
    // a fresh session (catalog gone, warehouse directories intact)
    // re-opens and serves bit-identically
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
      Retrieval.openBm25Index(s2, "bmspec_open")
      val served = Retrieval.bm25TopKAgainstIndex(s2, "bmspec_open",
        terms, topK = 8).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(served == before)
    } finally {
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      org.apache.spark.sql.SparkSession.setDefaultSession(old)
      org.apache.spark.sql.SparkSession.setActiveSession(old)
    }
  }

  test("screenNewForBm25Index makes a replayed append a no-op") {
    Retrieval.buildBm25Index(docs.filter("doc_id <= 6"), "doc_id",
      "text", "bmspec_scr", numBuckets = 4)
    val batch = docs.filter("doc_id in (5, 6, 7, 8)")
    val fresh = Retrieval.screenNewForBm25Index(batch, "doc_id",
      "bmspec_scr")
    assert(fresh.select("doc_id").collect().map(_.getLong(0)).toSet
      == Set(7L, 8L))
    Retrieval.appendToBm25Index(fresh, "doc_id", "text", "bmspec_scr")
    val nPost = spark.table("bmspec_scr_postings").count()
    // full replay: everything now screened — the append is a no-op
    Retrieval.appendToBm25Index(
      Retrieval.screenNewForBm25Index(batch, "doc_id", "bmspec_scr"),
      "doc_id", "text", "bmspec_scr")
    assert(spark.table("bmspec_scr_postings").count() == nPost,
      "replayed append doubled postings")
  }

  test("reconcileBm25Index heals a sink/index crash window and is idempotent") {
    // simulate the C16 residual window: docs 1-6 "landed in the sink"
    // but only 1-4 made it into the index before a death
    Retrieval.buildBm25Index(docs.filter("doc_id <= 4"), "doc_id",
      "text", "bmspec_rec", numBuckets = 4)
    val landed = docs.filter("doc_id <= 6")
    assert(Retrieval.reconcileBm25Index(landed, "doc_id", "text",
      "bmspec_rec") == 2L)
    val fresh = topKRows(Retrieval.bm25TopK(landed, "doc_id", "text",
      terms, topK = 8))
    assert(topKRows(Retrieval.bm25TopKAgainstIndex(spark, "bmspec_rec",
      terms, topK = 8)) == fresh, "healed index must serve as fresh")
    assert(Retrieval.reconcileBm25Index(landed, "doc_id", "text",
      "bmspec_rec") == 0L, "second reconciliation must find nothing")
  }

  test("phrase: indexed serving equals the fresh scan bit for bit; positions are real") {
    import spark.implicits._
    val pdocs = Seq(
      (1L, "the quick brown fox and the quick brown fox again"),
      (2L, "brown quick inversion and a brown quick again"), // inverted: no match
      (3L, "one quick brown match here"),
      (4L, "quick stop then brown gap never adjacent"),
      (5L, "")).toDF("doc_id", "text")
    Retrieval.buildBm25Index(pdocs, "doc_id", "text", "bmspec_ph",
      numBuckets = 4)
    val phrase = Seq("quick", "brown")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq
    val fresh = rows(Retrieval.bm25PhraseTopK(pdocs, "doc_id", "text",
      phrase, topK = 10))
    val served = rows(Retrieval.bm25PhraseAgainstIndex(spark,
      "bmspec_ph", phrase, topK = 10))
    assert(served == fresh)
    // occurrence counts positional: doc 1 twice, doc 3 once, docs
    // 2/4 never (inversion / gap), doc 5 empty
    val byDoc = fresh.map(r => r._1 -> r._2).toMap
    assert(byDoc == Map(1L -> 2L, 3L -> 1L), byDoc.toString)
    // a one-word phrase degenerates to single-term BM25
    val oneWord = rows(Retrieval.bm25PhraseAgainstIndex(spark,
      "bmspec_ph", Seq("brown"), topK = 10))
    val viaTerm = Retrieval.bm25TopKAgainstIndex(spark, "bmspec_ph",
      Seq("brown"), topK = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(oneWord.map(r => (r._1, r._3)) == viaTerm)
    // a repeated-term phrase ("quick brown fox and the quick"?) —
    // the aligned self-overlap case: "brown fox" vs "fox fox"
    val rep = rows(Retrieval.bm25PhraseAgainstIndex(spark, "bmspec_ph",
      Seq("the", "quick"), topK = 10))
    assert(rep.map(r => r._1 -> r._2).toMap == Map(1L -> 2L))
    // loud refusal on a non-lowercase phrase
    val e = intercept[IllegalArgumentException] {
      Retrieval.bm25PhraseAgainstIndex(spark, "bmspec_ph",
        Seq("Quick", "brown"), topK = 5)
    }
    assert(e.getMessage.contains("lowercase"))
  }

  test("tokenizer family: norm strips boundary punctuation; a family mismatch refuses loudly") {
    import spark.implicits._
    // the planted transform every word-boundary punctuation test
    // uses: '(' + text with ' ' -> '. ' + ')' — under norm this
    // corpus tokenizes exactly like the clean corpus under ws
    val planted = docs.select(col("doc_id"),
      when(col("text").isNotNull,
        concat(lit("("), regexp_replace(col("text"), " ", ". "),
          lit(")"))).as("text"))
    Retrieval.buildBm25Index(planted, "doc_id", "text", "bmspec_norm",
      numBuckets = 4, tokenizer = "norm")
    val servedNorm = topKRows(Retrieval.bm25TopKAgainstIndex(spark,
      "bmspec_norm", terms, topK = 8, tokenizer = "norm"))
    val freshNorm = topKRows(Retrieval.bm25TopK(planted, "doc_id",
      "text", terms, topK = 8, tokenizer = "norm"))
    assert(servedNorm == freshNorm, "fresh == indexed at the norm family")
    // ...and both equal the ws family over the CLEAN corpus except
    // n_docs bookkeeping: doc 7's "" is dl=1 under ws ([""]) but
    // dl=0 under norm — scores differ in avgdl, so compare matched
    // doc ids and tf-bearing structure instead of doubles
    assert(servedNorm.map(_._1) ==
      topKRows(Retrieval.bm25TopK(docs, "doc_id", "text", terms,
        topK = 8)).map(_._1),
      "norm over planted ranks like ws over clean")
    // a ws-family index refuses a norm-family query (and vice versa)
    val e1 = intercept[IllegalArgumentException] {
      Retrieval.bm25TopKAgainstIndex(spark, "bmspec_norm", terms,
        topK = 5) // default tokenizer = ws
    }
    assert(e1.getMessage.contains("tokenizer family"))
    Retrieval.buildBm25Index(docs, "doc_id", "text", "bmspec_ws",
      numBuckets = 4)
    val e2 = intercept[IllegalArgumentException] {
      Retrieval.bm25TopKAgainstIndex(spark, "bmspec_ws", terms,
        topK = 5, tokenizer = "norm")
    }
    assert(e2.getMessage.contains("tokenizer family"))
    // a punctuation-carrying query term against a norm index is a
    // caller bug surfaced loudly, not a silent zero-match
    val e3 = intercept[IllegalArgumentException] {
      Retrieval.bm25TopKAgainstIndex(spark, "bmspec_norm",
        Seq("fox."), topK = 5, tokenizer = "norm")
    }
    assert(e3.getMessage.contains("boundary punctuation"))
    // zero-token docs (all punctuation) still hold a _docs row with
    // dl = 0 — the idempotence key — and n_docs counts them
    val allPunct = Seq((20L, "... !!! ---")).toDF("doc_id", "text")
    Retrieval.appendToBm25Index(allPunct, "doc_id", "text",
      "bmspec_norm")
    assert(spark.table("bmspec_norm_docs")
      .filter("doc_id = 20 and dl = 0").count() == 1L)
    assert(Retrieval.screenNewForBm25Index(allPunct, "doc_id",
      "bmspec_norm").count() == 0L, "zero-token doc must self-suppress")
  }

  test("uni family: Unicode letters survive boundary stripping where norm's ASCII classes eat them") {
    import spark.implicits._
    val multi = Seq(
      (1L, "«über» performance matters…"),
      (2L, "plain ascii words here"),
      (3L, "“quoted” über again")).toDF("doc_id", "text")
    // norm (ASCII classes): «über» -> leading « AND ü both strip ->
    // 'ber'; uni (\p{L}\p{N}): -> 'über'
    val normToks = multi.select(
      Retrieval.tokensFor("norm", col("text")).as("tk"))
      .collect().flatMap(_.getSeq[String](0)).toSet
    val uniToks = multi.select(
      Retrieval.tokensFor("uni", col("text")).as("tk"))
      .collect().flatMap(_.getSeq[String](0)).toSet
    assert(normToks.contains("ber") && !normToks.contains("über"))
    assert(uniToks.contains("über") && !uniToks.contains("ber"))
    // end-to-end: a uni index finds the non-ASCII term; families
    // refuse across
    Retrieval.buildBm25Index(multi, "doc_id", "text", "bmspec_uni",
      numBuckets = 2, tokenizer = "uni")
    val hits = Retrieval.bm25TopKAgainstIndex(spark, "bmspec_uni",
      Seq("über"), topK = 5, tokenizer = "uni")
      .collect().map(_.getLong(0)).toSet
    assert(hits == Set(1L, 3L))
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopKAgainstIndex(spark, "bmspec_uni",
        Seq("über"), topK = 5, tokenizer = "norm")
    }
  }

  test("docs-first append order: a death before the postings append self-suppresses on replay and reconcile heals the hole") {
    import spark.implicits._
    Retrieval.buildBm25Index(docs.filter("doc_id <= 6"), "doc_id",
      "text", "bmspec_hole", numBuckets = 4)
    // simulate a death INSIDE appendToBm25Index after _docs, before
    // _postings: append only the _docs rows of the batch
    val batch = docs.filter("doc_id = 8")
    graft.sources.Bucketing.appendBucketed(
      batch.select(col("doc_id"),
        size(graft.operators.Dedup.tokens(col("text")))
          .cast("long").as("dl")),
      "bmspec_hole_docs", "doc_id", 4)
    // the replay self-suppresses (this is the docs-first guarantee:
    // postings can never double)...
    assert(Retrieval.screenNewForBm25Index(batch, "doc_id",
      "bmspec_hole").count() == 0L)
    // ...so only reconciliation heals the posting-less doc
    val landed = docs.filter("doc_id <= 8")
    assert(Retrieval.reconcileBm25Index(landed, "doc_id", "text",
      "bmspec_hole") == 2L) // doc 7 missing entirely + doc 8's hole
    val fresh = topKRows(Retrieval.bm25TopK(landed, "doc_id", "text",
      terms, topK = 8))
    assert(topKRows(Retrieval.bm25TopKAgainstIndex(spark,
      "bmspec_hole", terms, topK = 8)) == fresh)
    assert(Retrieval.reconcileBm25Index(landed, "doc_id", "text",
      "bmspec_hole") == 0L, "reconcile must be idempotent")
  }

  test("proximity: indexed equals fresh; window semantics are positional and unordered") {
    import spark.implicits._
    val pdocs = Seq(
      (1L, "alpha beta nearby words"),           // adjacent: every window
      (2L, "beta then one gap alpha"),           // |q-p| = 4, inverted order
      (3L, "alpha far far far far far far beta"),// |q-p| = 7
      (4L, "alpha only no partner here"),        // missing term: never
      (5L, "alpha beta alpha distant text then alpha")) // multi-anchor
      .toDF("doc_id", "text")
    Retrieval.buildBm25Index(pdocs, "doc_id", "text", "bmspec_prox",
      numBuckets = 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq
    val fresh = rows(Retrieval.bm25ProximityTopK(pdocs, "doc_id",
      "text", Seq("alpha", "beta"), window = 4, topK = 10))
    val served = rows(Retrieval.bm25ProximityAgainstIndex(spark,
      "bmspec_prox", Seq("alpha", "beta"), window = 4, topK = 10))
    assert(served == fresh)
    val byDoc = fresh.map(r => r._1 -> r._2).toMap
    // doc 1: anchor@1, beta@2 -> 1; doc 2: alpha@5, beta@1, |d|=4 -> 1
    // (unordered); doc 3: |d|=7 > 4 -> absent; doc 4: no beta -> absent;
    // doc 5: alpha@{1,3,7}, beta@2 -> anchors 1,3 within 4, 7 not -> 2
    assert(byDoc == Map(1L -> 1L, 2L -> 1L, 5L -> 2L), byDoc.toString)
    // widening the window admits doc 3
    val wide = rows(Retrieval.bm25ProximityAgainstIndex(spark,
      "bmspec_prox", Seq("alpha", "beta"), window = 7, topK = 10))
    assert(wide.map(_._1).contains(3L))
    // ORDERED proximity: doc 2's inverted pair (beta before alpha)
    // matches unordered but NOT ordered; doc 1's in-order pair
    // matches both; doc 5's anchors at 1 and 3 still see beta@2
    // unordered, but ordered only anchor 1 (beta must FOLLOW) -> tf 1
    val orderedRows = rows(Retrieval.bm25ProximityAgainstIndex(spark,
      "bmspec_prox", Seq("alpha", "beta"), window = 4, topK = 10,
      ordered = true))
    val orderedByDoc = orderedRows.map(r => r._1 -> r._2).toMap
    assert(orderedByDoc == Map(1L -> 1L, 5L -> 1L), orderedByDoc.toString)
    // ordered == fresh ordered (twin)
    assert(orderedRows == rows(Retrieval.bm25ProximityTopK(pdocs,
      "doc_id", "text", Seq("alpha", "beta"), window = 4, topK = 10,
      ordered = true)))
    // loud refusals: duplicate terms, window < 1, single term
    intercept[IllegalArgumentException] {
      Retrieval.bm25ProximityTopK(pdocs, "doc_id", "text",
        Seq("alpha", "alpha"), window = 3, topK = 5)
    }
    intercept[IllegalArgumentException] {
      Retrieval.bm25ProximityTopK(pdocs, "doc_id", "text",
        Seq("alpha", "beta"), window = 0, topK = 5)
    }
    intercept[IllegalArgumentException] {
      Retrieval.bm25ProximityTopK(pdocs, "doc_id", "text",
        Seq("alpha"), window = 3, topK = 5)
    }
  }

  test("empty query batch keeps the caller's query_id type") {
    import spark.implicits._
    Retrieval.buildBm25Index(docs, "doc_id", "text", "bmspec_empty",
      numBuckets = 4)
    val stringQueries = Seq.empty[(String, Seq[String])]
      .toDF("qid", "terms")
    val out = Retrieval.bm25RanksAgainstIndex(spark, "bmspec_empty",
      stringQueries, "qid", "terms", topK = 3)
    assert(out.schema("query_id").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(out.count() == 0L)
  }

  test("rankedEval: hand-computed MRR/DCG/nDCG/recall; no-relevant and not-retrieved edges") {
    import spark.implicits._
    // run: q1 ranks docs 10,11,12,13; q2 ranks 20,21
    val run = Seq(
      (1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L), (1L, 4, 13L),
      (2L, 1, 20L), (2L, 2, 21L)).toDF("query_id", "rank", "doc_id")
    // qrels: q1 relevant {11: g2, 13: g1, 99: g3 (never retrieved)};
    // q2 has NO relevant docs (grade-0 row must not count)
    val qrels = Seq(
      (1L, 11L, 2L), (1L, 13L, 1L), (1L, 99L, 3L),
      (2L, 20L, 0L)).toDF("query_id", "doc_id", "grade")
    val out = Retrieval.rankedEval(run, qrels, k = 3)
      .orderBy("query_id").collect()
    val q1 = out(0)
    def log2(x: Double) = math.log(x) / math.log(2.0)
    // rr = 1/2 (first hit at rank 2); dcg@3 = 2/log2(3) (doc 13 at
    // rank 4 > k); idcg@3 = 3/log2(2) + 2/log2(3) + 1/log2(4);
    // recall@3 = 1/3
    val dcg = 2.0 / log2(3)
    val idcg = 3.0 / log2(2) + 2.0 / log2(3) + 1.0 / log2(4)
    assert(q1.getAs[Long]("n_rel") == 3L)
    assert(q1.getAs[Double]("rr") == 0.5)
    assert(q1.getAs[Double]("dcg") ==
      BigDecimal(dcg).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(q1.getAs[Double]("ndcg") ==
      BigDecimal(dcg / idcg).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(q1.getAs[Double]("recall_at_k") == 0.3333)
    val q2 = out(1)
    assert(q2.getAs[Long]("n_rel") == 0L &&
      q2.getAs[Double]("rr") == 0.0 && q2.getAs[Double]("ndcg") == 0.0 &&
      q2.getAs[Double]("recall_at_k") == 0.0)
  }

  test("lmDirichlet: indexed serve equals the fresh scan; family guard wired") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma alpha"), (2L, "beta gamma delta"),
      (3L, "alpha epsilon zeta"), (4L, "gamma delta epsilon eta"))
      .toDF("doc_id", "text")
    Retrieval.buildBm25Index(corpus, "doc_id", "text", "lmd_idx",
      numBuckets = 2)
    val fresh = Retrieval.lmDirichletTopK(corpus, "doc_id", "text",
      Seq("alpha", "gamma"), topK = 10, mu = 100.0).collect().toSeq
    val served = Retrieval.lmDirichletAgainstIndex(spark, "lmd_idx",
      Seq("alpha", "gamma"), topK = 10, mu = 100.0).collect().toSeq
    assert(fresh == served, s"fresh=$fresh served=$served")
    // only candidates (>= 1 matching term) are results; all 4 docs
    // match here, doc 1 (two alphas + gamma, short) ranks first
    assert(served.size == 4 && served.head.getLong(0) == 1L)
    val e = intercept[IllegalArgumentException] {
      Retrieval.lmDirichletAgainstIndex(spark, "lmd_idx",
        Seq("alpha"), topK = 5, tokenizer = "norm")
    }
    assert(e.getMessage.contains("family"))
  }

  test("snippetWindowsAgainstIndex picks the densest window, earliest on ties") {
    import spark.implicits._
    // doc 1: 'alpha' early and alone; 'alpha beta' together late —
    // the 2-distinct-term window must win over the earlier lone hit.
    // doc 2: two 1-term windows — the EARLIER anchor must win.
    val corpus = Seq(
      (1L, "alpha x x x x x x x x x alpha y beta z"),
      (2L, "x beta x x x x x x x x x x beta x"))
      .toDF("doc_id", "text")
    Retrieval.buildBm25Index(corpus, "doc_id", "text", "snip_idx",
      numBuckets = 2)
    val w = Retrieval.snippetWindowsAgainstIndex(spark, "snip_idx",
      Seq("alpha", "beta"), topK = 5, window = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("win_start"), r.getAs[Long]("n_terms"),
          r.getAs[Long]("n_hits"))).toMap
    // doc 1 tokens: alpha(1) ... alpha(11) y beta(13) z — the window
    // [11,14] covers alpha+beta (2 terms, 2 hits); [1,4] covers 1
    assert(w(1L) == (11, 2L, 2L))
    // doc 2: beta at 2 and 13 — two identical 1-term windows, the
    // earlier anchor wins
    assert(w(2L) == (2, 1L, 1L))
  }

  test("mergeBm25Indexes: merged shards serve equal to one whole build") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val corpus = Seq(
      (1L, "alpha beta gamma"), (2L, "beta gamma delta"),
      (3L, "alpha alpha epsilon"), (4L, "gamma delta epsilon"),
      (5L, "alpha beta beta"), (6L, "zeta eta theta"))
      .toDF("doc_id", "text")
    Retrieval.buildBm25Index(corpus.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", "mrg_even", numBuckets = 2)
    Retrieval.buildBm25Index(corpus.filter(col("doc_id") % 2 =!= 0),
      "doc_id", "text", "mrg_odd", numBuckets = 2)
    Retrieval.mergeBm25Indexes(spark, "mrg_all",
      Seq("mrg_even", "mrg_odd"), numBuckets = 2)
    Retrieval.buildBm25Index(corpus, "doc_id", "text", "mrg_whole",
      numBuckets = 2)
    // the merged _df must hold ONE summed row per term
    val df = spark.table("mrg_all_df")
    assert(df.count() == df.select("term").distinct().count())
    val q = Seq("alpha", "beta")
    val merged = Retrieval.bm25TopKAgainstIndex(spark, "mrg_all",
      q, topK = 10).collect().toSeq
    val whole = Retrieval.bm25TopKAgainstIndex(spark, "mrg_whole",
      q, topK = 10).collect().toSeq
    assert(merged == whole, s"merged=$merged whole=$whole")
    // overlapping shards refuse loudly instead of doubling postings
    val e = intercept[IllegalArgumentException] {
      Retrieval.mergeBm25Indexes(spark, "mrg_bad",
        Seq("mrg_even", "mrg_whole"), numBuckets = 2)
    }
    assert(e.getMessage.contains("doc id"))
    // family mismatch refuses loudly
    Retrieval.buildBm25Index(corpus, "doc_id", "text", "mrg_norm",
      numBuckets = 2, tokenizer = "norm")
    val e2 = intercept[IllegalArgumentException] {
      Retrieval.mergeBm25Indexes(spark, "mrg_bad2",
        Seq("mrg_even", "mrg_norm"), numBuckets = 2)
    }
    assert(e2.getMessage.contains("families"))
  }

  test("retrievalQualityCard: the family arms measure the real family gap") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // every corpus token carries punctuation; doc 4 is the clean twin
    val corpus = Seq(
      (1L, "alpha, beta."), (2L, "alpha; beta!"),
      (3L, "gamma delta"), (4L, "alpha beta"))
      .toDF("doc_id", "text")
    val probes = Seq((1L, "alpha, beta.")).toDF("query_id", "qtext")
    val qrels = Seq((1L, 2L, 1L), (1L, 4L, 1L))
      .toDF("query_id", "doc_id", "grade")
    val dense = Seq((1L, 1, 3L)).toDF("query_id", "rank", "doc_id")
    val card = Retrieval.retrievalQualityCard(corpus, "doc_id", "text",
      probes, "query_id", "qtext", qrels, k = 10,
      denseRun = Some(dense), hybridLex = "norm")
      .collect().map(r => r.getAs[String]("arm") ->
        (r.getAs[Double]("mrr"), r.getAs[Double]("mean_recall"))).toMap
    assert(card.size == 5)
    // ws: the probe's punctuation-glued terms match no OTHER doc —
    // the silent-zero failure the card exists to surface as a number
    assert(card("bm25_ws") == (0.0, 0.0))
    // norm strips boundaries on both sides: both relevant docs found
    assert(card("bm25_norm") == (1.0, 1.0))
    assert(card("bm25_uni") == card("bm25_norm"))
    // the dense leg alone ranks only the irrelevant doc 3
    assert(card("dense") == (0.0, 0.0))
    // fusion still surfaces the norm leg's relevant docs
    assert(card("hybrid_rrf")._2 == 1.0)
  }

  test("rrfFuseAll: hand-computed three-system fusion; binary delegation unchanged") {
    import spark.implicits._
    import graft.operators.Retrieval
    // one query, three systems with a doc appearing in 3/2/1 lists
    val a = Seq((0L, 1, 10L), (0L, 2, 20L), (0L, 3, 30L))
      .toDF("query_id", "rank", "doc_id")
    val b = Seq((0L, 1, 20L), (0L, 2, 10L)).toDF("query_id", "rank", "doc_id")
    val c = Seq((0L, 1, 10L), (0L, 2, 40L)).toDF("query_id", "rank", "doc_id")
    val fused = Retrieval.rrfFuseAll(Seq(a, b, c), k0 = 60, topK = 4)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("rrf"))).toList
    def s3(xs: Double*) = BigDecimal(xs.reduceLeft(_ + _))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 10: ranks 1/2/1 -> 1/61 + 1/62 + 1/61; doc 20: 2/1 ->
    // 1/62 + 1/61; doc 30: 1/63; doc 40: 1/62 (left-assoc sums)
    assert(fused.map(x => (x._1, x._2)) ==
      List((1, 10L), (2, 20L), (3, 40L), (4, 30L)), fused.toString)
    assert(fused.head._3 == s3(1.0 / 61, 1.0 / 62, 1.0 / 61))
    assert(fused(1)._3 == s3(1.0 / 62, 1.0 / 61))
    // binary rrfFuse (now a delegation) matches the 2-list N-ary
    val viaBinary = Retrieval.rrfFuse(a, b, k0 = 60, topK = 4).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("rrf"))).toList
    val viaN = Retrieval.rrfFuseAll(Seq(a, b), k0 = 60, topK = 4)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("rrf"))).toList
    assert(viaBinary == viaN)
  }

  test("serving plan prunes postings buckets and never reads a corpus file") {
    Retrieval.buildBm25Index(docs, "doc_id", "text", "bmspec_plan",
      numBuckets = 4)
    val p = Retrieval.bm25TopKAgainstIndex(spark, "bmspec_plan", terms,
      topK = 5).queryExecution.executedPlan.toString
    assert(p.contains("SelectedBucketsCount"),
      s"postings scan did not bucket-prune:\n${p.take(2000)}")
    assert(!p.contains("documents"),
      s"serving plan touches the corpus:\n${p.take(2000)}")
  }

  test("PRF equals the fresh scan with AND without the bydoc projection; a pre-projection append never creates a partial one") {
    Retrieval.buildBm25Index(docs.filter("doc_id % 2 = 0"), "doc_id",
      "text", "bmspec_bydoc", numBuckets = 4)
    // simulate a PRE-PROJECTION index (persisted before r20): drop
    // the bydoc table outright
    graft.sources.Bucketing.dropTableAndDir(spark,
      "bmspec_bydoc_postings_bydoc")
    // an append on it must NOT create a bydoc holding only the batch
    // — mining would then trust a partial projection as the corpus
    Retrieval.appendToBm25Index(docs.filter("doc_id % 2 = 1"),
      "doc_id", "text", "bmspec_bydoc")
    assert(!spark.catalog.tableExists("bmspec_bydoc_postings_bydoc"),
      "a pre-projection index must stay pre-projection under appends")
    // the FALLBACK mining path still serves the fresh answer
    val fresh = topKRows(Retrieval.bm25PrfTopK(docs, "doc_id", "text",
      terms, topK = 6, fbDocs = 2, fbTerms = 3))
    assert(topKRows(Retrieval.bm25PrfAgainstIndex(spark, "bmspec_bydoc",
      terms, topK = 6, fbDocs = 2, fbTerms = 3)) == fresh)
    // reconcile is the UPGRADE verb: it derives the complete
    // projection for a pre-projection index, and the bucket-pruned
    // mining path then serves the same answer
    Retrieval.reconcileBm25Index(docs, "doc_id", "text", "bmspec_bydoc")
    assert(spark.catalog.tableExists("bmspec_bydoc_postings_bydoc"),
      "reconcile must derive the missing projection")
    assert(topKRows(Retrieval.bm25PrfAgainstIndex(spark, "bmspec_bydoc",
      terms, topK = 6, fbDocs = 2, fbTerms = 3)) == fresh)
  }
}
