package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.sources.Tables

/** Cosine / ANN checks: numeric correctness of the expression-based
  * cosine, and LSH recall against the brute-force baseline. */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("cosine matches a driver-side computation") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(1.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val pairs = Similarity.cosinePairs(df, "vec_id", "embedding", -1.0)
      .collect()
      .map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Double]("cos"))).toMap
    assert(math.abs(pairs((1L, 2L)) - 0.0) < 1e-12)
    assert(math.abs(pairs((1L, 3L)) - 1.0 / math.sqrt(2)) < 1e-12)
    assert(math.abs(pairs((2L, 3L)) - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("blocked all-pairs scan is bit-equal to the row-per-pair baseline") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, TestSpark.sf)
    def pairsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Double]("cos"))).toMap
    val naive = pairsOf(Similarity.cosinePairs(emb, "vec_id", "embedding", 0.4))
    // small blockSize so the testdata spans many blocks (diagonal AND
    // off-diagonal tiles both exercised)
    val blocked = pairsOf(Similarity.cosinePairsBlocked(
      emb, "vec_id", "embedding", 0.4, blockSize = 64))
    assert(blocked.keySet == naive.keySet,
      s"missing=${naive.keySet -- blocked.keySet} extra=${blocked.keySet -- naive.keySet}")
    // bit-equal cosines: same accumulation order in both kernels
    assert(naive.forall { case (k, v) => blocked(k) == v })
  }

  test("brute-force top-k is exact and self-excluding") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val topk = Similarity.bruteForceTopK(
      emb.filter(col("vec_id") < 3), emb, "vec_id", "embedding", k = 5)
      .collect()
    assert(topk.length == 15)
    assert(!topk.exists(r =>
      r.getAs[Long]("query_id") == r.getAs[Long]("neighbor_id")))
    // ranks are 1..5 per query, cos non-increasing within a query
    topk.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to 5))
      val sims = sorted.map(_.getAs[Double]("cos")).toSeq
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("IVF ANN achieves nontrivial recall vs brute force") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val queries = emb.filter(col("vec_id") < 20)
    def pairsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = pairsOf(Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 10))
    val approx = pairsOf(Similarity.ivfTopK(queries, emb, "vec_id", "embedding", 10,
      nlist = 16, nprobe = 4))
    val recall = (exact intersect approx).size.toDouble / exact.size
    // 4 of 16 cells probed → ~1/4 of the corpus; clustered vectors
    // must land well above that (k-means refinement lifts sampled-
    // centroid recall from ~0.50 to ~0.57 here)
    assert(recall > 0.45, s"recall=$recall")
    // refinement is exactly deterministic (fixed-point accumulation)
    val again = pairsOf(Similarity.ivfTopK(queries, emb, "vec_id", "embedding", 10,
      nlist = 16, nprobe = 4))
    assert(approx == again, "IVF with refinement must be deterministic")
  }

  test("LSH ANN achieves nontrivial recall vs brute force") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val queries = emb.filter(col("vec_id") < 20)
    def pairsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = pairsOf(Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 10))
    val approx = pairsOf(Similarity.lshTopK(queries, emb, "vec_id", "embedding", 10, bits = 4))
    val recall = (exact intersect approx).size.toDouble / exact.size
    // 4-bit signature with 1-bit multi-probe → ~5/16 of the corpus
    // probed; recall must beat that scan fraction for clustered vectors
    assert(recall > 0.35, s"recall=$recall")
    assert(approx.nonEmpty)
  }

  test("semanticDedup: exact in-cell dups drop min-id-wins, both sampler modes agree") {
    import spark.implicits._
    // two orthogonal groups; ids 0/1/2 share one vector, 10/11 another
    val emb = Seq(
      0L -> Seq(1f, 0f, 0f, 0f), 1L -> Seq(1f, 0f, 0f, 0f),
      2L -> Seq(1f, 0f, 0f, 0f),
      10L -> Seq(0f, 1f, 0f, 0f), 11L -> Seq(0f, 1f, 0f, 0f),
      20L -> Seq(0f, 0f, 1f, 0f)
    ).toDF("vec_id", "embedding")
    for (md5Sig <- Seq(false, true)) {
      val out = Similarity.semanticDedup(emb, "vec_id", "embedding",
        threshold = 0.9, nlist = 2, md5Sig = md5Sig).collect()
        .map(r => r.getAs[Long]("vec_id") ->
          (r.getAs[Boolean]("keep"), Option(r.getAs[java.lang.Long]("dropped_by")))).toMap
      assert(out.size == 6)
      // identical vectors always share a cell (identical argmax), so
      // the verdicts hold under EITHER centroid sample
      assert(out(0L) == ((true, None)), s"md5Sig=$md5Sig: ${out(0L)}")
      assert(out(1L) == ((false, Some(0L))))
      assert(out(2L) == ((false, Some(0L))))
      assert(out(10L) == ((true, None)))
      assert(out(11L) == ((false, Some(10L))))
      assert(out(20L) == ((true, None)))
    }
  }

  test("semanticDedup: pairwise chain semantics — each drop names its smallest in-threshold neighbor") {
    import spark.implicits._
    // A–B cos≈.95, B–C cos≈.947, A–C cos=.80 < τ: B dropped by A,
    // C dropped by B (pairwise policy; a transitive closure would
    // still drop C, but could only name A)
    val emb = Seq(
      20L -> Seq(0f, 0f, 1f, 0f),
      21L -> Seq(0f, 0f, 0.95f, 0.3122499f),
      22L -> Seq(0f, 0f, 0.8f, 0.6f)
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(emb, "vec_id", "embedding",
      threshold = 0.9, nlist = 1).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Boolean]("keep"), Option(r.getAs[java.lang.Long]("dropped_by")))).toMap
    assert(out(20L) == ((true, None)))
    assert(out(21L) == ((false, Some(20L))))
    assert(out(22L) == ((false, Some(21L))))
    // nothing drops when the threshold clears every pair
    val none = Similarity.semanticDedup(emb, "vec_id", "embedding",
      threshold = 0.999, nlist = 1).collect()
    assert(none.forall(_.getAs[Boolean]("keep")))
  }

  test("semanticDedup: an all-zero vector is inert — NaN cosines never nuke a cell") {
    import spark.implicits._
    // an all-zero embedding (a real artifact of int8 quantization)
    // yields 0/0 = NaN pair cosines, and NaN >= threshold is TRUE in
    // Spark's ordering — unguarded, vec 5 would drop BOTH real twins
    // below it and/or every same-cell vector. Contract: zero-norm
    // contributes cosine 0.0 — it survives, drops nobody, and the
    // real twin family still collapses normally.
    val emb = Seq(
      5L -> Seq(0f, 0f, 0f, 0f),
      10L -> Seq(0f, 1f, 0f, 0f), 11L -> Seq(0f, 1f, 0f, 0f),
      20L -> Seq(0f, 0f, 1f, 0f)
    ).toDF("vec_id", "embedding")
    for (md5Sig <- Seq(false, true)) {
      val out = Similarity.semanticDedup(emb, "vec_id", "embedding",
        threshold = 0.9, nlist = 1, md5Sig = md5Sig).collect()
        .map(r => r.getAs[Long]("vec_id") ->
          (r.getAs[Boolean]("keep"),
            Option(r.getAs[java.lang.Long]("dropped_by")))).toMap
      assert(out.size == 4)
      assert(out(5L) == ((true, None)), s"md5Sig=$md5Sig: ${out(5L)}")
      assert(out(10L) == ((true, None)), s"md5Sig=$md5Sig: ${out(10L)}")
      assert(out(11L) == ((false, Some(10L))), s"md5Sig=$md5Sig: ${out(11L)}")
      assert(out(20L) == ((true, None)), s"md5Sig=$md5Sig: ${out(20L)}")
    }
  }

  test("semantic cell-cost guard: the call raises past the documented mean-cell bound with the sizing formula; under it, unchanged") {
    import spark.implicits._
    val emb = (1L to 10L).map(i => (i, Seq(i.toFloat, 1f)))
      .toDF("vec_id", "qv")
    // 10 rows over 2 cells with a bound of 3/cell → raise, and the
    // message carries the formula the caller needs
    val e1 = intercept[IllegalArgumentException] {
      Similarity.semanticDedup(emb, "vec_id", "qv", threshold = 0.9,
        nlist = 2, maxMeanCellRows = 3L)
    }
    assert(e1.getMessage.contains("target_cell_rows"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Similarity.semanticDecontaminate(emb, emb.limit(2), "vec_id", "qv",
        threshold = 0.9, nlist = 2, maxMeanCellRows = 3L)
    }
    assert(e2.getMessage.contains("maxMeanCellRows"), e2.getMessage)
    // owning the cost explicitly (or sizing nlist right) proceeds
    assert(Similarity.semanticDedup(emb, "vec_id", "qv", threshold = 0.9,
      nlist = 2, maxMeanCellRows = 5L).count() == 10L)
    assert(Similarity.semanticDecontaminate(emb, emb.limit(2), "vec_id",
      "qv", threshold = 0.9, nlist = 4).count() == 10L)
  }

  test("empty-corpus edges fail loudly or return empty, never an opaque analysis error") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException] {
      Similarity.semanticDedup(empty, "vec_id", "embedding", threshold = 0.5)
    }
    assert(e1.getMessage.contains("empty corpus"))
    val e2 = intercept[IllegalArgumentException] {
      Similarity.buildAnnIndex(empty, "vec_id", "embedding", name = "t_empty")
    }
    assert(e2.getMessage.contains("empty corpus"))
    // training on an empty corpus learns nothing, returns an empty
    // (schema-complete) merge table
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val merges = graft.operators.TextAnalysis
      .trainBpe(docs, "doc_id", "text", numMerges = 3)
    assert(merges.columns.toSeq ==
      Seq("rank", "a", "b", "cnt", "state_xor") && merges.count() == 0)
    // extraction / gating on empty inputs: empty out
    assert(graft.operators.TextAnalysis.extractMainHtml(
      Seq.empty[(Long, String)].toDF("doc_id", "html"),
      "doc_id", "html").count() == 0)
    assert(graft.operators.TextAnalysis.repetitionStats(
      docs, "doc_id", "text").count() == 0)
  }

  private def q8corpus = {
    import org.apache.spark.sql.functions.col
    Tables.embeddings(spark, TestSpark.sf).select(col("vec_id"),
      graft.functions.SketchFunctions.quantizeInt8Floats(
        col("embedding")).as("qv"))
  }

  test("annIngestDriftCard: a batch landing in one cell reads as that cell's positive shift") {
    import org.apache.spark.sql.functions.col
    Similarity.buildAnnIndex(q8corpus.filter(col("vec_id") < 60),
      "vec_id", "qv", name = "t_drift_idx",
      nlist = 4, m = 4, ksub = 8, md5Sig = true, numBuckets = 4)
    // batch = ONE index vector repeated under fresh ids: every row
    // assigns to exactly that vector's cell
    val one = q8corpus.filter(col("vec_id") === 7L).select(col("qv"))
    val batch = spark.range(1000, 1005).toDF("vec_id").crossJoin(one)
    val card = Similarity.annIngestDriftCard(spark, "t_drift_idx",
      batch, "vec_id", "qv").collect()
    assert(card.length == 4, "one row per stored cell, zeros included")
    assert(card.map(_.getAs[Long]("n_index")).sum == 60L)
    assert(card.map(_.getAs[Long]("n_batch")).sum == 5L)
    val hot = card.filter(_.getAs[Long]("n_batch") == 5L)
    assert(hot.length == 1, "the whole batch lands in one cell")
    assert(hot.head.getAs[Double]("share_batch") == 1.0)
    assert(hot.head.getAs[Double]("share_shift") > 0.0)
    assert(card.filter(_.getAs[Long]("n_batch") == 0L)
      .forall(_.getAs[Double]("share_shift") <= 0.0))
    // null-id / null-vector rows drop at the door (the index-family
    // liveness contract)
    val withNulls = batch.withColumn("vec_id",
      org.apache.spark.sql.functions.when(col("vec_id") === 1000L,
        org.apache.spark.sql.functions.lit(null)).otherwise(col("vec_id")))
    assert(Similarity.annIngestDriftCard(spark, "t_drift_idx",
      withNulls, "vec_id", "qv")
      .collect().map(_.getAs[Long]("n_batch")).sum == 4L)
  }

  test("annRecallSweep: monotone in nprobe; full-probe over a sub-shortlist corpus reads exactly 1.0") {
    import org.apache.spark.sql.functions.col
    // 40 vectors < the k·shortlistFactor = 50-wide shortlist:
    // probing EVERY cell makes the ADC shortlist exhaustive, so the
    // exact re-rank returns the true top-k and recall@k is exactly
    // 1.0 — a closed-form anchor (with the DEFAULT factor the
    // shortlist is 25 < 39 candidates and ADC truncation correctly
    // costs recall — the first run of this spec measured 0.9)
    val q8 = q8corpus.filter(col("vec_id") < 40)
    Similarity.buildAnnIndex(q8, "vec_id", "qv", name = "t_recall_idx",
      nlist = 4, m = 4, ksub = 8, md5Sig = true, numBuckets = 4)
    val rows = Similarity.annRecallSweep(spark, "t_recall_idx",
      q8.filter(col("vec_id") < 10), "vec_id", "qv",
      k = 5, nprobes = Seq(1, 2, 4), shortlistFactor = 10)
      .collect().map(r => r.getAs[Int]("nprobe") ->
        ((r.getAs[Long]("n_queries"), r.getAs[Long]("hits"),
          r.getAs[Double]("recall")))).toMap
    assert(rows.keySet == Set(1, 2, 4))
    assert(rows.values.forall(_._1 == 10L))
    // recall monotone nondecreasing in probes on a fixed corpus
    assert(rows(1)._3 <= rows(2)._3 && rows(2)._3 <= rows(4)._3,
      rows.toString)
    assert(rows(4)._2 == 50L && rows(4)._3 == 1.0,
      s"full probe must be exact under a sub-shortlist corpus: $rows")
  }

  test("persistent ANN index: indexed top-k equals direct md5IvfPqTopK bit for bit") {
    import org.apache.spark.sql.functions.col
    val q8 = q8corpus
    Similarity.buildAnnIndex(q8, "vec_id", "qv", name = "t_ann_idx",
      nlist = 8, m = 4, ksub = 8, md5Sig = true, numBuckets = 4)
    val queries = q8.filter(col("vec_id") < 10)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("dist2"))).toSet
    val indexed = rows(Similarity.annTopKAgainstIndex(queries, "vec_id",
      "qv", name = "t_ann_idx", k = 5, nprobe = 2))
    val direct = rows(Similarity.md5IvfPqTopK(queries, q8, "vec_id", "qv",
      k = 5, nlist = 8, nprobe = 2, m = 4, ksub = 8, shortlistFactor = 5))
    assert(indexed.nonEmpty && indexed == direct)
  }

  test("ANN index stats: occupancy covers the corpus, empty cells surface, retirement reflects") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val q8 = q8corpus
    val n = q8.count()
    Similarity.buildAnnIndex(q8, "vec_id", "qv", name = "t_ann_stats",
      nlist = 8, m = 4, ksub = 8, md5Sig = true, numBuckets = 4)
    def stats() = Similarity.annIndexStats(spark, "t_ann_stats")
      .collect().map(r => r.getAs[Long]("cell_id") ->
        (r.getAs[Long]("n_vecs"), r.getAs[Double]("share"))).toMap
    val s0 = stats()
    assert(s0.size == 8, "one row per centroid, empty cells included")
    assert(s0.values.map(_._1).sum == n, "occupancy must cover the corpus")
    assert(math.abs(s0.values.map(_._2).sum - 1.0) < 0.01)
    // retiring a vector moves exactly its cell's count down by one
    val someId = q8.select(col("vec_id")).head().getLong(0)
    Similarity.retireFromAnnIndex(Seq(someId).toDF("vec_id"), "vec_id",
      "t_ann_stats")
    val s1 = stats()
    assert(s1.values.map(_._1).sum == n - 1)
    assert(s0.count { case (c, (v, _)) => s1(c)._1 == v - 1 } == 1 &&
      s0.count { case (c, (v, _)) => s1(c)._1 == v } == 7,
      s"retirement must move one cell by one: $s0 -> $s1")
  }


  test("residual IVFPQ: production encode shape on clustered data — both variants serve; recall comparison recorded") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // 8 well-separated cluster centers + small id-keyed offsets:
    // the regime residual coding exists for (raw codes re-describe
    // the cluster structure; residual codes spend all resolution on
    // the offsets). dim 64, integer-valued floats throughout.
    def vec(i: Long): Seq[Float] = {
      val c = (i % 8).toInt
      Seq.tabulate(64)(j =>
        (if (j / 8 == c) 200f else 0f) +
          (((i * 7 + j * 3) % 5) - 2).toFloat)
    }
    val corpus = (0L until 256L).map(i => (i, vec(i))).toDF("vec_id", "qv")
    val queries = corpus.filter(col("vec_id") < 32)
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val truth = Similarity.bruteForceTopK(queries, corpus, "vec_id",
        "qv", k = 5).select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (truth & got).size.toDouble / truth.size
    }
    val raw = recallOf(Similarity.md5IvfPqTopK(queries, corpus,
      "vec_id", "qv", k = 5, nlist = 8, nprobe = 2, m = 4, ksub = 8))
    val res = recallOf(Similarity.md5IvfPqResidualTopK(queries, corpus,
      "vec_id", "qv", k = 5, nlist = 8, nprobe = 2, m = 4, ksub = 8,
      shortlistFactor = 5))
    info(s"recall raw=$raw residual=$res")
    // NOTE, honestly recorded: on THIS tiny synthetic (32 per
    // cluster, 25-deep shortlist, exact re-rank) the raw path's
    // within-cell ADC ties are rescued wholesale by the refine
    // stage, so raw reads 1.0 and residual 0.8 — shortlist depth
    // dominates codebook quality at this scale, which is exactly
    // what d123's refine-depth card says. The residual variant's
    // claim is CORRECTNESS of the production encode shape (the d136
    // oracle proves it bit for bit); which coding wins recall is a
    // corpus property, not an invariant to assert.
    assert(res > 0.5 && res <= 1.0, s"residual recall out of range: $res")
    assert(raw > 0.5 && raw <= 1.0, s"raw recall out of range: $raw")
  }

  test("ANN index retirement: retired vectors vanish from serving; the quantizer stays") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val q8 = q8corpus
    Similarity.buildAnnIndex(q8, "vec_id", "qv", name = "t_ann_retire",
      nlist = 8, m = 4, ksub = 8, md5Sig = true, numBuckets = 4)
    val queries = q8.filter(col("vec_id") === 0)
    def serve() = Similarity.annTopKAgainstIndex(queries, "vec_id",
      "qv", name = "t_ann_retire", k = 5, nprobe = 2)
      .collect().map(_.getAs[Long]("neighbor_id")).toSeq
    val before = serve()
    assert(before.size == 5)
    val gone = before.head // retire the serving top-1
    Similarity.retireFromAnnIndex(Seq(gone).toDF("vec_id"), "vec_id",
      "t_ann_retire")
    val after = serve()
    assert(!after.contains(gone), s"retired vector $gone still served")
    // the rest of the ranking is intact: dropping one neighbor
    // preserves the relative order of the others (exact re-rank)
    assert(after.take(4) == before.filter(_ != gone).take(4),
      s"ranking disturbed: $before -> $after")
    assert(after.size == 5, s"k no longer filled: $after")
  }

  test("persistent ANN index: single-query serve prunes the bucketed scan to probed buckets") {
    import org.apache.spark.sql.functions.col
    val q8 = q8corpus
    Similarity.buildAnnIndex(q8, "vec_id", "qv", name = "t_ann_prune",
      nlist = 8, m = 4, ksub = 8, md5Sig = true, numBuckets = 4)
    val served = Similarity.annTopKAgainstIndex(
      q8.filter(col("vec_id") === 0), "vec_id", "qv",
      name = "t_ann_prune", k = 5, nprobe = 2)
    val plan = served.queryExecution.executedPlan.toString
    // 2 probed cells land in at most 2 of the 4 buckets; the scan
    // must report bucket pruning, never a full-index read
    val sel = "SelectedBucketsCount: (\\d+) out of 4".r
      .findFirstMatchIn(plan)
    assert(sel.nonEmpty, s"no bucket pruning in plan:\n${plan.take(3000)}")
    assert(sel.get.group(1).toInt <= 2, plan.take(3000))
    assert(served.count() == 5)
  }

  test("range search: exact within probed cells, radius-monotone, bucket-pruned, empty is valid") {
    import org.apache.spark.sql.functions.col
    val q8 = q8corpus
    Similarity.buildAnnIndex(q8, "vec_id", "qv", name = "t_ann_range",
      nlist = 8, m = 4, ksub = 8, md5Sig = true, numBuckets = 4)
    val queries = q8.filter(col("vec_id") < 5)
    def rows(r2: Double) = Similarity.annRangeAgainstIndex(
      queries, "vec_id", "qv", name = "t_ann_range",
      radius2 = r2, nprobe = 2).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
        -> r.getAs[Double]("dist2")).toMap
    val r1 = rows(200000.0)
    assert(r1.nonEmpty, "expected some in-range neighbors")
    // every reported distance is genuinely exact squared L2 and
    // within the radius — recomputed from the raw vectors
    val vecs = q8.collect().map(r =>
      r.getAs[Long]("vec_id") -> r.getSeq[Float](1).toArray).toMap
    r1.foreach { case ((q, n), d2) =>
      val (a, b) = (vecs(q), vecs(n))
      val exact = a.zip(b).map { case (x, y) =>
        (x - y).toDouble * (x - y) }.sum
      assert(math.abs(exact - d2) < 1e-6, s"($q,$n): $exact vs $d2")
      assert(d2 <= 200000.0 && q != n)
    }
    // radius monotonicity: a smaller radius returns exactly the
    // subset within it
    val r0 = rows(120000.0)
    assert(r0 == r1.filter(_._2 <= 120000.0))
    // a radius below every pair distance returns EMPTY — a valid
    // answer, not an error
    assert(rows(1.0).isEmpty)
    // the probed-cell literal reaches the scan (file/row-group
    // pruning on the cell-bucketed files; a bare range projection
    // has no distribution requirement, so Catalyst may drop the
    // bucketed-scan FORM — the operator scaladoc documents it — but
    // the pushed IN filter must always be there, and composing into
    // an aggregate restores SelectedBucketsCount like top-k)
    val plan = Similarity.annRangeAgainstIndex(
      q8.filter(col("vec_id") === 0), "vec_id", "qv",
      name = "t_ann_range", radius2 = 200000.0, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert("PushedFilters: \\[In\\(cell_id".r.findFirstIn(plan).nonEmpty,
      s"probed-cell filter not pushed:\n${plan.take(3000)}")
    val agg = Similarity.annRangeAgainstIndex(
      q8.filter(col("vec_id") === 0), "vec_id", "qv",
      name = "t_ann_range", radius2 = 200000.0, nprobe = 2)
      .groupBy(col("query_id"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)))
      .queryExecution.executedPlan.toString
    val sel = "SelectedBucketsCount: (\\d+) out of 4".r
      .findFirstMatchIn(agg)
    assert(sel.nonEmpty, s"no bucket pruning under the agg:\n${agg.take(3000)}")
    assert(sel.get.group(1).toInt <= 2, agg.take(3000))
  }

  test("persistent ANN index append: new vectors encode with stored codebooks and become findable") {
    import org.apache.spark.sql.functions.col
    val q8 = q8corpus
    Similarity.buildAnnIndex(q8, "vec_id", "qv", name = "t_ann_append",
      nlist = 8, m = 4, ksub = 8, md5Sig = true, numBuckets = 4)
    val query = q8.filter(col("vec_id") === 0)
    // plant an exact twin of the query vector under a fresh id: after
    // the append it must serve as the rank-1 neighbor at distance 0
    val twin = query.select((col("vec_id") + 100000L).as("vec_id"),
      col("qv"))
    Similarity.appendToAnnIndex(twin, "vec_id", "qv", name = "t_ann_append")
    val top = Similarity.annTopKAgainstIndex(query, "vec_id", "qv",
      name = "t_ann_append", k = 3, nprobe = 2).collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(top.head.getAs[Long]("neighbor_id") == 100000L, top.mkString("; "))
    assert(top.head.getAs[Double]("dist2") == 0.0)
  }

  test("ANN index rebalance: skewed occupancy flattens, codes stay bit-valid, assignments match the new centroids, serving finds the planted twin") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val name = "t_ann_rebal"
    // build corpus: 32 vectors huddled near the origin — every cell
    // seed (md5-first-16 of the BUILD set) lands in the huddle
    def nearVec(i: Long): Seq[Float] =
      Seq((i % 3).toFloat, ((i / 3) % 3).toFloat, 0f, 0f, 0f, 0f, 0f, 0f)
    // appended corpus: 64 far-away spread vectors (ids 100/101 are an
    // identical planted twin) — against huddle-trained cells they
    // pile into a handful of cells, the occupancy drift a growing
    // index accretes
    def farVec(j: Long): Seq[Float] = {
      val b = if (j == 101L) 100L else j
      Seq(500f + 7f * (b % 8), 500f + 5f * (b % 5), 400f + (b % 11),
        300f + (b % 13), (b % 17).toFloat, 0f, 0f, 0f)
    }
    val build = (0L until 32L).map(i => (i, nearVec(i))).toDF("vec_id", "qv")
    val appended = (100L until 164L).map(j => (j, farVec(j)))
      .toDF("vec_id", "qv")
    Similarity.buildAnnIndex(build, "vec_id", "qv", name = name,
      nlist = 16, m = 2, ksub = 4, md5Sig = true, numBuckets = 4)
    Similarity.appendToAnnIndex(appended, "vec_id", "qv", name)
    def stats(): Map[Long, Long] =
      Similarity.annIndexStats(spark, name).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def codes(): Map[Long, Seq[Int]] =
      spark.table(s"${name}_vectors").select(col("vec_id"), col("codes"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    val statsBefore = stats()
    val codesBefore = codes()
    assert(statsBefore.values.sum == 96L)
    Similarity.rebalanceAnnIndex(spark, name)
    val statsAfter = stats()
    // occupancy flattens: the far majority now seeds most cells
    assert(statsAfter.values.sum == 96L, "rebalance lost vectors")
    assert(statsAfter.values.max < statsBefore.values.max,
      s"max occupancy did not flatten: ${statsBefore.values.max} -> " +
        s"${statsAfter.values.max}")
    assert(statsAfter.values.count(_ > 0) > statsBefore.values.count(_ > 0),
      "rebalance did not reduce empty cells")
    // codes are cell-independent and must be bit-identical (the PQ
    // book does not retrain)
    assert(codes() == codesBefore, "rebalance must not touch codes")
    // every stored assignment matches the NEW centroids (driver-side
    // argmin re-derivation; int8-scale whole numbers are exact in
    // double, ties break by cell_id as in l2CellStructs)
    val cents = spark.table(s"${name}_cents").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toIndexedSeq)
      .sortBy(_._1)
    val rows = spark.table(s"${name}_vectors")
      .select(col("vec_id"), col("cell_id"), col("vec")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2)))
    rows.foreach { case (vid, cid, v) =>
      val best = cents.map { case (c, cv) =>
        val d2 = cv.zip(v).map { case (a, b) =>
          (a.toDouble - b.toDouble) * (a.toDouble - b.toDouble) }.sum
        (d2, c)
      }.min
      assert(best._2 == cid,
        s"vec $vid assigned to $cid but nearest staged cent is $best")
    }
    // serving over the rebalanced index finds the planted twin
    val top = Similarity.annTopKAgainstIndex(
      Seq((100L, farVec(100L))).toDF("vec_id", "qv"), "vec_id", "qv",
      name = name, k = 3, nprobe = 4).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(top.nonEmpty && top.head._1 == 1 && top.head._2 == 101L &&
      top.head._3 == 0.0, s"twin not served: ${top.toSeq}")
  }

  test("ANN index rebuild: erases build history — bit-equal to a fresh build on the same contents, codes re-encoded") {
    import org.apache.spark.sql.functions.col
    val q8 = q8corpus.filter(col("vec_id") < 60).localCheckpoint(true)
    // drifted index: built on one half, appended with the other
    Similarity.buildAnnIndex(q8.filter(col("vec_id") % 2 === 0),
      "vec_id", "qv", name = "t_ann_rebuild",
      nlist = 8, m = 4, ksub = 8, md5Sig = true, numBuckets = 4)
    Similarity.appendToAnnIndex(q8.filter(col("vec_id") % 2 =!= 0),
      "vec_id", "qv", "t_ann_rebuild")
    val driftedCodes = spark.table("t_ann_rebuild_vectors")
      .select(col("vec_id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    Similarity.rebuildAnnIndex(spark, "t_ann_rebuild")
    // reference: a fresh build over the identical vector set
    Similarity.buildAnnIndex(q8, "vec_id", "qv", name = "t_ann_fresh",
      nlist = 8, m = 4, ksub = 8, md5Sig = true, numBuckets = 4)
    def table(n: String): Set[(Long, Long, List[Int], List[Float])] =
      spark.table(s"${n}_vectors").collect().map(r => (r.getLong(0),
        r.getLong(1), r.getSeq[Int](2).toList,
        r.getSeq[Float](3).toList)).toSet
    assert(table("t_ann_rebuild") == table("t_ann_fresh"),
      "rebuild must equal a fresh build row for row")
    def side(n: String, t: String): Set[String] =
      spark.table(s"$n$t").collect().map(_.toString).toSet
    assert(side("t_ann_rebuild", "_cents") == side("t_ann_fresh", "_cents"))
    assert(side("t_ann_rebuild", "_book") == side("t_ann_fresh", "_book"))
    // and the codes genuinely changed (the book retrained — this is
    // what distinguishes rebuild from rebalance)
    val rebuiltCodes = spark.table("t_ann_rebuild_vectors")
      .select(col("vec_id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    assert(rebuiltCodes != driftedCodes,
      "a rebuild over a drifted book should re-encode at least one code")
    // staging artifacts are gone
    assert(!spark.catalog.tableExists("t_ann_rebuild_cents_stage") &&
      !spark.catalog.tableExists("t_ann_rebuild_book_stage"))
    // serving agrees between the two indexes
    val q = q8.filter(col("vec_id") < 5)
    def serve(n: String) = Similarity.annTopKAgainstIndex(q, "vec_id",
      "qv", name = n, k = 5, nprobe = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(serve("t_ann_rebuild") == serve("t_ann_fresh"))
  }

  test("ANN index rebalance crash windows: a pre-marker stage drops; a post-marker stage rolls FORWARD across a restart") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val name = "t_ann_rebal_crash"
    val marker = s"${name.toLowerCase}__rebalance_pending"
    val q8 = q8corpus.filter(col("vec_id") < 40)
    Similarity.buildAnnIndex(q8, "vec_id", "qv", name = name,
      nlist = 8, m = 4, ksub = 8, md5Sig = true, numBuckets = 4)
    val centsBefore = spark.table(s"${name}_cents").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toList).toMap
    // ---- window 1: crash BEFORE the marker — staged centroids never
    // became the truth; recovery must drop them and leave the live
    // index untouched
    graft.sources.Bucketing.writeTable(
      Seq((999L, Seq.fill(64)(1f))).toDF("cell_id", "cvec"),
      s"${name}_cents_stage")
    Similarity.rebalanceAnnIndex(spark, name) // entry recovery runs first
    assert(!spark.catalog.tableExists(s"${name}_cents_stage"),
      "pre-marker stage must be dropped")
    // (the rebalance itself then ran: contents == build corpus, so
    // md5-order cents are unchanged)
    assert(spark.table(s"${name}_cents").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toList).toMap
      == centsBefore, "identical-contents rebalance must be a fixpoint")
    // ---- window 2: crash AFTER the marker — the staged centroids
    // are the declared truth; a fresh session's open() must roll
    // forward: promote them and rewrite every assignment
    val staged = centsBefore.toSeq.sortBy(_._1)
      .map { case (cid, cv) => (cid, cv.map(x => x + 2f)) }
    graft.sources.Bucketing.writeTable(
      staged.toDF("cell_id", "cvec"), s"${name}_cents_stage")
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
      Similarity.openAnnIndex(s2, name)
      assert(!graft.sources.Bucketing.markerExists(s2, marker),
        "roll-forward must clear the marker")
      assert(!s2.catalog.tableExists(s"${name}_cents_stage"),
        "roll-forward must clear the stage")
      val centsAfter = s2.table(s"${name}_cents").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toList).toMap
      assert(centsAfter == staged.toMap,
        "staged centroids must have been promoted")
      // every assignment was rewritten against the PROMOTED centroids
      val cents = centsAfter.toSeq.sortBy(_._1)
      s2.table(s"${name}_vectors")
        .select(col("vec_id"), col("cell_id"), col("vec")).collect()
        .foreach { r =>
          val v = r.getSeq[Float](2)
          val best = cents.map { case (c, cv) =>
            (cv.zip(v).map { case (a, b) =>
              (a.toDouble - b.toDouble) * (a.toDouble - b.toDouble) }.sum, c)
          }.min
          assert(best._2 == r.getLong(1),
            s"vec ${r.getLong(0)} not reassigned to the promoted cents")
        }
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(old)
      org.apache.spark.sql.SparkSession.setActiveSession(old)
    }
  }

  test("persistent ANN index survives a restart: openAnnIndex re-registers, serve unchanged") {
    import org.apache.spark.sql.functions.col
    val q8 = q8corpus
    Similarity.buildAnnIndex(q8, "vec_id", "qv", name = "t_ann_restart",
      nlist = 8, m = 4, ksub = 8, md5Sig = true, numBuckets = 4)
    val queries = q8.filter(col("vec_id") < 5)
    val before = Similarity.annTopKAgainstIndex(queries, "vec_id", "qv",
      name = "t_ann_restart", k = 5, nprobe = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    // brand-new session (fresh in-memory catalog) over the same
    // warehouse — the DedupSpec restart discipline
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
      assert(!s2.catalog.tableExists("t_ann_restart_vectors"),
        "restart simulation failed: catalog still knows the index")
      Similarity.openAnnIndex(s2, "t_ann_restart")
      val q8b = Tables.embeddings(s2, TestSpark.sf).select(col("vec_id"),
        graft.functions.SketchFunctions.quantizeInt8Floats(
          col("embedding")).as("qv"))
      val after = Similarity.annTopKAgainstIndex(
        q8b.filter(col("vec_id") < 5), "vec_id", "qv",
        name = "t_ann_restart", k = 5, nprobe = 2).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(after == before)
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(old)
      org.apache.spark.sql.SparkSession.setActiveSession(old)
    }
  }
}
