package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Retrieval, Sampling, TextAnalysis}

/** Property checks for the round-13 session-3 curation additions:
  * BM25 ranked retrieval, URL canonicalization + dedup, the
  * mixture-matching sampler, and the Naive-Bayes classifier.
  */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // ---------------------------------------------------------- BM25

  test("bm25TopK matches the hand formula, ranks, and cuts at k") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a"), // tf(a)=2, dl=3
      (2L, "b c"),   // tf(c)=1, dl=2
      (3L, "c c c"), // tf(c)=3, dl=3
      (4L, "b b b")  // no query term → absent
    ).toDF("doc_id", "text")
    val res = Retrieval.bm25TopK(docs, "doc_id", "text",
      queryTerms = Seq("a", "c"), topK = 10, k1 = 1.5, b = 0.75)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_terms"), r.getAs[Double]("bm25")))

    // independent re-derivation of the formula
    val n = 4.0
    val avgdl = (3 + 2 + 3 + 3) / 4.0
    def idf(df: Int) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def w(df: Int, tf: Long, dl: Long) =
      idf(df) * (tf * 2.5) / (tf + 1.5 * (0.25 + 0.75 * dl / avgdl))
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp = Map(
      1L -> (1L, r4(w(1, 2, 3))),
      2L -> (1L, r4(w(2, 1, 2))),
      3L -> (1L, r4(w(2, 3, 3))))
    assert(res.toMap == exp, s"got ${res.toMap}, want $exp")
    // ranked by score desc
    assert(res.map(_._2._2).sliding(2).forall(p => p(0) >= p(1)))
    // the cut honors (score desc, doc_id)
    val top1 = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("a", "c"), topK = 1, k1 = 1.5, b = 0.75)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(top1 == Seq(res.maxBy(r => (r._2._2, -r._1))._1))
  }

  test("bm25TopK: multi-term docs sum per-term scores; absent query terms contribute nothing") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y"),
      (2L, "x z z")
    ).toDF("doc_id", "text")
    val res = Retrieval.bm25TopK(docs, "doc_id", "text",
      queryTerms = Seq("x", "z", "nosuchterm"), topK = 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("n_terms")).toMap
    // doc 2 matched two query terms, doc 1 one; the phantom term
    // matched nothing and poisoned nothing (no NaN/zero-df row)
    assert(res == Map(1L -> 1L, 2L -> 2L))
  }

  test("tfidfKeywords: hand-computed scores, rank order, term tie-break, topK cut") {
    import spark.implicits._
    import graft.operators.Retrieval
    val docs = Seq(
      (1L, "alpha alpha beta shared"),
      (2L, "beta gamma shared"),
      (3L, "shared shared shared")
    ).toDF("doc_id", "text")
    val res = Retrieval.tfidfKeywords(docs, "doc_id", "text", topK = 2)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rank")) ->
        (r.getAs[String]("term"), r.getAs[Double]("score"))).toMap
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def s(tf: Long, df: Long) = r4(tf * math.log(3.0 / df))
    // doc 1: alpha 2·ln(3) beats beta 1·ln(1.5); shared idf 0
    assert(res((1L, 1)) == ("alpha", s(2, 1)))
    assert(res((1L, 2)) == ("beta", s(1, 2)))
    // doc 2: beta and gamma — gamma 1·ln(3) > beta 1·ln(1.5)
    assert(res((2L, 1)) == ("gamma", s(1, 1)))
    assert(res((2L, 2)) == ("beta", s(1, 2)))
    // doc 3: only the ubiquitous term → one row, score 0
    assert(res((3L, 1)) == ("shared", 0.0))
    assert(!res.contains((3L, 2)), "no phantom rank rows")
    // tie-break: equal scores rank by term ascending
    val tied = Retrieval.tfidfKeywords(
      Seq((9L, "zz aa")).toDF("doc_id", "text"), "doc_id", "text", 2)
      .collect().map(r => r.getAs[Int]("rank") -> r.getAs[String]("term"))
      .toMap
    assert(tied == Map(1 -> "aa", 2 -> "zz"))
  }

  // --------------------------------------- URL canonicalization

  private def canon1(u: String): String = {
    import spark.implicits._
    Seq(u).toDF("u")
      .select(TextAnalysis.canonicalizeUrl(col("u")).as("c"))
      .head().getString(0)
  }

  test("canonicalizeUrl applies each rule and composes them") {
    // every rule at once
    assert(canon1("HTTPS://WWW.Ex.COM:443/a/B/?b=2&utm_source=x&a=1#frag")
      == "https://www.ex.com/a/B?a=1&b=2")
    // scheme+host lowered, path case preserved
    assert(canon1("HTTP://HoSt.CoM/PaTh") == "http://host.com/PaTh")
    // default ports dropped per scheme; non-default kept
    assert(canon1("http://h:80/p") == "http://h/p")
    assert(canon1("https://h:443/p") == "https://h/p")
    assert(canon1("http://h:443/p") == "http://h:443/p")
    assert(canon1("http://h:8080/p") == "http://h:8080/p")
    // trailing slashes (including a bare "/") stripped
    assert(canon1("https://h/p///") == "https://h/p")
    assert(canon1("https://h/") == "https://h")
    // tracking params dropped, rest sorted, empty query dropped
    assert(canon1("https://h/p?utm_campaign=z&gclid=1&fbclid=2&ref=r")
      == "https://h/p")
    assert(canon1("https://h/p?z=1&a=2&m=3") == "https://h/p?a=2&m=3&z=1")
    // fragment dropped even with no query
    assert(canon1("https://h/p#x") == "https://h/p")
  }

  test("canonicalizeUrl is idempotent") {
    val urls = Seq(
      "HTTPS://WWW.Ex.COM:443/a/B/?b=2&utm_source=x&a=1#frag",
      "http://h:8080/p?z=1&a=2", "https://h/", "http://h/p")
    urls.foreach { u =>
      val once = canon1(u)
      assert(canon1(once) == once, s"not idempotent for $u → $once")
    }
  }

  test("urlDedup: variants of one resource collapse to the min-id keeper") {
    import spark.implicits._
    val docs = Seq(
      (1L, "https://a.com/x"),
      (2L, "HTTPS://A.COM:443/x/?utm_source=f#top"),
      (3L, "https://a.com/x?p=1"), // different query → different resource
      (4L, "http://b.org/y"),
      (5L, "http://B.ORG:80/y")
    ).toDF("doc_id", "url")
    val res = TextAnalysis.urlDedup(docs, "doc_id", "url")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("canon_url"), r.getAs[Boolean]("keeper"))).toMap
    assert(res(1L) == ("https://a.com/x", true))
    assert(res(2L) == ("https://a.com/x", false))
    assert(res(3L) == ("https://a.com/x?p=1", true))
    assert(res(4L) == ("http://b.org/y", true))
    assert(res(5L) == ("http://b.org/y", false))
  }

  test("urlBlocklistGate: suffix match blocks subdomains, exact entry blocks only itself") {
    import spark.implicits._
    val docs = Seq(
      (1L, "https://www.bad.com/x"),   // subdomain of blocked bad.com
      (2L, "https://bad.com/y"),       // blocked domain itself
      (3L, "https://notbad.com/z"),    // NOT a dot-boundary suffix
      (4L, "https://www.exact.org/a"), // exact-host entry
      (5L, "https://sub.exact.org/b"), // sibling host — not blocked
      (6L, "https://fine.net/c")
    ).toDF("doc_id", "url")
    val bl = Seq("bad.com", "www.exact.org").toDF("domain")
    val res = TextAnalysis.urlBlocklistGate(docs, "doc_id", "url",
      bl, "domain")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("blocked"), r.getAs[String]("blocked_by")))).toMap
    assert(res(1L) == ((true, "bad.com")))
    assert(res(2L) == ((true, "bad.com")))
    assert(res(3L) == ((false, null)))
    assert(res(4L) == ((true, "www.exact.org")))
    assert(res(5L) == ((false, null)))
    assert(res(6L) == ((false, null)))
  }

  // ------------------------------------------- mixture sampler

  test("mixtureSample: integer allowances, md5-priority prefix cut, invariance") {
    import spark.implicits._
    // two strata, raw weights 1 (A) and 2 (B); budget 30 →
    // allowance(A) = 10, allowance(B) = 20
    val docs = (0L until 40L).map { i =>
      val s = if (i % 2 == 0) "A" else "B"
      (i, s, "w " * 4)
    }.toDF("doc_id", "stratum", "text")
    val w = when(col("stratum") === "A", 1).otherwise(2)
    val tk = size(Dedup.tokens(col("text"))).cast("long")
    val res = Sampling.mixtureSample(docs, "doc_id", "stratum",
      tokens = tk, rawWeight = w, budget = 30L)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("stratum"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("start_off")))

    // reference: per-stratum (md5Hash60 desc, id) prefix cut, derived
    // independently with the same hash expression
    val pri = docs.select(col("doc_id"), col("stratum"),
      Dedup.md5Hash60(concat(lit("mix|"), col("doc_id").cast("string")))
        .as("p"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def expectFor(s: String, allow: Long): Seq[(Long, Long)] = {
      var acc = 0L
      pri.filter(_._2 == s).sortBy(t => (-t._3, t._1)).flatMap {
        case (id, _, _) =>
          val r = if (acc + 4 <= allow) Some(id -> acc) else None
          acc += 4
          r
      }.toSeq
    }
    val expA = expectFor("A", 10) // 2 docs of 4 tokens fit in 10
    val expB = expectFor("B", 20) // 5 docs fit in 20
    assert(res.filter(_._2 == "A").map(t => (t._1, t._4)).sorted.toSeq ==
      expA.sorted.toSeq)
    assert(res.filter(_._2 == "B").map(t => (t._1, t._4)).sorted.toSeq ==
      expB.sorted.toSeq)
    assert(res.forall(_._3 == 4L))
    // per-stratum kept token mass respects the integer allowance
    assert(res.filter(_._2 == "A").map(_._3).sum <= 10)
    assert(res.filter(_._2 == "B").map(_._3).sum <= 20)

    // partition-count invariance (the two-phase prefix sum is layout-
    // pinned): same kept set and offsets at any partitioning
    val res7 = Sampling.mixtureSample(docs, "doc_id", "stratum",
      tokens = tk, rawWeight = w, budget = 30L, partitions = 7)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("start_off")))
    assert(res7.sorted.toSeq == res.map(t => (t._1, t._4)).sorted.toSeq)
  }

  test("mixtureEpochs: whole epochs + remainder prefix, exact integer budget accounting") {
    import spark.implicits._
    // A: 3 docs × 4 tokens = 12; B: 2 docs × 4 = 8; equal weights,
    // budget 30 → allowance 15 each.
    // A: epochs 15/12 = 1, rem 3 → no 4-token doc fits → all 1 copy.
    // B: epochs 15/8 = 1, rem 7 → the highest-priority doc fits → 2.
    val docs = Seq(
      (1L, "A"), (2L, "A"), (3L, "A"), (10L, "B"), (11L, "B")
    ).map { case (i, s) => (i, s, "w w w w") }
      .toDF("doc_id", "stratum", "text")
    val tk = size(Dedup.tokens(col("text"))).cast("long")
    val res = Sampling.mixtureEpochs(docs, "doc_id", "stratum",
      tokens = tk, rawWeight = lit(1), budget = 30L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("stratum"), r.getAs[Long]("n_copies"))).toMap
    assert(res.filter(_._2._1 == "A").values.forall(_._2 == 1L),
      s"A must get exactly one epoch: $res")
    // which B doc doubles is the md5-priority argmax — derive it
    val bTop = docs.filter(col("stratum") === "B")
      .select(col("doc_id"),
        Dedup.md5Hash60(concat(lit("mix|"), col("doc_id").cast("string")))
          .as("p"))
      .collect().maxBy(r => (r.getLong(1), -r.getLong(0))).getLong(0)
    assert(res(bTop) == ("B", 2L), s"remainder must fill by priority: $res")
    assert(res.filter(t => t._2._1 == "B" && t._1 != bTop)
      .values.forall(_._2 == 1L))
    // exact accounting: Σ copies·tokens <= allowance, per stratum
    Seq("A", "B").foreach { s =>
      val used = res.filter(_._2._1 == s).values.map(_._2 * 4).sum
      assert(used <= 15, s"stratum $s used $used > 15")
    }
    // composes with upsample for the physical explosion
    val exploded = Sampling.upsample(
      Sampling.mixtureEpochs(docs, "doc_id", "stratum", tk, lit(1), 30L),
      "doc_id", repeats = col("n_copies")).count()
    assert(exploded == res.values.map(_._2).sum)
  }

  test("mixtureSample: inconsistent rawWeight and zero budget fail/empty cleanly") {
    import spark.implicits._
    val docs = Seq((1L, "A", "x y"), (2L, "A", "x y"))
      .toDF("doc_id", "stratum", "text")
    val tk = size(Dedup.tokens(col("text"))).cast("long")
    val e = intercept[IllegalArgumentException] {
      Sampling.mixtureSample(docs, "doc_id", "stratum", tk,
        rawWeight = col("doc_id"), budget = 10L)
    }
    assert(e.getMessage.contains("rawWeight inconsistent"))
    val empty = Sampling.mixtureSample(docs, "doc_id", "stratum", tk,
      rawWeight = lit(1), budget = 0L).count()
    assert(empty == 0L)
  }

  test("mixtureSample: null rawWeight fails loud; zero-token rows drop explicitly") {
    import spark.implicits._
    // a stratum mixing null and non-null weights must not slip the
    // lo==hi consistency guard (min/max ignore nulls), and an
    // all-null stratum must raise the same clear message, not NPE
    val mixed = Seq((1L, "A", "x y", Some(2L)), (2L, "A", "x y", None),
      (3L, "B", "x", Some(1L))).toDF("doc_id", "stratum", "text", "w")
    val tk = size(Dedup.tokens(col("text"))).cast("long")
    val e1 = intercept[IllegalArgumentException] {
      Sampling.mixtureSample(mixed, "doc_id", "stratum", tk,
        rawWeight = col("w"), budget = 10L)
    }
    assert(e1.getMessage.contains("NULL"), e1.getMessage)
    val allNull = Seq((1L, "A", "x y", None: Option[Long]))
      .toDF("doc_id", "stratum", "text", "w")
    val e2 = intercept[IllegalArgumentException] {
      Sampling.mixtureSample(allNull, "doc_id", "stratum", tk,
        rawWeight = col("w"), budget = 10L)
    }
    assert(e2.getMessage.contains("NULL"), e2.getMessage)
    // zero-token rows carry no mass: dropped from the output AND
    // from the stratum totals (one defined behavior, both engines);
    // under mixtureEpochs they can never earn phantom copies
    val withZero = Seq((1L, "A", 0L), (2L, "A", 3L), (3L, "A", 2L))
      .toDF("doc_id", "stratum", "n")
    val got = Sampling.mixtureSample(withZero, "doc_id", "stratum",
      tokens = col("n"), rawWeight = lit(1), budget = 100L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L), s"zero-token row leaked: $got")
    val ep = Sampling.mixtureEpochs(withZero, "doc_id", "stratum",
      tokens = col("n"), rawWeight = lit(1), budget = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(!ep.contains(1L), s"zero-token row earned copies: $ep")
    // epochs = 100 div 5 = 20 for the two massy rows
    assert(ep(2L) == 20L && ep(3L) == 20L, s"epoch arithmetic drifted: $ep")
  }

  test("per-stratum driver pulls raise past MaxStrata instead of building a giant CASE") {
    import spark.implicits._
    val n = Sampling.MaxStrata + 1
    val wide = spark.range(n.toLong)
      .selectExpr("id AS doc_id", "CAST(id AS STRING) AS stratum",
        "2L AS n")
    val e1 = intercept[IllegalArgumentException] {
      Sampling.temperatureSample(wide, "doc_id", "stratum", 0.5)
    }
    assert(e1.getMessage.contains("MaxStrata"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Sampling.mixtureSample(wide, "doc_id", "stratum",
        tokens = col("n"), rawWeight = lit(1), budget = 10L)
    }
    assert(e2.getMessage.contains("MaxStrata"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      Sampling.capPerStratum(wide, "doc_id", "stratum", cap = 1,
        prefilter = true)
    }
    assert(e3.getMessage.contains("MaxStrata"), e3.getMessage)
    // under the bound everything still works
    assert(Sampling.temperatureSample(
      wide.filter(col("doc_id") < 10), "doc_id", "stratum", 1.0)
      .count() == 10L)
  }

  test("hashSplit: weights partition the hash space; membership is corpus-independent; guards fire") {
    import spark.implicits._
    val docs = (1L to 400L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "st")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Sampling.hashSplit(docs, "doc_id", splits, seed = "t")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    assert(got.size == 400, "every non-null-id row gets exactly one split")
    // roughly proportional (expectation ± generous noise at n=400)
    val counts = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > 280 && counts("train") < 360, counts.toString)
    assert(counts.getOrElse("val", 0) > 10 && counts.getOrElse("test", 0) > 10,
      counts.toString)
    // THE property hash mode exists for: membership never depends on
    // the rest of the corpus — a subset assigns identically
    val sub = Sampling.hashSplit(docs.filter($"doc_id" <= 100), "doc_id",
      splits, seed = "t")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    sub.foreach { case (id, sp) => assert(got(id) == sp,
      s"membership of $id changed with corpus size") }
    // a different seed reshuffles
    val re = Sampling.hashSplit(docs, "doc_id", splits, seed = "u")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    assert(re != got, "seed must reshuffle assignments")
    // guards
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(docs, "doc_id", Seq("a" -> 0.5, "a" -> 0.5)) }
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(docs, "doc_id", Seq("a" -> 0.0)) }
    // quantization edge: a non-final cumulative within half a
    // quantum of 1.0 rounds to 65536, whose naive "%04x" rendering
    // is the 5-char "10000" — which sorts BELOW most 4-char hashes
    // and would hand the 0.9999935 split ~1/16 of the corpus. The
    // "g" clamp keeps the big split big.
    val tiny = Sampling.hashSplit(docs, "doc_id",
      Seq("train" -> 0.9999935, "holdout" -> 6.5e-6), seed = "t")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tiny.getOrElse("train", 0L) == 400L,
      s"quantized-to-1.0 threshold inverted the assignment: $tiny")
  }

  test("stratifiedSplit: exact per-stratum counts at the rounded boundaries; partition-invariant") {
    import spark.implicits._
    // three strata with sizes that exercise rounding: 101, 40, 7
    val docs = ((1L to 101L).map((_, "a")) ++ (200L to 239L).map((_, "b")) ++
      (300L to 306L).map((_, "c"))).toDF("doc_id", "st")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    def run(parts: Int) = Sampling.stratifiedSplit(docs, "doc_id", "st",
      splits, seed = "t", partitions = parts)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val got = run(32)
    // disjoint + total
    assert(got.length == 148 && got.map(_._1).distinct.length == 148)
    // exact counts per stratum: boundaries floor(cum*n + 0.5)
    val t = splits.map(_._2).sum
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail.map(_ / t)
    for ((st, n) <- Seq("a" -> 101L, "b" -> 40L, "c" -> 7L)) {
      val b = cums.init.map(c => math.floor(c * n + 0.5).toLong) :+ n
      val exp = b.zip(0L +: b.init).map { case (hi, lo) => hi - lo }
      val cnt = splits.map(_._1).map(sp =>
        got.count(r => r._2 == st && r._3 == sp).toLong)
      assert(cnt == exp, s"stratum $st: got $cnt expected $exp")
    }
    // the partition count must not move a single assignment (the
    // two-phase rank discipline's whole point)
    assert(run(3).sortBy(_._1).toSeq == got.sortBy(_._1).toSeq,
      "assignments drifted with the partition count")
    // exactness beats hashSplit where it should: stratum c (n=7)
    // cuts at floor(0.8·7+0.5)=6 and floor(0.9·7+0.5)=6 — train 6,
    // val 0, test 1 (cumulative rounding assigns the leftover row
    // to the LAST split; the boundaries are the contract, not any
    // per-split rounding intuition)
    val cCounts = splits.map(_._1).map(sp =>
      got.count(r => r._2 == "c" && r._3 == sp))
    assert(cCounts == Seq(6, 0, 1), s"got $cCounts")
  }

  test("rankBuckets: ranked cut per stratum, score-desc via negation, partition-invariant") {
    import spark.implicits._
    // stratum a: 7 docs, scores descending with doc_id so head =
    // lowest ids; a tie on score (ids 3,4) breaks on doc_id.
    // stratum b: 2 docs — boundaries floor(1/3·2+0.5)=1,
    // floor(2/3·2+0.5)=1 → head 1, middle 0, tail 1.
    val docs = (Seq((1L, "a", 9.0), (2L, "a", 8.0), (3L, "a", 7.0),
      (4L, "a", 7.0), (5L, "a", 6.0), (6L, "a", 5.0), (7L, "a", 4.0),
      (10L, "b", 2.0), (11L, "b", 1.0))).toDF("doc_id", "st", "score")
    val buckets = Seq("head" -> 1.0, "middle" -> 1.0, "tail" -> 1.0)
    def run(parts: Int) = Sampling.rankBuckets(docs, "doc_id", "st",
      org.apache.spark.sql.functions.negate(
        org.apache.spark.sql.functions.col("score")),
      buckets, partitions = parts)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val got = run(32)
    val byId = got.map(r => r._1 -> r._3).toMap
    // stratum a (n=7): boundaries floor(7/3+0.5)=2, floor(14/3+0.5)=5
    // → head {1,2}, middle {3,4,5}, tail {6,7}
    assert(Seq(1L, 2L).forall(byId(_) == "head"))
    assert(Seq(3L, 4L, 5L).forall(byId(_) == "middle"))
    assert(Seq(6L, 7L).forall(byId(_) == "tail"))
    assert(byId(10L) == "head" && byId(11L) == "tail")
    assert(run(3).sortBy(_._1).toSeq == got.sortBy(_._1).toSeq,
      "assignments drifted with the partition count")
  }

  test("bm25TopK rejects non-lowercase query terms loudly") {
    import spark.implicits._
    val docs = Seq((1L, "spark shuffles data")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Retrieval.bm25TopK(docs, "doc_id", "text",
        Seq("Spark"), topK = 5)
    }
    assert(e.getMessage.contains("lowercase"), e.getMessage)
  }

  // ------------------------------------------- corpus report card

  test("d78 shape: rollup levels, exact integer-unit avg, distinct content") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "en", "s1", "alpha beta"),
      (2L, "en", "s1", "alpha beta"), // exact dup content
      (3L, "en", "s2", "gamma delta epsilon"),
      (4L, "de", "s1", "zeta eta")
    ).toDF("doc_id", "lang", "source", "text")
      .withColumn("__qi",
        round(TextAnalysis.qualityScore(col("text")) * 10000, 0)
          .cast("long"))
    val rolled = docs.rollup(col("lang"), col("source"))
      .agg(grouping_id().as("lvl"), count(lit(1)).as("n_docs"),
        count_distinct(md5(col("text"))).as("n_distinct"),
        round(sum(col("__qi")).cast("double") /
          (count(lit(1)) * 10000L).cast("double"), 4).as("aq"))
      .collect()
      .map(r => (Option(r.getAs[String]("lang")).getOrElse("·"),
        Option(r.getAs[String]("source")).getOrElse("·"),
        r.getAs[Long]("lvl"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_distinct"))).toSet
    // leaf rows + per-lang subtotals + grand total, dup collapsing
    // only where content repeats
    assert(rolled.contains(("en", "s1", 0L, 2L, 1L)))
    assert(rolled.contains(("en", "s2", 0L, 1L, 1L)))
    assert(rolled.contains(("de", "s1", 0L, 1L, 1L)))
    assert(rolled.contains(("en", "·", 1L, 3L, 2L)))
    assert(rolled.contains(("de", "·", 1L, 1L, 1L)))
    assert(rolled.contains(("·", "·", 3L, 4L, 3L)))
    assert(rolled.size == 6)
  }

  // ------------------------------------------- epoch upsampling

  test("upsample: repeat expansion, 0-drop, deterministic scatter keys, runaway guard") {
    import spark.implicits._
    val docs = Seq((1L, 3), (2L, 1), (3L, 0), (4L, 2))
      .toDF("doc_id", "r")
    val res = Sampling.upsample(docs, "doc_id", repeats = col("r"))
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("copy_idx"), r.getAs[Long]("n_copies"),
        r.getAs[Long]("shuffle_key")))
    // 3 + 1 + 0 + 2 copies; copy_idx dense from 0; n_copies carried
    assert(res.map(t => (t._1, t._2)).toSet ==
      Set((1L, 0L), (1L, 1L), (1L, 2L), (2L, 0L), (4L, 0L), (4L, 1L)))
    assert(res.filter(_._1 == 1L).forall(_._3 == 3L))
    // shuffle keys: all distinct (copies of one doc scatter) and
    // deterministic across runs
    assert(res.map(_._4).distinct.length == res.length)
    val again = Sampling.upsample(docs, "doc_id", repeats = col("r"))
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("copy_idx"), r.getAs[Long]("n_copies"),
        r.getAs[Long]("shuffle_key")))
    assert(again.sortBy(t => (t._1, t._2)).toSeq ==
      res.sortBy(t => (t._1, t._2)).toSeq)
    // a runaway repeat expression fails loudly, never explodes N×
    val e = intercept[Exception] {
      Sampling.upsample(docs, "doc_id", repeats = col("r") * 1000)
        .collect()
    }
    assert(e.getMessage.contains("maxRepeats") ||
      e.getCause != null && e.getCause.getMessage.contains("maxRepeats"))
  }

  // -------------------------------------- Naive-Bayes classifier

  test("nbLogOdds matches hand-computed add-one weights, floor and prior") {
    import spark.implicits._
    val docs = Seq(
      (1L, "good good nice", true),
      (2L, "good stuff", true),
      (3L, "bad awful", false),
      (4L, "bad bad", false),
      (5L, "good bad new", true) // scored only (not in train slice)
    ).toDF("doc_id", "text", "y")
    val res = TextAnalysis.nbLogOdds(docs, "doc_id", "text",
      label = col("y"), trainFilter = col("doc_id") <= 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("log_odds"),
          r.getAs[Boolean]("pred"))).toMap

    // counts: c1 good=3 nice=1 stuff=1; c0 bad=3 awful=1
    // N1=5, N0=4, V=5, D1=D0=2 → prior = 0
    def w(c1: Long, c0: Long) =
      math.log((c1 + 1.0) / 10.0) - math.log((c0 + 1.0) / 9.0)
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val floor = math.log(1.0 / 10.0) - math.log(1.0 / 9.0)
    val exp5 = r4(0.0 + (w(3, 0) + w(0, 3) + 1.0 * floor))
    assert(res(5L)._1 == 3L)
    assert(math.abs(res(5L)._2 - exp5) < 1e-9, s"${res(5L)._2} vs $exp5")
    assert(res(5L)._3 == (exp5 > 0))
    val exp1 = r4(0.0 + (w(3, 0) * 2 + w(1, 0) + 0.0))
    assert(math.abs(res(1L)._2 - exp1) < 1e-9)
    assert(res(1L)._3) // "good good nice" is confidently class 1
    assert(!res(4L)._3) // "bad bad" is confidently class 0
  }

  test("persisted NB model: scores == inline, survives restart, composes with a stream") {
    import spark.implicits._
    val docs = Seq(
      (1L, "good good nice", true),
      (2L, "good stuff", true),
      (3L, "bad awful", false),
      (4L, "bad bad", false),
      (5L, "good bad new", true),
      (6L, "nice stuff here", false)
    ).toDF("doc_id", "text", "y")
    val inline = TextAnalysis.nbLogOdds(docs, "doc_id", "text",
      label = col("y"), trainFilter = col("doc_id") <= 4)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getBoolean(3))).sortBy(_._1).toSeq

    TextAnalysis.trainNbModel(docs, "doc_id", "text",
      label = col("y"), trainFilter = col("doc_id") <= 4,
      name = "t_nb_model")
    def served(s: org.apache.spark.sql.SparkSession) = {
      import s.implicits._
      TextAnalysis.scoreWithNbModel(
        docs.collect().map(r => (r.getLong(0), r.getString(1)))
          .toSeq.toDF("doc_id", "text"),
        "doc_id", "text", "t_nb_model")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2), r.getBoolean(3))).sortBy(_._1).toSeq
    }
    assert(served(spark) == inline,
      "persisted-model scoring drifted from inline train+score")

    // restart: a fresh session + catalog; the model tables survive
    // in the warehouse and openNbModel re-registers them
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
      assert(!s2.catalog.tableExists("t_nb_model_weights"),
        "restart simulation failed: catalog still knows the model")
      TextAnalysis.openNbModel(s2, "t_nb_model")
      assert(served(s2) == inline, "restart re-open drifted")
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(spark)
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }

    // streaming composition: scoring is stateless given the model,
    // so it drops into a foreachBatch loop unchanged
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String)](spark)
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Double, Boolean)]
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= TextAnalysis.scoreWithNbModel(batch, "doc_id", "text",
          "t_nb_model")
          .collect().map(r => (r.getLong(0), r.getDouble(2),
            r.getBoolean(3)))
        ()
      }.start()
    input.addData((5L, "good bad new"), (7L, "good good good"))
    q.processAllAvailable(); q.stop()
    val exp5 = inline.find(_._1 == 5L).get
    assert(got.sortBy(_._1).toSeq.head == ((5L, exp5._3, exp5._4)))
    assert(got.exists(g => g._1 == 7L && g._3)) // all-"good" → class 1
  }

  test("nbLogOdds raises when a train class is empty") {
    import spark.implicits._
    val docs = Seq(
      (1L, "good", true), (2L, "fine", true), (3L, "bad", false)
    ).toDF("doc_id", "text", "y")
    val e = intercept[Exception] {
      TextAnalysis.nbLogOdds(docs, "doc_id", "text",
        label = col("y"), trainFilter = col("doc_id") <= 2).collect()
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("train class is empty") ||
        e.getCause != null &&
        e.getCause.getMessage.contains("train class is empty")))
  }

  test("calibrationReport: hand bins, integer avg_p, cumulative precision/recall sweep") {
    import spark.implicits._
    // σ(-10) ≈ 4.54e-5 → bin 0, p4 = 0; σ(0) = 0.5 → bin 2 of 4;
    // σ(10) ≈ 0.99995 → floor(p·4) = 3 (and the cap keeps p = 1.0
    // in the last bin). One null score and one null label drop.
    val scored = Seq(
      (-10.0, Some(false)), (-10.0, Some(true)),
      (0.0, Some(true)), (0.0, Some(false)), (0.0, Some(true)),
      (10.0, Some(true)),
      (0.0, None)
    ).toDF("log_odds", "y")
      .unionByName(Seq((Option.empty[Double], Some(true)))
        .toDF("log_odds", "y"))
    val rows = TextAnalysis.calibrationReport(scored, "log_odds", "y",
      bins = 4)
      .orderBy(col("bin"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5), r.getLong(6),
        r.getDouble(7), r.getDouble(8)))
    assert(rows.toSeq == Seq(
      // bin, n, n_pos, pos_rate, avg_p, cum_n, cum_pos, precision, recall
      (0L, 2L, 1L, 0.5, 0.0, 6L, 4L, 0.6667, 1.0),
      (2L, 3L, 2L, 0.6667, 0.5, 4L, 3L, 0.75, 0.75),
      (3L, 1L, 1L, 1.0, 1.0, 1L, 1L, 1.0, 0.25)))
  }

  test("calibrationReport: recall is null when the holdout has no positives") {
    import spark.implicits._
    val scored = Seq((1.0, false), (-1.0, false)).toDF("log_odds", "y")
    val rows = TextAnalysis.calibrationReport(scored, "log_odds", "y",
      bins = 2).collect()
    assert(rows.forall(_.isNullAt(8)) && rows.forall(_.getLong(2) == 0L))
  }

  // ------------------------------------------- hybrid retrieval (r15)

  test("bm25PerQueryRanks agrees with bm25TopK per query and ranks deterministically") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a"), (2L, "b c"), (3L, "c c c"), (4L, "b b b"),
      (5L, "a c b")
    ).toDF("doc_id", "text")
    val queries = Seq(
      (100L, Seq("a", "c")),
      (200L, Seq("b"))
    ).toDF("query_id", "terms")
    val per = Retrieval.bm25PerQueryRanks(docs, "doc_id", "text",
      queries, "query_id", "terms", topK = 10, k1 = 1.5, b = 0.75)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getAs[Int]("rank"))
          .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("bm25")))
          .toSeq
      }
    // each query's ranked list == the single-query front door's
    for ((qid, terms) <- Seq(100L -> Seq("a", "c"), 200L -> Seq("b"))) {
      val solo = Retrieval.bm25TopK(docs, "doc_id", "text",
        queryTerms = terms, topK = 10, k1 = 1.5, b = 0.75)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("bm25"))).toSeq
      assert(per(qid) == solo, s"query $qid")
    }
  }

  test("bm25PerQueryRanks excludeSelf drops the probe doc from its own list") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta"), (2L, "alpha gamma"), (3L, "delta delta")
    ).toDF("doc_id", "text")
    val queries = Seq((1L, Seq("alpha"))).toDF("query_id", "terms")
    val withSelf = Retrieval.bm25PerQueryRanks(docs, "doc_id", "text",
      queries, "query_id", "terms", topK = 10)
      .select("doc_id").as[Long].collect().toSet
    val noSelf = Retrieval.bm25PerQueryRanks(docs, "doc_id", "text",
      queries, "query_id", "terms", topK = 10, excludeSelf = true)
      .select("doc_id").as[Long].collect().toSet
    assert(withSelf == Set(1L, 2L))
    assert(noSelf == Set(2L))
  }

  test("rrfFuse: hand-computed fusion, absent-side zero, doc_id tie-break, topK cut") {
    import spark.implicits._
    // query 7: lex ranks d1=1, d2=2; dense ranks d2=1, d3=2.
    val lex = Seq((7L, 1, 1L), (7L, 2, 2L)).toDF("query_id", "rank", "doc_id")
    val dense = Seq((7L, 1, 2L), (7L, 2, 3L)).toDF("query_id", "rank", "doc_id")
    val res = Retrieval.rrfFuse(lex, dense, k0 = 60, topK = 10)
      .orderBy(col("rank")).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("rrf")))
    // d2: 1/62 + 1/61 = .030524; d1: 1/61 = .016393; d3: 1/62 = .016129
    assert(res.map(t => (t._1, t._2)).toSeq == Seq((1, 2L), (2, 1L), (3, 3L)))
    assert(math.abs(res(0)._3 - math.rint((1.0 / 62 + 1.0 / 61) * 1e6) / 1e6) < 1e-9)
    // tie-break: two docs with the SAME single-leg rank on opposite
    // legs tie exactly in rrf; smaller doc_id wins
    val lexT = Seq((8L, 1, 5L)).toDF("query_id", "rank", "doc_id")
    val denseT = Seq((8L, 1, 4L)).toDF("query_id", "rank", "doc_id")
    val tied = Retrieval.rrfFuse(lexT, denseT, k0 = 60, topK = 10)
      .orderBy(col("rank")).collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(tied == Seq(4L, 5L))
    // topK cut
    val many = (1 to 8).map(i => (9L, i, 100L + i))
      .toDF("query_id", "rank", "doc_id")
    val cut = Retrieval.rrfFuse(many, many.limit(0), k0 = 60, topK = 3)
      .collect()
    assert(cut.length == 3)
  }
}
