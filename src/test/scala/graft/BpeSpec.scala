package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BpeTokenizer

/** Plain-Scala reference spec for the real byte-level BPE tokenizer.
  *
  * The kernel applies merges sequentially in rank order (one
  * left-to-right non-overlapping pass per merge). The reference here
  * is the CLASSIC algorithm — repeatedly find the lowest-rank pair
  * present among adjacent token pairs and merge all its occurrences —
  * implemented independently; agreement on random inputs pins the
  * equivalence argument (a token born at rank r only participates in
  * merges of rank > r).
  */
class BpeSpec extends AnyFunSuite {

  /** Independent classic-BPE reference over byte strings. */
  private def referenceEncode(text: String): Vector[Vector[Byte]] = {
    val mergeRank: Map[(Vector[Byte], Vector[Byte]), Int] =
      BpeTokenizer.merges.zipWithIndex.map { case ((a, b), r) =>
        (a.getBytes("UTF-8").toVector, b.getBytes("UTF-8").toVector) -> r
      }.toMap
    var toks: Vector[Vector[Byte]] =
      text.getBytes("UTF-8").toVector.map(b => Vector(b))
    var done = false
    while (!done) {
      val present = toks.indices.dropRight(1)
        .flatMap(i => mergeRank.get((toks(i), toks(i + 1))))
      if (present.isEmpty) done = true
      else {
        val best = present.min
        val (a, b) = (BpeTokenizer.merges(best)._1.getBytes("UTF-8").toVector,
          BpeTokenizer.merges(best)._2.getBytes("UTF-8").toVector)
        // merge all occurrences left-to-right, non-overlapping
        val out = Vector.newBuilder[Vector[Byte]]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
            out += (a ++ b); i += 2
          } else { out += toks(i); i += 1 }
        }
        toks = out.result()
      }
    }
    toks
  }

  private def kernelTokens(text: String): Vector[Vector[Byte]] = {
    val ids = BpeTokenizer.tokenIds(text.getBytes("UTF-8"))
    ids.toVector.map(id => BpeTokenizer.decode(Array(id)).toVector)
  }

  test("merge table is internally consistent and vocab is well-formed") {
    // object init already validates resolvability/uniqueness — touch
    // it and pin the shape
    assert(BpeTokenizer.vocabSize == 256 + BpeTokenizer.merges.length)
    assert(BpeTokenizer.mergesHex.length == BpeTokenizer.merges.length)
    // every hex side decodes to a whole number of bytes
    BpeTokenizer.mergesHex.foreach { case (a, b) =>
      assert(a.length % 2 == 0 && b.length % 2 == 0)
    }
  }

  test("kernel equals the classic priority-loop reference on English text") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "and that is it for the introduction with all of it",
      "this engine deduplicates training data at scale",
      "aaa bbb the the the and and ing ing",
      "", " ", "x", "  double  spaces  ")
    texts.foreach { t =>
      assert(kernelTokens(t) == referenceEncode(t), s"text: '$t'")
    }
  }

  test("kernel equals the reference on random byte soup (fuzz)") {
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { i =>
      val len = rnd.nextInt(80)
      // mix of common letters, spaces, punctuation, high bytes
      val s = (0 until len).map { _ =>
        rnd.nextInt(4) match {
          case 0 => ('a' + rnd.nextInt(26)).toChar
          case 1 => " theandingof".charAt(rnd.nextInt(12))
          case 2 => ('!' + rnd.nextInt(14)).toChar
          case _ => (0x80 + rnd.nextInt(0x80)).toChar // non-ASCII
        }
      }.mkString
      assert(kernelTokens(s) == referenceEncode(s), s"fuzz #$i: '$s'")
    }
  }

  test("roundtrip is lossless: decode(encode(text)) == text bytes") {
    val rnd = new scala.util.Random(7)
    val texts = Seq("the cat sat on the mat", "ünïcödé bytes stay bytes",
      "", "multi\nline\ttext") ++
      (0 until 50).map(_ => rnd.nextString(rnd.nextInt(60)))
    texts.foreach { t =>
      val ids = BpeTokenizer.tokenIds(t.getBytes("UTF-8"))
      assert(BpeTokenizer.decode(ids).toSeq == t.getBytes("UTF-8").toSeq,
        s"roundtrip broke on '$t'")
    }
  }

  test("canonical serialization matches the oracle's construction rules") {
    def ser(t: String): String = BpeTokenizer.tokenStringKernel(
      org.apache.spark.unsafe.types.UTF8String.fromString(t)).toString
    // empty → ""; each token wrapped in its OWN pipe pair
    assert(ser("") == "")
    // t+h at rank 0, th+e later → one token "the" = hex 746865
    assert(ser("the") == "|746865|")
    // adjacent tokens share no delimiter (the replace-run guarantee)
    assert(ser("qq") == "|71||71|")
    // the r12 regression shape: a run of " a" merges must ALL fire in
    // the string form exactly as in the kernel
    assert(ser(" a a a") == "|2061||2061||2061|", ser(" a a a"))
    // count arithmetic the oracle uses: pipes / 2
    Seq("", "the", "qq", " a a a", "it is the best").foreach { t =>
      assert(ser(t).count(_ == '|') / 2 ==
        BpeTokenizer.tokenCountKernel(
          org.apache.spark.unsafe.types.UTF8String.fromString(t)))
    }
  }

  test("merges actually compress typical English") {
    // ~160 literal merges land ~0.55-0.6 tokens/byte on plain English
    // (a real 50k-merge vocab reaches ~0.25; the pin is that merges
    // FIRE, not a production compression claim)
    val t = "it is the best of times and the worst of times"
    val n = BpeTokenizer.tokenIds(t.getBytes("UTF-8")).length
    assert(n <= t.length * 3 / 5, s"${t.length} bytes -> $n tokens")
  }

  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  test("trainBpe: hand-computed rounds, tie-break, minCount stop, state digests") {
    val spark = TestSpark.spark
    import spark.implicits._
    // doc1 = "aaab" -> [61,61,61,62]; doc2 = "ab" -> [61,62]
    // round 1: pairs (61,61):2 (left-to-right in the aaa run),
    //          (61,62):2 -> count tie, (61,61) wins lexicographically
    // round 2: (61,62):2 wins -> doc1 [6161,6162], doc2 [6162]
    // round 3: best pair count 1 < minCount -> stop at 2 merges
    val out = graft.operators.TextAnalysis.trainBpe(
      Seq((1L, "aaab"), (2L, "ab")).toDF("doc_id", "text"),
      "doc_id", "text", numMerges = 8).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("a"),
        r.getAs[String]("b"), r.getAs[Long]("cnt"),
        r.getAs[Long]("state_xor")))
    assert(out.length == 2, out.mkString("; "))
    assert(out(0) == ((1L, "61", "61", 2L,
      h60("|6161||61||62|") ^ h60("|61||62|"))))
    assert(out(1) == ((2L, "61", "62", 2L,
      h60("|6161||6162|") ^ h60("|6162|"))))
  }

  test("trainBpe: deterministic across runs; learned merges compress the training corpus") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
      .filter(col("doc_id") < 100)
    val a = graft.operators.TextAnalysis
      .trainBpe(docs, "doc_id", "text", numMerges = 4).collect().toSeq
    val b = graft.operators.TextAnalysis
      .trainBpe(docs, "doc_id", "text", numMerges = 4).collect().toSeq
    assert(a.map(_.toSeq) == b.map(_.toSeq))
    assert(a.length == 4)
    // every learned pair must be frequent: counts monotone-ish and >= 2
    val cnts = a.map(_.getAs[Long]("cnt"))
    assert(cnts.forall(_ >= 2L))
  }

  test("bpeTrainingSlice: budget-monotone prefix; equal prefixes train identical merges") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions.col
    val TA = graft.operators.TextAnalysis
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
      .filter(col("doc_id") < 200)
    def sliceIds(budget: Long): Set[Long] =
      TA.bpeTrainingSlice(docs, "doc_id", "text", budget)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val total = docs.select(
      org.apache.spark.sql.functions.sum(
        TA.wsTokenCount(col("text")).cast("long")))
      .collect().head.getLong(0)
    // md5-hash order is a fixed layout: a bigger budget only EXTENDS
    // the prefix, and a budget covering the corpus returns all of it
    val s1 = sliceIds(total / 4)
    val s2 = sliceIds(total / 2)
    val all = sliceIds(total)
    assert(s1.nonEmpty && s1.size < s2.size && s2.size < all.size,
      s"prefix sizes not strictly growing: ${s1.size}/${s2.size}/${all.size}")
    assert(s1.subsetOf(s2) && s2.subsetOf(all),
      "budget slices must be nested prefixes")
    assert(all == docs.filter(col("text").isNotNull)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet,
      "a budget >= the corpus total must return the full corpus")
    // the membership is exactly budgetSelect's prefix cut under the
    // (md5Hash60 DESC, doc_id) layout — re-derived by hand
    val laid = docs.filter(col("text").isNotNull).select(col("doc_id"),
      TA.wsTokenCount(col("text")).cast("long").as("n"),
      graft.operators.Dedup.md5Hash60(col("doc_id").cast("string")).as("pr"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (id, _, pr) => (-pr, id) }
    var off = 0L
    val expected = laid.takeWhile { case (_, n, _) =>
      val in = off + n <= total / 4; if (in) off += n; in
    }.map(_._1).toSet
    assert(s1 == expected, "slice membership drifted from the prefix cut")
    // the D46 contract: any two budgets landing on the SAME prefix
    // train IDENTICAL merge tables (the budget only controls how
    // much text the trainer sees, never reshuffles it)
    val budgetAtPrefix = off // exact token total of the s1 prefix
    val mA = TA.trainBpe(TA.bpeTrainingSlice(docs, "doc_id", "text",
      budgetAtPrefix), "doc_id", "text", numMerges = 3)
      .collect().map(_.toSeq).toSeq
    val mB = TA.trainBpe(TA.bpeTrainingSlice(docs, "doc_id", "text",
      total / 4), "doc_id", "text", numMerges = 3)
      .collect().map(_.toSeq).toSeq
    assert(mA == mB, "same prefix, different merges")
    // and a full-corpus budget trains exactly trainBpe(full corpus)
    val mAll = TA.trainBpe(TA.bpeTrainingSlice(docs, "doc_id", "text",
      total), "doc_id", "text", numMerges = 3).collect().map(_.toSeq).toSeq
    val mDirect = TA.trainBpe(docs, "doc_id", "text", numMerges = 3)
      .collect().map(_.toSeq).toSeq
    assert(mAll == mDirect)
  }
}
