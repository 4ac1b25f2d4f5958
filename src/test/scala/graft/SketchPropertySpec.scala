package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{SketchFunctions, VectorFunctions}

/** Randomized cross-checks (fixed seed): each native expression
  * against a plain-Scala reference implementation. Inputs are built
  * driver-side and evaluated through real Spark plans in one batch
  * per property. */
class SketchPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val rnd = new scala.util.Random(42)

  test("JaccardSortedLong equals set-based Jaccard on random inputs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val cases = (1 to 60).map { i =>
      val a = List.fill(rnd.nextInt(30))(rnd.nextLong() % 50).distinct.sorted
      val b = List.fill(rnd.nextInt(30))(rnd.nextLong() % 50).distinct.sorted
      (i.toLong, a, b)
    }
    val got = cases.toDF("i", "a", "b")
      .select(col("i"), SketchFunctions.jaccardSorted(col("a"), col("b")).as("j"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    cases.foreach { case (i, a, b) =>
      val (sa, sb) = (a.toSet, b.toSet)
      val expected =
        if (sa.isEmpty && sb.isEmpty) 0.0
        else (sa intersect sb).size.toDouble / (sa union sb).size
      assert(math.abs(got(i) - expected) < 1e-12, s"case $i: a=$a b=$b")
    }
  }

  test("TextStats equals the SQL-arithmetic forms on adversarial strings") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val alphabet = "ab .\t\n\r\fthe é世"
    val cases = (1 to 120).map { i =>
      val s =
        if (i <= 4) Seq("", "   ", "\t", " the the ")(i - 1)
        else (0 until rnd.nextInt(60))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      (i.toLong, s)
    }
    // SQL-arithmetic forms — exactly what the DuckDB oracles mirror
    val df = cases.toDF("i", "t").select(col("i"),
      SketchFunctions.textStats(col("t")).as("ts"),
      when(length(trim(col("t"))) === 0, 0)
        .otherwise(size(split(trim(col("t")), "\\s+"))).as("nw_sql"),
      length(regexp_replace(col("t"), " ", "")).as("ns_sql"),
      ((length(concat(lit(" "), lower(col("t")), lit(" "))) -
        length(regexp_replace(concat(lit(" "), lower(col("t")), lit(" ")),
          " the ", ""))) / 5).cast("int").as("st_sql"))
    df.collect().foreach { r =>
      val ts = r.getStruct(1)
      assert(ts.getInt(0) == r.getInt(2),
        s"n_words mismatch on ${cases(r.getLong(0).toInt - 1)._2.replace("\n", "\\n")}")
      assert(ts.getInt(1) == r.getInt(3), s"non_space mismatch case ${r.getLong(0)}")
      assert(ts.getInt(2) == r.getInt(4), s"stop_n mismatch case ${r.getLong(0)}")
    }
  }

  test("FloatVecDot equals scala double fold on random vectors") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val cases = (1 to 60).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 20 - 10),
        Array.fill(16)(rnd.nextFloat() * 20 - 10))
    }
    val got = cases.toDF("i", "a", "b")
      .select(col("i"), VectorFunctions.vecDot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    cases.foreach { case (i, a, b) =>
      val expected = a.zip(b).foldLeft(0.0) { case (s, (x, y)) =>
        s + x.toDouble * y.toDouble
      }
      assert(got(i) == expected, s"case $i")
    }
  }

  test("SimHash64 is order-invariant under token reordering") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val cases = (1 to 40).flatMap { i =>
      val ws = List.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
      Seq((i.toLong * 2, ws), (i.toLong * 2 + 1, rnd.shuffle(ws)))
    }
    val m = cases.toDF("i", "toks")
      .select(col("i"), SketchFunctions.simhash64(col("toks")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1 to 40).foreach { i =>
      assert(m(i.toLong * 2) == m(i.toLong * 2 + 1),
        s"case $i: simhash must be token-order invariant")
    }
  }

  test("round-9 kernels match plain-Scala references on random inputs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def md5Hash60Ref(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      var h = 0L; (0 until 8).foreach(b => h = (h << 8) | (d(b) & 0xFFL))
      h >>> 4
    }
    val words = Vector("a", "bb", "ccc", "déjà", "x1", "longish-token", "")
    val cases = (1 to 60).map { i =>
      (i.toLong, List.fill(rnd.nextInt(12))(words(rnd.nextInt(words.size))))
    }
    val got = cases.toDF("i", "toks").select(col("i"),
      SketchFunctions.wordGrams(col("toks"), 3).as("g"),
      SketchFunctions.md5Simhash60(col("toks")).as("sim"),
      SketchFunctions.md5Minhash30(col("toks"), 8).as("mh"))
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[String](1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          r.getSeq[Long](3)))).toMap
    cases.foreach { case (i, toks) =>
      val (g, sim, mh) = got(i)
      // wordGrams: all positional 3-grams with multiplicity
      val expG = if (toks.size < 3) Nil
        else toks.sliding(3).map(_.mkString(" ")).toList
      assert(g == expG, s"case $i grams: $toks")
      // md5Simhash60: majority vote per bit (2*ones >= n); an EMPTY
      // token array has no votes and yields NULL (every 2·0 >= 0
      // vote would pass, and the all-ones sentinel bucketed empties
      // as near-identical through the SQL function)
      val hs = toks.map(md5Hash60Ref)
      val expSim = if (toks.isEmpty) None else Some((0 until 60).map { b =>
        if (2 * hs.count(h => ((h >> b) & 1L) == 1L) >= toks.size) 1L << b
        else 0L
      }.sum)
      assert(sim == expSim, s"case $i simhash: $toks")
      // md5Minhash30: universal-hash mins over low 30 bits
      val p = graft.functions.SketchKernels.mhPrime
      val expMh = (0 until 8).map { j =>
        val (a, b) = (graft.functions.SketchKernels.mhA(j),
          graft.functions.SketchKernels.mhB(j))
        if (toks.isEmpty) Long.MaxValue
        else toks.map(t => ((md5Hash60Ref(t) & 0x3FFFFFFFL) * a + b) % p).min
      }
      assert(mh == expMh, s"case $i minhash: $toks")
    }
  }

  test("QuantizeInt8Floats bounds, max-hit and zero-vector invariants hold") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val cases = (1 to 60).map { i =>
      (i.toLong, List.fill(rnd.nextInt(16))(
        (rnd.nextFloat() - 0.5f) * rnd.nextInt(1000)))
    }
    val got = cases.toDF("i", "v").select(col("i"),
      SketchFunctions.quantizeInt8Floats(col("v")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    cases.foreach { case (i, v) =>
      val q = got(i)
      assert(q.size == v.size)
      assert(q.forall(x => x == x.toLong.toFloat && x >= -127f && x <= 127f),
        s"case $i: non-integer or out-of-range $q")
      if (v.exists(_ != 0f)) {
        // the max-|v| component must land on ±127
        assert(q.map(math.abs).max == 127f, s"case $i: $v -> $q")
      } else assert(q.forall(_ == 0f))
    }
  }

  test("Winnow fingerprints are distinct, sorted, deterministic") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val cases = (1 to 40).map { i =>
      (i.toLong, List.fill(8 + rnd.nextInt(60))(('a' + rnd.nextInt(26)).toChar).mkString)
    }
    def run() = cases.toDF("i", "t")
      .select(col("i"), SketchFunctions.winnow(col("t"), 8, 4).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val fp1 = run()
    val fp2 = run()
    assert(fp1 == fp2, "winnow must be deterministic")
    fp1.values.foreach { fp =>
      assert(fp.nonEmpty && fp.toSet.size == fp.size && fp == fp.sorted)
    }
  }

  test("b20b HLL merge claims hold under adversarial fixed merge orders") {
    // The gate entry (b20b) claims |est(union of 8 partials) −
    // est(direct)| ≤ 10%·exact+2 and |est(union) − exact| ≤ 8%·exact+2
    // for ANY merge order. hll_union_agg's order is whatever the
    // shuffle delivers, so here the union is built twice by FIXED
    // binary folds — partials ascending by split and descending by
    // split (the two orders that maximally disagree about which
    // sketch seeds the gadget, i.e. when sparse→dense promotion
    // happens) — and both claims must hold in both. If a future
    // DataSketches change made the estimate order-sensitive beyond
    // the error band, this is the spec that turns red before the
    // driver's gate does.
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, TestSpark.sf)
      .filter(col("event_type").isNotNull)
      .select(col("event_type"), col("user_id"),
        pmod(crc32(col("user_id").cast("string")), lit(8)).as("split"))
    val splitCols = (0 until 8).map(i => s"s$i")
    // pivot() rewrites the agg in a way that breaks hll_sketch_agg's
    // constant-K check, so widen by hand: one sketch per (type, split),
    // then a conditional first() per split column
    val cellExprs = splitCols.zipWithIndex.map { case (n, i) =>
      first(when(col("split") === i, col("sk")), ignoreNulls = true).as(n)
    }
    val partials = ev.groupBy(col("event_type"), col("split"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy(col("event_type"))
      .agg(cellExprs.head, cellExprs.tail: _*)
    // null-safe fixed-order binary fold (a pivot cell is NULL when an
    // (event_type, split) cell is empty — legal for small types)
    def fold(order: Seq[String]): org.apache.spark.sql.Column =
      order.map(col).reduceLeft((a, b) =>
        when(a.isNull, b).when(b.isNull, a).otherwise(hll_union(a, b)))
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
    val rows = partials.join(exact, "event_type")
      .select(col("event_type"), col("n"),
        hll_sketch_estimate(fold(splitCols)).as("asc"),
        hll_sketch_estimate(fold(splitCols.reverse)).as("desc"))
      .collect()
    val direct = ev.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (t, n) = (r.getString(0), r.getLong(1))
      val (a, dsc) = (r.getLong(2), r.getLong(3))
      val d = direct(t)
      for ((label, est) <- Seq("asc" -> a, "desc" -> dsc)) {
        assert(math.abs(est - d) <= 0.10 * n + 2,
          s"$t/$label: merge_consistent violated est=$est direct=$d exact=$n")
        assert(math.abs(est - n) <= 0.08 * n + 2,
          s"$t/$label: est_within_bound violated est=$est exact=$n")
      }
    }
  }
}
