package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke + semantic checks across the whole queries() registry. */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("every registered query executes and returns a schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, TestSpark.sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.count() >= 0, s"$name failed to execute")
    }
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("approx distinct within 5% of exact") {
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables.lineitem(spark, TestSpark.sf)
    val exact = li.agg(countDistinct(col("l_partkey"))).head.getLong(0)
    val approx = li.agg(approx_count_distinct(col("l_partkey"))).head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("HLL sketches estimate within 5% and merge exactly (b20)") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, TestSpark.sf)
    val est = SparkEntry.queries("b20_hll_mergeable")(spark, TestSpark.sf)
      .collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("est_users"))
      .toMap
    // per-type and merged estimates within 5% of exact distinct counts
    val exactPerType = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
    val exactAll = ev.agg(countDistinct(col("user_id"))).head.getLong(0)
    for ((t, n) <- exactPerType)
      assert(math.abs(est(t) - n).toDouble / n < 0.05, s"$t: est=${est(t)} exact=$n")
    assert(math.abs(est("__all__") - exactAll).toDouble / exactAll < 0.05)
    // mergeability: the union of per-type sketches must estimate the
    // same cardinality as one direct sketch over all rows. NOT a
    // bit-equality claim — r13's register-level formulation (ballast-
    // union both sides onto the composite estimator, assert the two
    // estimates bit-equal) proved shuffle-order-dependent at the
    // driver's gate: which partial arrives first decides when the
    // union gadget leaves sparse mode, and sparse→dense promotion
    // does not commute bit-for-bit with coupon replay. The b20b r14
    // tolerance form claims only what the math guarantees for every
    // merge order: both estimates within the lgK=12 error band of the
    // same exact count, so their gap is bounded by ~6σ.
    val merged = ev.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_union_agg(col("sk")).as("msk"))
      .crossJoin(ev.agg(hll_sketch_agg(col("user_id")).as("dsk")))
      .select(
        hll_sketch_estimate(col("msk")).as("m"),
        hll_sketch_estimate(col("dsk")).as("d"))
      .head()
    assert(math.abs(merged.getLong(0) - merged.getLong(1)) <=
      0.10 * exactAll + 2,
      s"merged-vs-direct estimates outside the 6-sigma band: $merged")
  }

  test("count-min sketch bounds heavy-hitter counts (never under, small over)") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, TestSpark.sf)
      .select(col("event_type"))
    val exact = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    val cms = ev.stat.countMinSketch("event_type", eps = 0.001,
      confidence = 0.99, seed = 42)
    exact.foreach { case (t, n) =>
      val est = cms.estimateCount(t)
      assert(est >= n, s"CMS must never undercount: $t est=$est exact=$n")
      assert(est <= n + (0.001 * total).toLong + 1,
        s"CMS overcount beyond eps bound: $t est=$est exact=$n")
    }
  }

  test("bloom pre-filter passes every true match (b24 pre-join input)") {
    import org.apache.spark.sql.functions._
    val ord = graft.sources.Tables.orders(spark, TestSpark.sf)
      .filter(col("o_totalprice") > 300000.0).select(col("o_orderkey"))
    val bf = ord.agg(graft.functions.SketchFunctions
      .bloomFilterAgg(col("o_orderkey"), 10000L, 80000L).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    val li = graft.sources.Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_orderkey"))
    val kept = li.filter(graft.functions.SketchFunctions
      .mightContain(lit(bf), col("l_orderkey")))
    // no false negatives: every lineitem that truly joins survives
    val trueMatches = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .count()
    val keptMatches = kept.join(ord, col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(keptMatches == trueMatches)
    // and the filter actually prunes (false-positive rate is low)
    assert(kept.count() < li.count(),
      "bloom pre-filter should drop non-matching rows")
  }

  test("pivot/unpivot round-trips the conditional aggregate (b19)") {
    import org.apache.spark.sql.functions._
    val pivoted = SparkEntry.queries("b19_pivot")(spark, TestSpark.sf)
    // melt back to (status, priority_slug, revenue) and compare with
    // the direct group-by
    val melted = pivoted.unpivot(
      Array(col("o_orderstatus")),
      Array(col("urgent"), col("high"), col("medium"),
        col("not_specified"), col("low")),
      "prio", "revenue")
      .filter(col("revenue").isNotNull)
    val direct = graft.sources.Tables.orders(spark, TestSpark.sf)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(round(sum(col("o_totalprice")), 4).as("revenue"))
    assert(melted.count() == direct.count())
    val m = melted.collect()
      .map(r => (r.getAs[String]("o_orderstatus"), r.getAs[String]("prio")) ->
        r.getAs[Double]("revenue")).toMap
    val slug = Map("1-URGENT" -> "urgent", "2-HIGH" -> "high",
      "3-MEDIUM" -> "medium", "4-NOT SPECIFIED" -> "not_specified",
      "5-LOW" -> "low")
    direct.collect().foreach { r =>
      val k = (r.getAs[String]("o_orderstatus"),
        slug(r.getAs[String]("o_orderpriority")))
      assert(m(k) == r.getAs[Double]("revenue"), s"mismatch at $k")
    }
  }

  test("d62 pipeline: each planted mirror family collapses to its min-id representative") {
    // every 10th doc republishes the shared body; the %4-keyed
    // keep-div splits the planted family into two extraction
    // variants (doc_id % 20 == 0 carries the extra kept block), so
    // exactly TWO planted docs survive dedup: the min id of each
    // variant — 0 and 10
    val out = SparkEntry.queries("d62_pipeline")(spark, TestSpark.sf)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val planted = out.filter(_ % 10 == 0)
    assert(planted == Set(0L, 10L), s"planted survivors: $planted")
    // the gate + dedup genuinely drop rows, but most of the corpus
    // survives (unique bodies, word counts in range)
    assert(out.size > 300 && out.size < 500, s"survivors: ${out.size}")
  }
}
