package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests: the scale design lives or dies on
  * physical-plan properties (pushdown reaching the scan, dims being
  * broadcast, partial aggregation, no accidental cartesian/row-pair
  * joins). PlanAudit prints these for eyeballing; this spec makes the
  * key ones failing assertions so a refactor can't silently regress
  * them.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString

  private def count(p: String, tag: String): Int =
    p.linesIterator.count(_.contains(tag))

  test("b1: filter and projection reach the parquet scan") {
    val p = plan("b1_pushdown_scan")
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"), p.take(1500))
    // 5-column scan (4 projected + filter col) of an 11-column table
    val scanCols = "FileScan parquet \\[([^\\]]*)\\]".r
      .findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(scanCols.nonEmpty && scanCols.split(",").length <= 5,
      s"scan reads too many columns: $scanCols")
  }

  test("b4b: bounded dims broadcast; SF-linear tables free to shuffle") {
    // Only nation (25 rows) and region (5 rows) are hinted — genuinely
    // bounded dims. customer AND supplier are NOT: both grow with SF
    // (supplier is 10k rows/SF in TPC-H), and a hint-forced broadcast
    // would OOM the driver at 100× where AQE cannot demote an explicit
    // hint. At test SF stats may still broadcast them, so the pin is
    // >= 2 broadcasts and zero nested-loop joins, with SMJ permitted.
    val p = plan("b4b_join_region")
    assert(count(p, "BroadcastHashJoin") >= 2, p.take(2000))
    assert(count(p, "BroadcastNestedLoopJoin") == 0,
      s"dim join degenerated to a pair join:\n${p.take(2000)}")
  }

  test("b4: Q3 joins never degenerate to nested-loop; dims hash-join") {
    // No broadcast hint survives on any SF-linear table (customer is
    // segment-filtered but still ~20% of a linear table); stats/AQE
    // may broadcast at test SF, so pin only the safety properties:
    // hash-based joins throughout, zero nested-loop joins.
    val p = plan("b4_join_multiway")
    assert(count(p, "BroadcastNestedLoopJoin") == 0,
      s"join degenerated to a pair join:\n${p.take(2000)}")
    assert(count(p, "BroadcastHashJoin") + count(p, "SortMergeJoin") +
      count(p, "ShuffledHashJoin") >= 2, p.take(2000))
  }

  test("b2: aggregation is two-phase (map-side partial)") {
    val p = plan("b2_agg")
    assert(p.contains("partial_sum") || p.contains("partial_"),
      s"no partial aggregation in plan:\n${p.take(2000)}")
  }

  test("d2: banding join carries only narrow rows, sets re-join by id") {
    val p = plan("d2_dedup_minhash")
    // candidate generation must be an equi-join (hash-based), never a
    // nested-loop pair enumeration
    assert(count(p, "BroadcastNestedLoopJoin") == 0,
      s"minhash candidates degenerated to a pair join:\n${p.take(2000)}")
  }

  test("d5: blocked scan plans the tile kernel, not a row-per-pair join") {
    val p = plan("d5_embed_neardup")
    assert(p.toLowerCase.contains("blockcospairs"),
      s"blocked kernel missing from plan:\n${p.take(2000)}")
  }

  test("d6: exact top-k plans the BlockTopK tile kernel") {
    val p = plan("d6_ann_bruteforce")
    assert(p.toLowerCase.contains("blocktopk"),
      s"blocked top-k kernel missing from plan:\n${p.take(2000)}")
  }

  test("c6: interval join is keyed on (user_id, bucket), range filter is residual") {
    val p = plan("c6_interval_join")
    // the join key must include the time bucket — a user_id-only key
    // enumerates clicks×purchases per user (per-key quadratic)
    val joinLine = p.linesIterator
      .find(l => l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
        l.contains("BroadcastHashJoin"))
      .getOrElse(fail(s"no equi-join in plan:\n${p.take(2000)}"))
    assert(joinLine.contains("bucket"),
      s"join not keyed on the time bucket: $joinLine")
    assert(count(p, "BroadcastNestedLoopJoin") == 0,
      s"interval join degenerated to a pair join:\n${p.take(2000)}")
  }

  test("b27: raw SQL range theta-join is auto-rewritten to a bucket-keyed join") {
    val p = plan("b27_auto_range_rewrite")
    // the injected rule must synthesize the bucket equi-key; without
    // it this plans a per-user-key nested-loop pair enumeration
    assert(p.contains("__graft_range_bucket"),
      s"rewrite rule did not fire:\n${p.take(2000)}")
    assert(count(p, "BroadcastNestedLoopJoin") == 0,
      s"range join degenerated to a pair join:\n${p.take(2000)}")
  }

  test("b18b: bucketed join plans with zero Exchange on the join") {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    // AQE off so the pre-execution plan tree is final and walkable;
    // auto-broadcast off because at test SF the dim side is tiny and
    // Catalyst would (correctly) broadcast — the property under test
    // is the big-big shape, where co-located buckets avoid the shuffle
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("b18b_bucketed_join")(spark, TestSpark.sf)
      val plan = df.queryExecution.executedPlan
      val smj = plan.collectFirst { case j: SortMergeJoinExec => j }
        .getOrElse(fail(s"no SortMergeJoin:\n${plan.toString.take(2000)}"))
      // both sides read pre-bucketed files: nothing under the join may
      // reshuffle (the only exchange allowed is the groupBy above it)
      assert(smj.collect { case e: ShuffleExchangeLike => e }.isEmpty,
        s"bucketed join reshuffled its children:\n${smj.toString.take(2000)}")
      assert(plan.toString.contains("SelectedBucketsCount: 8 out of 8"))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("a15: per-user agg runs on bucket partitioning — no hash exchange") {
    val p = plan("a15_bucketed_events")
    // the userid-bucketed layout must satisfy the groupBy(userid)
    // distribution; the only allowed exchange is the final orderBy's
    // range partitioning
    assert(!p.contains("Exchange hashpartitioning"),
      s"per-user agg reshuffled a userid-bucketed store:\n${p.take(2000)}")
    assert(p.contains("Bucketed: true"), p.take(1500))
  }

  test("a13: time-range read prunes dt/hour partitions at planning time") {
    val p = plan("a13_pruned_read")
    assert(p.contains("PartitionFilters: [") && !p.contains("PartitionFilters: []"),
      s"no partition filters on the store scan:\n${p.take(2000)}")
  }

  test("a6: paged time-range query needs no full-plan shuffle") {
    // orderBy+offset+limit collapses to TakeOrderedAndProject — no
    // Exchange means no global sort of the store
    val p = plan("a6_event_query_paging")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("d33: token scoring explodes the corpus exactly once") {
    // the join formulation evaluated the scan+explode pipeline three
    // times (column pruning defeated ReuseExchange); the window form
    // must keep exactly one Generate and one token-keyed exchange
    val p = plan("d33_unigram_logprob")
    assert(count(p, "Generate explode") == 1,
      s"corpus explode pipeline duplicated:\n${p.take(2000)}")
    assert(count(p, "Window") == 1, p.take(2000))
  }

  test("d36: substring dedup is join-free — windows on two keyed exchanges") {
    // the scale shape: gram candidates come from window min/max over
    // the gram-hash partitioning and spans from gaps-and-islands over
    // the doc partitioning — never a self-join on the gram key (the
    // join-back form re-evaluates the scan+gram pipeline, the d33
    // lesson) and never a cartesian
    val p = plan("d36_substring_dedup")
    assert(count(p, "Join") == 0, s"substring dedup grew a join:\n${p.take(2000)}")
    assert(count(p, "Generate") == 1,
      s"gram pipeline duplicated:\n${p.take(2000)}")
    // gram-hash exchange + doc exchange + the entry's orderBy range
    // exchange; the final groupBy must reuse the doc partitioning
    assert(count(p, "Exchange") == 3,
      s"expected 3 exchanges (h, doc, sort):\n${p.take(3000)}")
  }

  test("d38: span cut is one reconstruct join over the d36 machinery") {
    // the cleaning pass may add exactly ONE join (cut lists back to
    // the original-case token array) and NO second gram pipeline —
    // one Generate total; the corpus is re-scanned narrow for the
    // token array, never re-grammed
    val p = plan("d38_span_cut")
    assert(count(p, "Join") == 1, s"expected exactly 1 join:\n${p.take(2000)}")
    assert(count(p, "Generate") == 1,
      s"gram pipeline duplicated:\n${p.take(2000)}")
    assert(count(p, "CartesianProduct") == 0 &&
      count(p, "BroadcastNestedLoopJoin") == 0, p.take(2000))
  }

  test("d37: composed gram profile rides ONE gram exchange, join-free") {
    // the composition claim: repetition scoring + cross-doc candidate
    // counting share one gramHashes pass — the (h, doc_id) window
    // spec must piggyback on the (h) exchange (HashPartitioning(h)
    // satisfies the wider clustering), adding a sort, never a second
    // gram exchange, and never a join-back
    val p = plan("d37_gram_profile")
    assert(count(p, "Join") == 0, s"gram profile grew a join:\n${p.take(2000)}")
    assert(count(p, "Generate") == 1,
      s"gram pipeline duplicated:\n${p.take(2000)}")
    // gram-hash exchange + doc aggregate exchange + the orderBy range
    // exchange — 3 total; a 4th means the (h, doc_id) window forced
    // its own exchange
    assert(count(p, "Exchange") == 3,
      s"expected 3 exchanges (h, doc-agg, sort):\n${p.take(3000)}")
  }

  test("d43: decontamination screens map-side against a broadcast holdout") {
    // the asymmetric-cardinality contract: the holdout gram set and
    // the per-doc counts are the broadcast sides; the training corpus
    // must never reach a shuffle to pair up with the holdout (no SMJ,
    // no shuffled hash join anywhere in the screen)
    val p = plan("d43_decontaminate")
    assert(count(p, "BroadcastHashJoin") == 2,
      s"expected semi + report joins broadcast:\n${p.take(3000)}")
    assert(count(p, "SortMergeJoin") == 0 && count(p, "ShuffledHashJoin") == 0,
      s"corpus shuffled to pair with the holdout:\n${p.take(3000)}")
    assert(count(p, "BroadcastNestedLoopJoin") == 0, p.take(2000))
  }

  test("d44: PII redaction is a pure scan projection") {
    // regex scrub + counts ride the parquet scan; the only exchange
    // permitted is the entry's presentation orderBy
    val p = plan("d44_redact_pii")
    assert(count(p, "Join") == 0, s"redaction grew a join:\n${p.take(2000)}")
    assert(count(p, "Exchange") == 1,
      s"expected only the orderBy exchange:\n${p.take(2000)}")
  }

  test("d45: shuffle-shard is one shard-keyed exchange, no global sort") {
    // the training-shard writer's shape: hash exchange on shard +
    // per-shard sort for the rank; the only other exchange is the
    // entry's presentation orderBy
    val p = plan("d45_shuffle_shard")
    assert(count(p, "Window") == 1, p.take(2000))
    assert(count(p, "Exchange") == 2,
      s"expected shard exchange + orderBy only:\n${p.take(2000)}")
    assert(count(p, "hashpartitioning(shard") == 1,
      s"rank must partition by shard:\n${p.take(2000)}")
  }

  test("d32: packing reads one pinned range layout; no global window") {
    // the range-partitioned (id, n, ord) projection is materialized
    // ONCE (localCheckpoint) so the totals pass and the packing pass
    // cannot disagree on range boundaries — the plan reads the
    // checkpoint, and a single-partition global window (the cumsum
    // trap) must never reappear
    val p = plan("d32_sequence_pack")
    assert(count(p, "Scan ExistingRDD") >= 1,
      s"packing lost its pinned layout:\n${p.take(2000)}")
    assert(count(p, "Window") == 0,
      s"global-window cumsum crept back in:\n${p.take(2000)}")
  }
}
