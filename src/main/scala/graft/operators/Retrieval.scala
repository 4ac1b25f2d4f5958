package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.SketchFunctions
import graft.sources.Bucketing

/** Ranked keyword retrieval over the document corpus — the curation
  * pipeline's "find everything about X" primitive (targeted corpus
  * exploration, retrieval-backed decontamination, eval-set mining).
  * The reference's query surface is equality/IN filters pushed to a
  * SQL engine (AthenaEventQuery.java:161-198); ranked retrieval is
  * the same "query the corpus declaratively" capability lifted to
  * relevance scoring, re-expressed as Spark aggregates.
  *
  * Everything is count arithmetic + ln, so the whole operator is
  * oracle-checked: DuckDB re-derives term frequencies, document
  * frequencies, idf and the rounded BM25 sum from raw text.
  */
object Retrieval {

  /** Okapi BM25 top-k (Robertson et al., TREC-3; the +1 idf form
    * `ln(1 + (N - df + 0.5)/(df + 0.5))` so scores are always
    * positive):
    *
    *   score(d, Q) = Σ_{t ∈ Q} idf(t) · tf · (k1 + 1)
    *                          / (tf + k1 · (1 − b + b · dl/avgdl))
    *
    * Scale shape: the corpus is NEVER inverted wholesale — the
    * query-term `isin` filter sits directly on the exploded token
    * stream, map-side BELOW the first exchange, so only postings of
    * the |Q| query terms ever shuffle (at 100 TB that is the
    * difference between a full-corpus index build and a scan that
    * ships a few million narrow rows). The per-document length rides
    * the exploded rows (`dl` is carried through the explode and
    * folded with max()), so no corpus-sized doc-length join exists.
    * df/N/avgdl derive from the (doc, term) aggregate and one
    * one-row corpus aggregate (broadcast) — the d53 "c1 from c2"
    * discipline. The final top-k is `orderBy.limit`, which Spark
    * plans as TakeOrderedAndProject: per-partition heaps + one
    * driver merge of k rows, never a global sort.
    *
    * Returns (doc_id, n_terms, bm25), score rounded to 4 decimals
    * (§6 rule), ordered by (bm25 desc, doc_id) with doc_id as the
    * deterministic tiebreak at the cut. Documents matching no query
    * term score 0 and are absent. Null-id/text rows are dropped.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], topK: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms.distinct == queryTerms,
      s"queryTerms must be distinct, got $queryTerms")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    // tokens() lowercases the corpus side; a mixed-case query term
    // would silently score zero matches, so fail loud rather than
    // normalize (a caller passing 'Spark' should KNOW matching is
    // case-folded, not discover it from a quiet rescore)
    queryTerms.find(t => t != t.toLowerCase).foreach(t =>
      throw new IllegalArgumentException(
        s"bm25TopK: query term '$t' is not lowercase — corpus tokens " +
          "are case-folded by Dedup.tokens; lowercase the query"))
    val live = docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
    val toks = live.select(col(idCol).as("doc_id"),
      Dedup.tokens(col(textCol)).as("tk"))
    // one-row corpus stats (N docs, total token mass), broadcast
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      sum(size(col("tk")).cast("long")).as("sum_dl"))
    // postings of the query terms ONLY: the isin filter is a
    // codegen'd scan filter under the Generate, ahead of the
    // (doc_id, term) exchange
    val tf = toks
      .select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
        explode(col("tk")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    // document frequencies from the (doc, term) aggregate — |Q|-sized
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df_t"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df_t").cast("double") + 0.5) /
        (col("df_t").cast("double") + 0.5))
    val w = idf * (col("tf").cast("double") * (k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    tf.join(broadcast(dfT), Seq("term"))
      .join(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), round(sum(w), 4).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(topK)
  }

  /** Per-query BM25 ranked lists — [[bm25TopK]] generalized to a
    * BATCH of queries (one row per query: id + terms array): the
    * lexical leg of hybrid retrieval, and the shape of
    * retrieval-backed eval-set mining (hundreds of benchmark
    * questions against the corpus in one pass).
    *
    * Scale shape — the [[bm25TopK]] discipline with the query table
    * as the front-door SMALL side (an eval set or probe batch: MBs
    * against a 100 TB corpus; the caller owns that contract, as in
    * [[Dedup.decontaminate]]'s holdout): the query table broadcasts
    * twice — its distinct terms as the left-semi screen under the
    * corpus Generate (only query-term postings ever shuffle), and
    * the (query, term) pairs to expand per-query scores after the
    * (doc, term) aggregate. Per-query top-k rides the bounded-k
    * [[graft.functions.VectorFunctions.topKByCos]] heap aggregate
    * (per-group state is k entries however many docs match), never
    * a corpus-wide rank window.
    *
    * Returns (query_id, rank, doc_id, bm25): rank 1-based by
    * (bm25 desc, doc_id), bm25 rounded to 4 decimals BEFORE ranking
    * (§6 — both engines rank identical doubles). `excludeSelf`
    * drops doc_id == query_id before ranking, for probe-by-example
    * batches drawn from the corpus itself (the dense leg's q != c
    * convention). Documents matching no term of a query are absent
    * from that query's list. */
  def bm25PerQueryRanks(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, termsCol: String,
      topK: Int, k1: Double = 1.2, b: Double = 0.75,
      excludeSelf: Boolean = false): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val live = docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
    val toks = live.select(col(idCol).as("doc_id"),
      Dedup.tokens(col(textCol)).as("tk"))
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      sum(size(col("tk")).cast("long")).as("sum_dl"))
    val qt = queries
      .filter(col(queryIdCol).isNotNull && col(termsCol).isNotNull)
      .select(col(queryIdCol).as("query_id"),
        explode(col(termsCol)).as("term"))
      .distinct()
    val termSet = qt.select(col("term")).distinct()
    val tf = toks
      .select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
        explode(col("tk")).as("term"))
      .join(broadcast(termSet), Seq("term"), "left_semi")
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df_t"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df_t").cast("double") + 0.5) /
        (col("df_t").cast("double") + 0.5))
    val w = idf * (col("tf").cast("double") * (k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    val perQuery = tf.join(broadcast(dfT), Seq("term"))
      .join(broadcast(stats))
      .join(broadcast(qt), Seq("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(w), 4).as("bm25"))
    val screened =
      if (excludeSelf) perQuery.filter(col("doc_id") =!= col("query_id"))
      else perQuery
    screened.groupBy(col("query_id"))
      .agg(graft.functions.VectorFunctions.topKByCos(
        col("doc_id").cast("long"), col("bm25"), topK).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.neighbor_id").as("doc_id"), col("col.cos").as("bm25"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009)
    * of two ranked lists — the standard lexical+dense hybrid:
    * score(q, d) = Σ_list 1/(k0 + rank_list(q, d)), a list where d
    * is absent contributing 0. Rank-based fusion needs no score
    * calibration between legs (BM25 sums and cosines are not
    * comparable; their RANKS are), which is why RRF is the default
    * fusion in production retrieval stacks.
    *
    * Inputs carry (query_id, rank, doc_id); both lists are already
    * top-k-bounded per query, so the single full-outer
    * SHUFFLE_HASH equi-join on (query_id, doc_id) moves at most
    * k_A + k_B narrow rows per query, and the fused top-k rides the
    * bounded [[graft.functions.VectorFunctions.topKByCos]] heap.
    * Returns (query_id, rank, doc_id, rrf): rank by (rrf desc,
    * doc_id) over raw doubles (1/(k0+r) is the same IEEE value in
    * every engine — no rounding ambiguity), rrf rounded to 6
    * decimals for display AFTER ranking. */
  def rrfFuse(listA: DataFrame, listB: DataFrame, k0: Int = 60,
      topK: Int = 10): DataFrame = rrfFuseAll(Seq(listA, listB), k0, topK)

  /** [[rrfFuse]] generalized to N ranked systems — Cormack et al.'s
    * fusion is defined over any system count, and production stacks
    * routinely fuse three or more (lexical, dense, a static quality
    * or link-authority prior, a recency leg …). Each list carries
    * (query_id, rank, doc_id) and is top-k-bounded per query, so the
    * fold of full-outer SHUFFLE_HASH equi-joins moves at most Σ k_i
    * narrow rows per query; the rrf sum is a FIXED left-associated
    * expression over the lists in argument order — N inexact doubles
    * summed in one deterministic order, so both engines rank
    * identical values (a groupBy-sum over a union would add in
    * partition order, ULP-unstable at ties). Absent docs contribute
    * 0 per list; the fused top-k rides the bounded heap. Returns
    * (query_id, rank, doc_id, rrf), rrf rounded to 6 decimals AFTER
    * ranking. */
  def rrfFuseAll(lists: Seq[DataFrame], k0: Int = 60,
      topK: Int = 10): DataFrame = {
    require(lists.size >= 2, s"need >= 2 lists, got ${lists.size}")
    require(k0 >= 1, s"k0 must be >= 1, got $k0")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val prepped = lists.zipWithIndex.map { case (l, i) =>
      l.select(col("query_id"), col("doc_id"), col("rank").as(s"__r$i"))
    }
    val joined = prepped.reduce((a, b) =>
      a.join(b.hint("SHUFFLE_HASH"), Seq("query_id", "doc_id"),
        "full_outer"))
    val rrf = lists.indices
      .map(i => coalesce(lit(1.0) / (lit(k0) + col(s"__r$i")), lit(0.0)))
      .reduce(_ + _)
    joined.select(col("query_id"), col("doc_id"), rrf.as("rrf"))
      .groupBy(col("query_id"))
      .agg(graft.functions.VectorFunctions.topKByCos(
        col("doc_id").cast("long"), col("rrf"), topK).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.neighbor_id").as("doc_id"),
        round(col("col.cos"), 6).as("rrf"))
  }

  /** The Okapi weight shared by every BM25 path — ONE expression
    * definition so the fresh-scan operators ([[bm25TopK]],
    * [[bm25PerQueryRanks]]) and the index-serving operators
    * ([[bm25TopKAgainstIndex]], [[bm25RanksAgainstIndex]]) cannot
    * drift arithmetically: the indexed path's whole correctness
    * claim is bit-equality of the rounded score, and that only holds
    * if both paths evaluate the identical expression tree over
    * identical (tf, dl, df_t, n_docs, sum_dl) longs. */
  private def bm25Weight(k1: Double, b: Double): Column = {
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df_t").cast("double") + 0.5) /
        (col("df_t").cast("double") + 0.5))
    idf * (col("tf").cast("double") * (k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
  }

  /** Builds the PERSISTENT BM25 index — the lexical sibling of
    * [[graft.operators.Dedup.buildDedupIndex]] and
    * [[graft.operators.Similarity.buildAnnIndex]], closing the last
    * operator family that rescanned the corpus per query batch:
    * [[bm25TopK]]/[[bm25PerQueryRanks]] re-tokenize the corpus and
    * re-derive tf/df/avgdl for EVERY query batch — at 100 TB that is
    * a full corpus read per eval-set probe, the exact cost the D45
    * index-once pattern exists to kill. The index stores, once, the
    * three projections a BM25 score ever reads, as bucketed managed
    * tables:
    *
    *   - `<name>_postings` (term, doc_id, tf, dl), bucketed by term —
    *     the serving scan. A query batch's term list becomes an IN
    *     filter on the bucket column, so the scan prunes to the
    *     buckets holding query-term postings (SelectedBucketsCount in
    *     the plan) and reads none of the rest. dl rides denormalized
    *     on every posting (the fresh path carries it through the
    *     explode the same way) so serving needs no doc-length join;
    *   - `<name>_df` (term, df_t), bucketed by term — vocabulary-
    *     sized; the query-term slice broadcasts;
    *   - `<name>_docs` (doc_id, dl), bucketed by doc_id — per-doc
    *     lengths, the retire/append bookkeeping side (serving never
    *     reads it);
    *   - `<name>_meta` — one row (n_docs, sum_dl, num_buckets): the
    *     corpus stats every score shares, and the bucket count the
    *     maintenance verbs read back.
    *
    * Raw text never enters the index. The postings build is a pure
    * scan projection — per-doc (term, tf) entries come from the
    * [[graft.functions.SketchFunctions.termCounts]] kernel (tf is a
    * per-document statistic; the explode→groupBy formulation pays a
    * corpus-wide exchange whose merge step is a no-op), so the only
    * redistribution in the whole build is the bucketed writes'
    * term/doc clustering. Tokenization is [[Dedup.tokens]], the same
    * case-folding \s+ split the fresh path uses — index and screen
    * arithmetic cannot drift because serving reads everything from
    * the tables.
    *
    * Reference anchor: the reference's query surface pushes filters
    * to an external engine per query (AthenaEventQuery.java:161-198);
    * a persistent inverted index is that "query the corpus without
    * rescanning it" capability re-expressed for ranked retrieval. */
  def buildBm25Index(docs: DataFrame, idCol: String, textCol: String,
      name: String, numBuckets: Int = 8): Unit = {
    val spark = docs.sparkSession
    val live = docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
    // positional postings: positions (1-based ascending) ride every
    // (term, doc) row so phrase/proximity serving never re-tokenizes
    // the corpus; tf is their size. Storage cost, disclosed: ~one
    // int per corpus token — the standard positional-index price,
    // and the column PRUNES AWAY at every pure-BM25 serving scan.
    val post = live
      .select(col(idCol).as("doc_id"), Dedup.tokens(col(textCol)).as("tk"))
      .select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
        explode(SketchFunctions.termPositions(col("tk"))).as("e"))
      .select(col("e.term").as("term"), col("doc_id"),
        size(col("e.positions")).cast("long").as("tf"), col("dl"),
        col("e.positions").as("positions"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      Bucketing.writeBucketed(post, s"${name}_postings", "term", numBuckets)
      Bucketing.writeBucketed(
        post.groupBy(col("term")).agg(count(lit(1)).as("df_t")),
        s"${name}_df", "term", numBuckets)
      // every live doc has >= 1 token (split returns [""] on empty
      // text), so the per-doc fold over postings loses nobody
      Bucketing.writeBucketed(
        post.groupBy(col("doc_id")).agg(max(col("dl")).as("dl")),
        s"${name}_docs", "doc_id", numBuckets)
    } finally post.unpersist()
    writeBm25Meta(spark, name, numBuckets)
  }

  /** (n_docs, sum_dl) recomputed from the `_docs` table — the single
    * source every maintenance verb re-derives `_meta` from, so the
    * stats can never drift from the doc set they describe. */
  private def writeBm25Meta(spark: SparkSession, name: String,
      numBuckets: Int): Unit = {
    val st = spark.table(s"${name}_docs")
      .agg(count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0L)).as("s"))
      .head()
    import spark.implicits._
    Bucketing.writeTable(
      Seq((st.getLong(0), st.getLong(1), numBuckets))
        .toDF("n_docs", "sum_dl", "num_buckets"),
      s"${name}_meta")
  }

  /** Folds a batch of NEW documents into a [[buildBm25Index]] index:
    * appends their postings and doc lengths as per-bucket files (no
    * rewrite of existing data), then refreshes the two derived
    * statistics tables — `_df` through [[Bucketing.compactBucketed]]'s
    * crash-safe staged swap (union-sum with the batch's term counts:
    * vocabulary-sized work, never corpus-sized), `_meta` by
    * re-aggregating `_docs`. Caller contract, as with
    * [[graft.operators.Similarity.appendToAnnIndex]]: doc ids must be
    * NEW — the upstream dedup screen owns that guarantee; appending
    * an existing id would double its postings silently (detecting it
    * here would cost a full `_docs` scan per append, the re-scan tax
    * the index exists to avoid).
    *
    * Crash windows: the four table updates are ordered postings →
    * docs → df → meta, so a death mid-verb leaves scores computed
    * with a conservative (slightly stale) df/avgdl over complete
    * postings — re-running the append is NOT safe (ids would
    * double); re-deriving df/meta is: call [[repairBm25Stats]]. */
  def appendToBm25Index(batch: DataFrame, idCol: String, textCol: String,
      name: String): Unit = {
    val spark = batch.sparkSession
    val numBuckets = spark.table(s"${name}_meta").head()
      .getAs[Int]("num_buckets")
    val live = batch.filter(col(idCol).isNotNull && col(textCol).isNotNull)
    // eager localCheckpoint, NOT persist: the caller's batch plan may
    // reference this index's own tables (the [[screenNewForBm25Index]]
    // anti-join in the streaming composition), and the `_docs` append
    // below INVALIDATES any cache built over them — a lazily
    // re-evaluated plan would then anti-join against the mutated
    // table, see its own rows as already-indexed, and silently feed
    // an EMPTY frame to the df/meta refresh. The checkpoint truncates
    // lineage, so the pinned postings are immune to the mutation.
    val post = live
      .select(col(idCol).as("doc_id"), Dedup.tokens(col(textCol)).as("tk"))
      .select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
        explode(SketchFunctions.termPositions(col("tk"))).as("e"))
      .select(col("e.term").as("term"), col("doc_id"),
        size(col("e.positions")).cast("long").as("tf"), col("dl"),
        col("e.positions").as("positions"))
      .localCheckpoint(true)
    Bucketing.appendBucketed(post, s"${name}_postings", "term", numBuckets)
    Bucketing.appendBucketed(
      post.groupBy(col("doc_id")).agg(max(col("dl")).as("dl")),
      s"${name}_docs", "doc_id", numBuckets)
    val batchDf = post.groupBy(col("term")).agg(count(lit(1)).as("df_t"))
    Bucketing.compactBucketed(old =>
      old.unionByName(batchDf).groupBy(col("term"))
        .agg(sum(col("df_t")).as("df_t")))(
      spark, s"${name}_df", "term", numBuckets)
    writeBm25Meta(spark, name, numBuckets)
  }

  /** Maintenance pass for a BM25 index that has accreted appends:
    * rewrites the three bucketed tables to one file per bucket (each
    * [[appendToBm25Index]] adds a file per bucket; after K batches
    * every serving scan opens K× the files). Same staged drop+rename
    * swap as [[graft.sources.Bucketing.compactBucketed]] — the live
    * table is replaced only after the compacted copy fully exists,
    * and an interrupted swap finishes on the next verb or
    * [[openBm25Index]]. `_df`/`_meta` are value-unchanged by
    * compaction and stay. */
  def compactBm25Index(spark: SparkSession, name: String): Unit = {
    val numBuckets = spark.table(s"${name}_meta").head()
      .getAs[Int]("num_buckets")
    Bucketing.compactBucketed()(spark, s"${name}_postings", "term",
      numBuckets)
    Bucketing.compactBucketed()(spark, s"${name}_df", "term", numBuckets)
    Bucketing.compactBucketed()(spark, s"${name}_docs", "doc_id",
      numBuckets)
  }

  /** The ids of `batch` rows NOT yet in the index — the idempotence
    * screen a streaming composition runs before
    * [[appendToBm25Index]] (appending an existing id doubles its
    * postings silently; the anti-join against the narrow `_docs`
    * projection makes a replayed append a no-op instead). Batch-
    * sized work: the batch broadcasts into the anti-join when small;
    * `_docs` is a two-column bucketed scan. */
  def screenNewForBm25Index(batch: DataFrame, idCol: String,
      name: String): DataFrame = {
    val spark = batch.sparkSession
    batch.join(
      spark.table(s"${name}_docs").select(col("doc_id").as("__bm_id")),
      col(idCol) === col("__bm_id"), "left_anti")
  }

  /** Heals the one residual window of the retrieval-ready ingest
    * composition ([[graft.streaming.StreamingIngest
    * .toScreenedDocIngest]]'s `bm25IndexName`): a crash between the
    * sink append and the BM25 append leaves landed documents with no
    * postings, and the replay self-suppresses at the dedup screen —
    * so redelivery alone cannot heal it. Reconciliation is the
    * answer: anti-join the LANDED corpus against the index's own
    * `_docs` ids and append whatever is missing. Idempotent (a
    * second run finds nothing) and safe to run any time — it is the
    * [[screenNewForBm25Index]] + [[appendToBm25Index]] composition
    * with the count surfaced. COST, disclosed: one scan of the
    * landed corpus against the narrow `_docs` projection — a repair
    * verb to run after a crash or on a schedule, not per batch.
    * Returns the number of documents healed. */
  def reconcileBm25Index(landed: DataFrame, idCol: String,
      textCol: String, name: String): Long = {
    // eager pin: counted AND appended — and the append mutates the
    // very tables the anti-join reads (the appendToBm25Index
    // cache-invalidation lesson)
    val missing = screenNewForBm25Index(
      landed.filter(col(idCol).isNotNull && col(textCol).isNotNull),
      idCol, name).localCheckpoint(true)
    val n = missing.count()
    if (n > 0) appendToBm25Index(missing, idCol, textCol, name)
    n
  }

  /** Rebuilds the index's derived statistics (`_df`, `_meta`) from
    * its own postings/docs tables — the recovery verb for a death
    * inside [[appendToBm25Index]]'s df/meta window, and the honest
    * answer to "are the stats still true?": df re-derives as one
    * term-keyed aggregate over postings (already bucketed by term, so
    * zero exchange below the write), meta from `_docs`. */
  def repairBm25Stats(spark: SparkSession, name: String): Unit = {
    val numBuckets = spark.table(s"${name}_meta").head()
      .getAs[Int]("num_buckets")
    Bucketing.compactBucketed(_ =>
      spark.table(s"${name}_postings").groupBy(col("term"))
        .agg(count(lit(1)).as("df_t")))(
      spark, s"${name}_df", "term", numBuckets)
    writeBm25Meta(spark, name, numBuckets)
  }

  /** Takedown for the BM25 index — [[graft.operators.Dedup
    * .retireFromDedupIndex]]'s verb for postings: removes the ids'
    * rows from `_postings` and `_docs` in crash-safe compact-with-
    * filter rewrites, then re-derives `_df` from the surviving
    * postings (a term whose last document retires disappears — the
    * rebuilt index equals a fresh build over the survivors, no
    * tombstones) and `_meta` from the surviving docs. */
  def retireFromBm25Index(ids: DataFrame, idCol: String,
      name: String): Unit = {
    val spark = ids.sparkSession
    val numBuckets = spark.table(s"${name}_meta").head()
      .getAs[Int]("num_buckets")
    val rids = ids.filter(col(idCol).isNotNull)
      .select(col(idCol).as("__rid")).distinct()
    Bucketing.compactBucketed(
      _.join(broadcast(rids), col("doc_id") === col("__rid"), "left_anti"))(
      spark, s"${name}_postings", "term", numBuckets)
    Bucketing.compactBucketed(
      _.join(broadcast(rids), col("doc_id") === col("__rid"), "left_anti"))(
      spark, s"${name}_docs", "doc_id", numBuckets)
    repairBm25Stats(spark, name)
  }

  /** Re-registers a persisted BM25 index's tables from their
    * warehouse directories in a fresh session, finishing any
    * interrupted compact swap first ([[graft.operators.Dedup
    * .openDedupIndex]]'s contract). */
  def openBm25Index(spark: SparkSession, name: String): Unit = {
    require(Bucketing.registerExisting(spark, s"${name}_meta", None),
      s"no persisted BM25 index named '$name' in the warehouse")
    val numBuckets = spark.table(s"${name}_meta").head()
      .getAs[Int]("num_buckets")
    Seq(("_postings", "term"), ("_df", "term"), ("_docs", "doc_id"))
      .foreach { case (suffix, bucketCol) =>
        Bucketing.finishInterruptedSwap(spark, s"$name$suffix")
        require(Bucketing.registerExisting(spark, s"$name$suffix",
          Some((bucketCol, numBuckets))),
          s"BM25 index '$name' is missing its $name$suffix table")
      }
  }

  /** Ops observability for the BM25 index — the one-row corpus card
    * (n_docs, n_terms, n_postings, sum_dl, avgdl) that answers "what
    * does this index hold and is it still sized right": three
    * single-row aggregates over the index's own tables (each a
    * count/sum with map-side partials — no corpus-keyed exchange
    * anywhere) crossed broadcast-small. avgdl rounded to 4 decimals
    * (§6 rule). */
  def bm25IndexStats(spark: SparkSession, name: String): DataFrame = {
    val nTerms = spark.table(s"${name}_df")
      .agg(count(lit(1)).as("n_terms"))
    val nPost = spark.table(s"${name}_postings")
      .agg(count(lit(1)).as("n_postings"))
    spark.table(s"${name}_meta")
      .crossJoin(broadcast(nTerms))
      .crossJoin(broadcast(nPost))
      .select(col("n_docs"), col("n_terms"), col("n_postings"),
        col("sum_dl"),
        round(col("sum_dl").cast("double") / col("n_docs").cast("double"),
          4).as("avgdl"))
  }

  /** [[bm25TopK]] served from a [[buildBm25Index]] index WITHOUT
    * touching the corpus — same contract, same rounding, bit-equal
    * scores (the d58 twin discipline: the d112 oracle is the
    * fresh-scan SQL verbatim). Per-batch cost: a bucket-pruned
    * postings scan of the |Q| query terms' buckets + two broadcast
    * joins + the TakeOrderedAndProject top-k. The corpus table
    * appears nowhere in this plan. */
  def bm25TopKAgainstIndex(spark: SparkSession, name: String,
      queryTerms: Seq[String], topK: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms.distinct == queryTerms,
      s"queryTerms must be distinct, got $queryTerms")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    queryTerms.find(t => t != t.toLowerCase).foreach(t =>
      throw new IllegalArgumentException(
        s"bm25TopKAgainstIndex: query term '$t' is not lowercase — " +
          "index terms are case-folded by Dedup.tokens"))
    val post = spark.table(s"${name}_postings")
      .filter(col("term").isin(queryTerms: _*))
    val dfT = spark.table(s"${name}_df")
      .filter(col("term").isin(queryTerms: _*))
    val stats = spark.table(s"${name}_meta")
      .select(col("n_docs"), col("sum_dl"))
    post.join(broadcast(dfT), Seq("term"))
      .join(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        round(sum(bm25Weight(k1, b)), 4).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(topK)
  }

  /** [[bm25PerQueryRanks]] served from a [[buildBm25Index]] index —
    * the batch front door of hybrid retrieval with the corpus rescan
    * deleted. The query batch's distinct terms are pulled to the
    * driver (BOUNDED: an eval set's vocabulary — `maxQueryTerms`
    * guards the pull, the [[graft.operators.Similarity
    * .annTopKAgainstIndex]] probed-cell discipline) and pushed as an
    * IN literal on the bucket column, so the postings scan prunes to
    * the query terms' buckets instead of left-semi-scanning
    * everything. Everything downstream is the fresh path verbatim:
    * same weight expression, same rounding-before-rank, same bounded
    * top-k heap, same excludeSelf convention. */
  def bm25RanksAgainstIndex(spark: SparkSession, name: String,
      queries: DataFrame, queryIdCol: String, termsCol: String,
      topK: Int, k1: Double = 1.2, b: Double = 0.75,
      excludeSelf: Boolean = false,
      maxQueryTerms: Int = 65536): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val qt = queries
      .filter(col(queryIdCol).isNotNull && col(termsCol).isNotNull)
      .select(col(queryIdCol).as("query_id"),
        explode(col(termsCol)).as("term"))
      .distinct()
    val termRows = qt.select(col("term")).distinct()
      .limit(maxQueryTerms + 1).collect()
    require(termRows.length <= maxQueryTerms,
      s"bm25RanksAgainstIndex('$name'): query batch carries more than " +
        s"$maxQueryTerms distinct terms — not an eval-set-sized batch; " +
        "split it or raise maxQueryTerms")
    val termLits = termRows.map(_.getString(0)).toSeq
    if (termLits.isEmpty)
      return spark.emptyDataFrame
        .select(lit(0L).as("query_id"), lit(0).as("rank"),
          lit(0L).as("doc_id"), lit(0.0).as("bm25"))
        .limit(0)
    val post = spark.table(s"${name}_postings")
      .filter(col("term").isin(termLits: _*))
    val dfT = spark.table(s"${name}_df")
      .filter(col("term").isin(termLits: _*))
    val stats = spark.table(s"${name}_meta")
      .select(col("n_docs"), col("sum_dl"))
    val perQuery = post.join(broadcast(dfT), Seq("term"))
      .join(broadcast(stats))
      .join(broadcast(qt), Seq("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(bm25Weight(k1, b)), 4).as("bm25"))
    val screened =
      if (excludeSelf) perQuery.filter(col("doc_id") =!= col("query_id"))
      else perQuery
    screened.groupBy(col("query_id"))
      .agg(graft.functions.VectorFunctions.topKByCos(
        col("doc_id").cast("long"), col("bm25"), topK).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.neighbor_id").as("doc_id"), col("col.cos").as("bm25"))
  }

  private def requirePhrase(phrase: Seq[String]): Unit = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    phrase.find(t => t != t.toLowerCase).foreach(t =>
      throw new IllegalArgumentException(
        s"phrase term '$t' is not lowercase — corpus tokens are " +
          "case-folded by Dedup.tokens; lowercase the phrase"))
  }

  /** Shared phrase-scoring tail of [[bm25PhraseTopK]] and
    * [[bm25PhraseAgainstIndex]] — ONE definition so the fresh and
    * indexed paths are bit-equal by construction (the bm25Weight
    * argument). Input `pos`: (doc_id, dl, term, positions) rows for
    * the phrase's distinct terms only. Slot 0 anchors; each later
    * slot joins its postings on doc_id (repeated phrase terms reuse
    * the same rows), and the occurrence count is the intersection of
    * slot-shifted position arrays — array HOFs, zero explodes. The
    * phrase then scores as ONE pseudo-term: tf = occurrences, df =
    * docs containing the phrase (derived per query — phrase df is
    * query-specific by nature, never stored), dl/n_docs/sum_dl the
    * ordinary corpus stats. `scored` is evaluated twice (df
    * aggregate + scoring) — both narrow (doc_id, dl, tf) passes over
    * the matched docs only, the [[bm25TopK]] recompute posture. */
  private def scorePhrase(pos: DataFrame, stats: DataFrame,
      phrase: Seq[String], topK: Int, k1: Double, b: Double): DataFrame = {
    val slot0 = pos.filter(col("term") === phrase.head)
      .select(col("doc_id"), col("dl"), col("positions").as("__p0"))
    val joined = phrase.zipWithIndex.tail.foldLeft(slot0) {
      case (acc, (t, i)) =>
        acc.join(pos.filter(col("term") === t)
          .select(col("doc_id"), col("positions").as(s"__p$i")),
          Seq("doc_id"))
    }
    val inter = phrase.indices.tail.foldLeft(col("__p0")) { (acc, i) =>
      array_intersect(acc, transform(col(s"__p$i"), x => x - i))
    }
    val scored = joined
      .select(col("doc_id"), col("dl"), size(inter).cast("long").as("tf"))
      .filter(col("tf") > 0)
    val dfp = scored.agg(count(lit(1)).as("df_t"))
    scored.join(broadcast(dfp))
      .join(broadcast(stats))
      .select(col("doc_id"), col("tf").as("phrase_tf"),
        round(bm25Weight(k1, b), 4).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(topK)
  }

  /** Exact-PHRASE BM25 top-k over a fresh corpus scan — "find every
    * document containing this exact word sequence, best first": the
    * targeted-exploration / contamination-hunt primitive where bag-
    * of-words matching is too loose (a benchmark question leaks as a
    * SEQUENCE, not a term set). Occurrences are counted by
    * intersecting slot-shifted per-term position lists (a phrase
    * occurs at p iff term_i sits at p+i for every slot), then the
    * phrase scores as one pseudo-term under the standard Okapi
    * weight. Returns (doc_id, phrase_tf, bm25), score rounded to 4
    * decimals, ordered (bm25 desc, doc_id), top-k via
    * TakeOrderedAndProject. A one-word phrase degenerates to
    * [[bm25TopK]] on that term, as it should. */
  def bm25PhraseTopK(docs: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String], topK: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    requirePhrase(phrase)
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val live = docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
    val toks = live.select(col(idCol).as("doc_id"),
      Dedup.tokens(col(textCol)).as("tk"))
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      sum(size(col("tk")).cast("long")).as("sum_dl"))
    val pos = toks
      .select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
        explode(SketchFunctions.termPositions(col("tk"))).as("e"))
      .filter(col("e.term").isin(phrase.distinct: _*))
      .select(col("doc_id"), col("dl"), col("e.term").as("term"),
        col("e.positions").as("positions"))
    scorePhrase(pos, stats, phrase, topK, k1, b)
  }

  /** [[bm25PhraseTopK]] served from a [[buildBm25Index]] index — the
    * positional payoff: phrase search over 100 TB without
    * re-tokenizing anything, reading only the phrase terms' buckets
    * (the postings carry positions precisely for this). Bit-equal to
    * the fresh scan (shared [[scorePhrase]] tail; the d119 oracle is
    * the fresh path's SQL verbatim). */
  def bm25PhraseAgainstIndex(spark: SparkSession, name: String,
      phrase: Seq[String], topK: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    requirePhrase(phrase)
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val pos = spark.table(s"${name}_postings")
      .filter(col("term").isin(phrase.distinct: _*))
      .select(col("doc_id"), col("dl"), col("term"), col("positions"))
    val stats = spark.table(s"${name}_meta")
      .select(col("n_docs"), col("sum_dl"))
    scorePhrase(pos, stats, phrase, topK, k1, b)
  }

  /** Per-document TF-IDF keyword extraction — the tagging pass that
    * labels every document with its most distinctive terms (topical
    * routing, cluster naming, index-card metadata): score(d, t) =
    * tf · ln(N/df), each document's topK terms by (score desc, term)
    * with the tie-break making the output deterministic.
    *
    * Scale shape: ONE term-keyed exchange serves the whole plan —
    * the (doc, term) tf aggregate, the df aggregate AND the tf×df
    * join all run on it without re-shuffling, because a partitioning
    * on `term` satisfies every downstream clustering ({term} ⊆
    * {doc, term}); N is a one-row broadcast. The per-doc top-k is a
    * doc-keyed aggregate whose collect_list is bounded by the
    * document's own distinct-term count (the d41 per-doc-array
    * bound), sliced after an array_sort — never a corpus-wide rank
    * window. Returns (doc_id, rank, term, score), score rounded to
    * 4 decimals BEFORE ranking (§6 rule — both engines rank the
    * identical doubles). Null id/text rows are dropped. */
  def tfidfKeywords(docs: DataFrame, idCol: String, textCol: String,
      topK: Int = 3): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val live = docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
    val nDocs = live.agg(count(lit(1)).as("n_docs"))
    val keyed = live
      .select(col(idCol).as("doc_id"),
        explode(Dedup.tokens(col(textCol))).as("term"))
      .repartition(col("term"))
    val tf = keyed.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df_t"))
    val scored = tf.join(dfT, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"),
        round(col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df_t").cast("double")),
          4).as("score"))
    scored.groupBy(col("doc_id"))
      .agg(slice(array_sort(collect_list(struct(
        (-col("score")).as("ns"), col("term"), col("score")))),
        1, topK).as("top"))
      .select(col("doc_id"), posexplode(col("top")))
      .select(col("doc_id"), (col("pos") + 1).as("rank"),
        col("col.term").as("term"), col("col.score").as("score"))
  }
}
