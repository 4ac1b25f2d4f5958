package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
      topK: Int = 10): DataFrame = {
    require(k0 >= 1, s"k0 must be >= 1, got $k0")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val a = listA.select(col("query_id"), col("doc_id"),
      col("rank").as("__ra"))
    val b = listB.select(col("query_id"), col("doc_id"),
      col("rank").as("__rb"))
    a.join(b.hint("SHUFFLE_HASH"), Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        (coalesce(lit(1.0) / (lit(k0) + col("__ra")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k0) + col("__rb")), lit(0.0))).as("rrf"))
      .groupBy(col("query_id"))
      .agg(graft.functions.VectorFunctions.topKByCos(
        col("doc_id").cast("long"), col("rrf"), topK).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.neighbor_id").as("doc_id"),
        round(col("col.cos"), 6).as("rrf"))
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
