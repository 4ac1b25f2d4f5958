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
