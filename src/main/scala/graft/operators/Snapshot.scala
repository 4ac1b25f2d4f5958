package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot delta — the between-crawls diff every refreshed
  * training corpus needs before re-running curation: which documents
  * are NEW since the last snapshot (only they need the expensive
  * decode/score/dedup passes — the D29 incremental-batch input),
  * which DISAPPEARED (retire them from the persistent indexes — the
  * D35/D45/D51/D60 retire verbs' input), and which CHANGED content
  * under a stable id (re-score + re-index). Reference scope:
  * xgp/keycloak-event-stream has no snapshot surface; this is
  * engine-own pipeline ground (the same delta discipline as
  * warehouse snapshot diffing).
  *
  * Scale shape: both sides project to (id, md5-fingerprint) BEFORE
  * the join — the shuffle carries two narrow columns, never document
  * text — and the single FULL OUTER equi-join on id is
  * SHUFFLE_HASH-hinted (per-partition build is corpus-rows /
  * shuffle-partitions of 2-column rows; AQE re-plans skew). No
  * windows, no driver pulls; the output is itself a dataset, one row
  * per id in either snapshot.
  */
object Snapshot {

  /** Diff two snapshots of a corpus keyed by `idCol` with content
    * column `textCol` (any string column — raw text, serialized
    * payload, a precomputed content hash).
    *
    * Returns (doc_id, status, fp_old, fp_new): status in
    * {'added', 'removed', 'changed', 'unchanged'}; fp_* are the md5
    * content fingerprints (null on the absent side). Null-id or
    * null-content rows are excluded on both sides (the corpus
    * liveness contract shared with the dedup family). */
  def corpusDiff(oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    def fp(df: DataFrame, out: String): DataFrame = df
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), md5(col(textCol)).as(out))
    val o = fp(oldSnap, "fp_old")
    val n = fp(newSnap, "fp_new")
    o.join(n.hint("SHUFFLE_HASH"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("fp_old").isNull, lit("added"))
          .when(col("fp_new").isNull, lit("removed"))
          .when(col("fp_old") === col("fp_new"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        col("fp_old"), col("fp_new"))
  }

  /** The one-line rollup of [[corpusDiff]]: (status, n) — the
    * monitoring row a scheduled re-crawl emits. Rides the diff's
    * partitioning into a 4-row aggregate. */
  def corpusDiffSummary(oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String, textCol: String): DataFrame =
    corpusDiff(oldSnap, newSnap, idCol, textCol)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))

  /** Vocabulary DRIFT between two corpus snapshots — the distribution
    * monitor behind [[corpusDiff]]'s row-level delta: per token, how
    * did its unigram probability move between crawls? A refreshed
    * corpus whose token distribution shifts hard (a spam burst, a
    * scrape-source change, a boilerplate invasion) deserves a
    * re-curation pass even when row-level churn looks modest — and a
    * trained tokenizer/LM whose corpus drifts is the D68 rebuild
    * trigger's text-side sibling.
    *
    * Output: the `topK` tokens by absolute probability shift as
    * (t, c_old, c_new, shift) — raw integer counts on both sides
    * (absent = 0) plus the add-one-smoothed log-ratio
    * `shift = ln((c_new+1)/(N_new+V)) − ln((c_old+1)/(N_old+V))`
    * (V = union vocabulary, so the smoothing is defined for
    * one-sided tokens; rounded to 4 decimals, §6's rule).
    * Ranking uses the CROSS-MULTIPLIED integer |c_new·N_old −
    * c_old·N_new| (∝ |p_new − p_old|, exact — no float ordering at
    * the cut), carried as decimal(18,0)·decimal(18,0) →
    * decimal(37,0) so the product cannot overflow below ~1e18
    * tokens per side; ties break on the token.
    *
    * Scale shape: each side is one token explode + one token-keyed
    * count aggregate (map-side partials; a zipf-head token is one
    * GROUP, never one task's row set); the two count tables —
    * vocabulary-sized, orders below the streams — meet in ONE
    * full-outer SHUFFLE_HASH join, pinned once; N totals ride
    * narrow no-explode scans broadcast as 1-row joins (the d33
    * discipline) and V is one aggregate over the pinned join. The
    * top-k is TakeOrderedAndProject, never a rank window. */
  def vocabDrift(oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String, textCol: String, topK: Int = 50): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    def live(df: DataFrame): DataFrame =
      df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
    def counts(df: DataFrame, out: String): DataFrame = live(df)
      .select(explode(Dedup.tokens(col(textCol))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as(out))
    def total(df: DataFrame, out: String, dec: String): DataFrame = live(df)
      .agg(sum(size(Dedup.tokens(col(textCol)))).as("__tl"))
      .select(col("__tl").cast("double").as(out),
        col("__tl").cast("decimal(18,0)").as(dec))
    val joined = counts(oldSnap, "c_old")
      .join(counts(newSnap, "c_new").hint("SHUFFLE_HASH"),
        Seq("t"), "full_outer")
      .select(col("t"),
        coalesce(col("c_old"), lit(0L)).as("c_old"),
        coalesce(col("c_new"), lit(0L)).as("c_new"))
      .localCheckpoint(true) // V aggregate + drift ranking share it
    val v = joined.agg(count(lit(1)).cast("double").as("v"))
    val drift = abs(col("c_new").cast("decimal(18,0)") * col("n_old")
      - col("c_old").cast("decimal(18,0)") * col("n_new"))
    joined
      .crossJoin(broadcast(total(oldSnap, "tot_old", "n_old")))
      .crossJoin(broadcast(total(newSnap, "tot_new", "n_new")))
      .crossJoin(broadcast(v))
      .select(col("t"), col("c_old"), col("c_new"),
        round(log((col("c_new") + 1).cast("double")
            / (col("tot_new") + col("v")))
          - log((col("c_old") + 1).cast("double")
            / (col("tot_old") + col("v"))), 4).as("shift"),
        drift.as("__drift"))
      .orderBy(col("__drift").desc, col("t"))
      .limit(topK)
      .select(col("t"), col("c_old"), col("c_new"), col("shift"))
  }
}
