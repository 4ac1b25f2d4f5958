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
}
