package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Bucketing

/** The CORPUS OPS CARD — one row per persistent index family, the
  * page an operator actually reads before deciding what maintenance
  * to schedule. Every family already carries a stats verb
  * ([[Dedup.dedupIndexStats]], [[Similarity.annIndexStats]],
  * [[Retrieval.bm25IndexStats]], [[Dedup.urlIndexStats]]) — this is
  * their composition plus the two columns none of them can see
  * alone:
  *
  *   - `drift_vs_landed` — the landed corpus count minus the index's
  *     item count: the alarm that schedules
  *     [[Retrieval.reconcileBm25Index]] / a rebuild (a non-zero
  *     drift means the index no longer describes what actually
  *     landed — the exact condition the reconciliation verbs exist
  *     for);
  *   - `pending_verb` — what is in flight or interrupted on the
  *     index right now: a live single-writer lease (verb name), an
  *     un-rolled-forward maintenance marker (reband/rebalance/
  *     rechunk), or an unfinished compaction swap. `idle` is the
  *     healthy reading; anything else names the verb to finish.
  *
  * Scale shape: each family contributes one narrow COUNT over its
  * own bucketed table (map-side partials, a one-row gather) crossed
  * with one one-row count of the landed frame; marker/lease probes
  * are driver-side filesystem stats. Nothing corpus-sized moves.
  *
  * Reference anchor: the reference operates its store through
  * per-table console dashboards (terraform/main.tf:84-96 provisions
  * the Glue/Athena surfaces an operator inspects); the ops card is
  * that observability surface re-expressed as one queryable frame.
  */
object OpsCard {

  /** One index family's slot in the card: `family` ∈ {"dedup",
    * "ann", "sim", "bm25", "url"}, `name` the index name, `landed`
    * the frame of what the pipeline actually landed for this family
    * (the sink the index is supposed to mirror) with `idCol` its
    * identity column — null ids are dropped before counting, the
    * same door every index build applies. */
  final case class Entry(family: String, name: String,
      landed: DataFrame, idCol: String)

  private def nItemsOf(spark: SparkSession, e: Entry): DataFrame =
    e.family match {
      case "dedup" =>
        spark.table(s"${e.name}_docs").agg(count(lit(1)).as("n_items"))
      case "bm25" =>
        spark.table(s"${e.name}_docs").agg(count(lit(1)).as("n_items"))
      case "ann" =>
        spark.table(s"${e.name}_vectors")
          .agg(count(lit(1)).as("n_items"))
      case "sim" =>
        // every signature emits EXACTLY maxDist+1 pigeonhole chunk
        // rows, so items = chunks / (maxDist+1) with no distinct —
        // the exchange-free count (a countDistinct over doc_id would
        // shuffle the whole chunk table for the same number)
        val maxDist = spark.table(s"${e.name}_meta").head()
          .getAs[Int]("max_dist")
        spark.table(s"${e.name}_chunks")
          .agg((count(lit(1)) / lit(maxDist + 1)).cast("long")
            .as("n_items"))
      case "url" =>
        spark.table(s"${e.name}_url").agg(count(lit(1)).as("n_items"))
      case other => throw new IllegalArgumentException(
        s"indexOpsCard: unknown family '$other' — one of " +
          "dedup/ann/sim/bm25/url")
    }

  private def numBucketsOf(spark: SparkSession, e: Entry): Int =
    spark.table(s"${e.name}_meta").head().getAs[Int]("num_buckets")

  /** What is in flight or interrupted on the index, by descending
    * urgency: a live lease names a RUNNING (or crashed-holding)
    * verb; a maintenance marker names an interrupted two-table
    * promotion the next open()/verb will roll forward; a swap
    * marker, an unfinished compaction. `idle` otherwise. */
  private def pendingVerbOf(spark: SparkSession, e: Entry): String = {
    val n = e.name.toLowerCase
    Bucketing.leaseHolder(spark, n).map(v => s"lease:$v").getOrElse {
      val markers = Seq(
        s"${n}__reband_pending" -> "reband_pending",
        s"${n}__rebalance_pending" -> "rebalance_pending",
        s"${n}__rechunk_pending" -> "rechunk_pending")
      markers.collectFirst {
        case (tag, label)
          if Bucketing.maintenanceMarkerExists(spark, tag) => label
      }.getOrElse {
        val tables = e.family match {
          case "dedup" => Seq("_bands", "_docs", "_ch")
          case "bm25"  => Seq("_postings", "_df", "_docs")
          case "ann"   => Seq("_vectors")
          case "sim"   => Seq("_chunks", "_vchunks", "_vframes")
          case "url"   => Seq("_url")
        }
        if (tables.exists(t => Bucketing.maintenanceMarkerExists(
          spark, s"$n${t}__swap_pending"))) "compact_swap_pending"
        else "idle"
      }
    }
  }

  /** Builds the card: one row per entry, (family, index_name,
    * n_items, n_buckets, pending_verb, n_landed, drift_vs_landed),
    * ordered by family for a deterministic read. */
  def indexOpsCard(spark: SparkSession, entries: Seq[Entry]): DataFrame = {
    require(entries.nonEmpty, "indexOpsCard: no entries")
    require(entries.map(_.family).distinct.size == entries.size,
      "indexOpsCard: one entry per family (duplicate family passed)")
    entries.map { e =>
      val landedN = e.landed.filter(col(e.idCol).isNotNull)
        .agg(count(lit(1)).as("n_landed"))
      nItemsOf(spark, e)
        .crossJoin(broadcast(landedN))
        .select(
          lit(e.family).as("family"),
          lit(e.name).as("index_name"),
          col("n_items"),
          lit(numBucketsOf(spark, e)).as("n_buckets"),
          lit(pendingVerbOf(spark, e)).as("pending_verb"),
          col("n_landed"),
          (col("n_landed") - col("n_items")).as("drift_vs_landed"))
    }.reduce(_ unionByName _).orderBy(col("family"))
  }
}
