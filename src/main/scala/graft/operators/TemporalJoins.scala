package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the reference's SQL surface lacks natively:
  * as-of (latest prior match) and bounded time-range joins.
  *
  * Both are expressed in shuffle-friendly forms:
  * - as-of over a SHARED partitioning: one sort per key partition, a
  *   running max over the tagged union — no join at all.
  * - range join via the bucket trick: the inequality predicate
  *   `r.ts ∈ [l.ts - W, l.ts)` becomes an equi-join on (key, bucket)
  *   probing exactly two W-wide buckets, then an exact filter. This
  *   turns an O(n·m) theta-join into a linear-shuffle equi-join —
  *   the standard rewrite when a time-window join is the bottleneck.
  */
object TemporalJoins {

  /** For each row matching `probeWhen`, the greatest `tsCol` of a row
    * matching `refWhen` with strictly smaller (ts, tiebreak) in the
    * same `keyCol` group — the as-of lookup, computed with a running
    * windowed max over the shared key partitioning (no join, one
    * shuffle, one sort). Monotone frames make max == latest. */
  def asOfPrior(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      tiebreak: Column,
      probeWhen: Column,
      refWhen: Column): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsCol, tiebreak)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("asof_ts", max(when(refWhen, tsCol)).over(w))
      .filter(probeWhen)
  }

  /** [[asOfPrior]] for ZIPF-HEAD keys: the classic form sorts a hot
    * key's ENTIRE row set in one task (the per-key window), which is
    * the failure mode when one user/entity carries millions of rows.
    * This variant two-levels the running max by TIME BUCKET — the
    * only salt that preserves prefix semantics (a random salt would
    * break "prior"):
    *   1. one hash aggregate: per (key, bucket) max ref ts;
    *   2. a per-key window over the BUCKET table (rows = distinct
    *      buckets per key, bounded by time-range/bucketUs — never by
    *      row count) computes each bucket's exclusive prior max;
    *   3. rows join their bucket's prior max on (key, bucket) and an
    *      in-bucket window (partition width = one key's rows in ONE
    *      bucket) supplies the same-bucket strictly-prior max;
    *   asof_ts = greatest of the two (greatest skips nulls).
    * Same contract as [[asOfPrior]] bit for bit; the hot key's sort
    * is sharded across its time buckets. Pick `bucketUs` so a head
    * key's densest bucket fits a task sort (e.g. an hour).
    */
  def asOfPriorSalted(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      tiebreak: Column,
      probeWhen: Column,
      refWhen: Column,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be > 0, got $bucketUs")
    val bucketed = df
      .withColumn("__bnum", tsCol - pmod(tsCol, lit(bucketUs)))
      .withColumn("__b", expr(s"__bnum DIV ${bucketUs}L"))
      .drop("__bnum")
    val bucketPrior = bucketed
      .groupBy(keyCol.as("__k"), col("__b"))
      .agg(max(when(refWhen, tsCol)).as("__bmax"))
      .withColumn("__prior_bmax",
        max(col("__bmax")).over(Window.partitionBy(col("__k"))
          .orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("__k"), col("__b"), col("__prior_bmax"))
    val winb = Window.partitionBy(keyCol, col("__b"))
      .orderBy(tsCol, tiebreak)
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .join(bucketPrior.hint("SHUFFLE_HASH"),
        // null-safe on both: a null key groups like the classic
        // window's null partition, a null ts lands in the null bucket
        keyCol <=> col("__k") && bucketed("__b") <=> bucketPrior("__b"))
      .drop("__k").drop(bucketPrior("__b"))
      .withColumn("__inb_max", max(when(refWhen, tsCol)).over(winb))
      .withColumn("asof_ts", greatest(col("__inb_max"), col("__prior_bmax")))
      .filter(probeWhen)
      .drop("__b", "__inb_max", "__prior_bmax")
  }

  /** Two-table as-of join: every probe row gains `asof_ts` — the
    * greatest ref timestamp strictly before its own (per key), null
    * when no ref precedes. Front door over [[asOfPrior]]: tags both
    * sides, unions them into ONE key-partitioned frame, and computes
    * the lookup as a running windowed max — one shuffle, one sort, no
    * join operator, which is the shape that survives a fact-sized ref
    * side (a join would shuffle both tables AND risk skew on hot
    * keys; the union sorts each key partition once).
    *
    * Probe columns are preserved; ref rows contribute only their
    * timestamps. Ties on (ts) break by rowId: a ref row at the same
    * (ts, rowId-ordering) BEFORE the probe row counts as prior.
    */
  def asOfJoin(
      probe: DataFrame,
      ref: DataFrame,
      keyCol: String,
      tsCol: String,
      rowIdCol: String,
      bucketUs: Long = 0L): DataFrame = {
    val probeCols = probe.columns
    val tagged = probe.withColumn("__is_probe", lit(true))
      .unionByName(
        ref.select(col(keyCol), col(tsCol), col(rowIdCol))
          .withColumn("__is_probe", lit(false)),
        allowMissingColumns = true)
    val looked =
      if (bucketUs > 0L)
        asOfPriorSalted(tagged, col(keyCol), col(tsCol), col(rowIdCol),
          probeWhen = col("__is_probe"), refWhen = !col("__is_probe"),
          bucketUs = bucketUs)
      else
        asOfPrior(tagged, col(keyCol), col(tsCol), col(rowIdCol),
          probeWhen = col("__is_probe"), refWhen = !col("__is_probe"))
    looked.select(probeCols.map(col) :+ col("asof_ts"): _*)
  }

  /** Floor division (rounds toward -∞, unlike DIV's truncation toward
    * zero): keeps adjacent buckets aligned for negative timestamps
    * too. `x - pmod(x, d)` is exactly divisible by d, so DIV on it is
    * exact integer arithmetic — no double rounding. */
  private def floorDiv(colName: String, d: Long): Column =
    expr(s"($colName - pmod($colName, ${d}L)) DIV ${d}L")

  /** For each left row: the count of right rows with the same key and
    * `rightTs ∈ [leftTs - windowUs, leftTs)`, as `n_prior` (0 when
    * none). Bucketed equi-join: each left row probes its own and the
    * previous W-bucket; exact range filter afterwards. */
  def priorCountInWindow(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      windowUs: Long): DataFrame = {
    val probes = left
      .select(col(keyCol).as("k"), col(tsCol).as("lts"), col(idCol).as("lid"))
      .withColumn("bucket",
        explode(array(floorDiv("lts", windowUs), floorDiv("lts", windowUs) - 1)))
    val build = right
      .select(col(keyCol).as("k"), col(tsCol).as("rts"))
      .withColumn("bucket", floorDiv("rts", windowUs))

    val counts = probes.join(build, Seq("k", "bucket"))
      .filter(col("rts") >= col("lts") - windowUs && col("rts") < col("lts"))
      .groupBy(col("lid"))
      .agg(count(lit(1)).as("n_prior"))

    left.select(col(idCol).as("lid"), col(keyCol), col(tsCol))
      .join(counts, Seq("lid"), "left")
      .select(col("lid").as(idCol), col(keyCol), col(tsCol),
        coalesce(col("n_prior"), lit(0L)).as("n_prior"))
  }
}
