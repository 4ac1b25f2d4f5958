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
      rowIdCol: String): DataFrame = {
    val probeCols = probe.columns
    val tagged = probe.withColumn("__is_probe", lit(true))
      .unionByName(
        ref.select(col(keyCol), col(tsCol), col(rowIdCol))
          .withColumn("__is_probe", lit(false)),
        allowMissingColumns = true)
    asOfPrior(tagged, col(keyCol), col(tsCol), col(rowIdCol),
      probeWhen = col("__is_probe"), refWhen = !col("__is_probe"))
      .select(probeCols.map(col) :+ col("asof_ts"): _*)
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
