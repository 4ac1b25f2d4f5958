package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling for corpus curation.
  *
  * The standard way to rebalance a web-scale corpus — downsample the
  * head strata (e.g. English at 40+ % of the crawl) to a language
  * budget — without a shuffle, a sort, or any randomness: membership
  * is a pure function of the row's id, so the same documents are
  * selected on any cluster, any partitioning, any run, and the
  * sample is a subset of any larger-rate sample of the same stratum
  * (nested samples, the property that makes hash sampling the
  * curation default over seeded rand()).
  */
object Sampling {

  /** Keeps each row iff the first two hex chars of md5(id) sort
    * below the row's stratum threshold — rates quantize to 1/256ths
    * (plenty for corpus budgeting; use more prefix chars for finer
    * grain). Rates >= 1.0 keep the whole stratum ("g" sorts above
    * every hex digit). Strata absent from `rates` use `defaultRate`.
    *
    * Scale shape: a codegen'd scan filter — zero shuffle, map-only
    * at 100 TB, and the md5 prefix filter composes with partition
    * pruning and column pruning untouched.
    */
  def stratifiedHashSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 1.0): DataFrame = {
    def thr(rate: Double): String =
      if (rate >= 1.0) "g"
      else f"${math.max(0L, (rate * 256).round)}%02x"
    val threshold = rates.foldLeft(lit(thr(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit(thr(rate))).otherwise(acc)
    }
    df.filter(substring(md5(col(idCol).cast("string")), 1, 2) < threshold)
  }

  /** Temperature resampling — the standard training-mix reweighting
    * pass: flatten a skewed stratum distribution toward uniform by
    * sampling stratum i at rate (n_min / n_i)^(1−T), the largest
    * feasible (no upsampling) rate schedule whose output proportions
    * are ∝ n_i^T. T = 1 keeps the natural mix (all rates 1), T = 0
    * equalizes every stratum down to the smallest. Selection reuses
    * [[stratifiedHashSample]]'s determinism: membership is a pure
    * function of md5(id) against a per-stratum threshold, so the
    * sample is machine-, partitioning- and run-independent, and
    * nested across temperatures (a hotter sample contains every
    * cooler one's rows per stratum).
    *
    * Rates are DERIVED from the corpus itself: one narrow count
    * aggregate, collected to the driver (bounded by the number of
    * distinct strata — the same bounded-pull pattern as the
    * count-min probe keys and IVF centroids), thresholds embedded as
    * literals so the sampling pass stays a pure codegen'd scan
    * filter: zero joins, zero shuffles, map-only at 100 TB.
    *
    * Engine-reproducibility: at T = 0.5 the rate is
    * sqrt(n_min / n_i) — division and sqrt are IEEE-correctly-
    * rounded everywhere, so an external engine re-derives the exact
    * thresholds from its own counts (the d39 oracle does). Other
    * temperatures ride Math.pow, whose last-ULP behavior is
    * engine-specific — fine in production (a one-ULP rate wiggle
    * moves at most one boundary document), but only T = 0.5 is held
    * to the hash-match gate. Thresholds quantize to 1/65536ths
    * (4 md5 hex chars, floor(rate·65536 + 0.5)).
    *
    * Null-stratum rows are dropped (they belong to no mix
    * component). Returns the sampled rows unchanged.
    */
  def temperatureSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      temperature: Double): DataFrame = {
    require(temperature >= 0.0 && temperature <= 1.0,
      s"temperature must be in [0, 1], got $temperature")
    val counts = df.filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol).cast("string").as("__s"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    if (counts.isEmpty) return df.filter(lit(false))
    val nMin = counts.map(_._2).min.toDouble
    def rate(n: Long): Double =
      if (temperature == 0.5) math.sqrt(nMin / n) // exact cross-engine
      else math.pow(nMin / n, 1.0 - temperature)
    def thr(r: Double): String = {
      // quantize FIRST, then the keep-all check: a rate within half
      // a quantum of 1.0 rounds to 65536, whose 5-hex-char rendering
      // would sort BELOW "ffff" and silently select nothing
      val v = math.floor(r * 65536 + 0.5).toLong
      if (v >= 65536L) "g" else f"$v%04x"
    }
    val threshold = counts.foldLeft(lit("0"): Column) {
      case (acc, (s, n)) =>
        when(col(strataCol) === s, lit(thr(rate(n)))).otherwise(acc)
    }
    df.filter(col(strataCol).isNotNull &&
      substring(md5(col(idCol).cast("string")), 1, 4) < threshold)
  }
}
