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
}
