package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev measurement harness (NOT an operator): the sf0.1 → "sf1"
  * scaling probe the round-8 verdict asked for. All correctness
  * evidence runs at sf0.001–0.1; the 100 TB posture arguments are
  * plan-shape arguments. This probe adds the one empirical point the
  * driver's testdata can't: a 10× corpus, to confirm the near-linear
  * scaling the plans promise and surface any super-linearity early
  * (candidate width in d20, twin aggregates in d29/d30, the gram
  * exchanges in d36/d37, the small-graph threshold in d18/d27).
  *
  * The 10× corpus lives under tmp/sf1 (repo-local, git-ignored) and
  * is DERIVED from the driver's sf0.1 tables, never synthesized
  * fresh: 10 copies of `documents` with doc_ids shifted and every
  * token salted with a per-copy suffix (regexp `(\S+)` → `$1c<i>`;
  * copy 0 keeps the original text bit-for-bit). The salt matters:
  * unsalted copies would make every document 9 exact twins, so
  * near-dup pair counts would grow ~45× by construction (a data
  * artifact, not engine behavior), while salted copies keep each
  * copy's internal near-dup structure identical to sf0.1 → the
  * linear-scaling expectation for pair outputs is exactly 10×.
  * `lineitem` is unioned 10× unsalted (the b2 control is a pure
  * aggregate; key multiplicity is irrelevant).
  *
  * Each probed query runs twice per scale and the SECOND time is
  * reported (same steady-state discipline as Bench); ratios print as
  * a markdown table for SURVEY §11e.
  */
object ScaleProbe {
  private val Sf01 = "/root/testdata/sf0.1"
  private val Sf1 = "/root/repo/tmp/sf1"

  private val probes = Seq(
    "b2_agg",               // lineitem control: pure partial agg
    "d20_ngram_unblocked",  // candidate width (minhash-band fallback)
    "d29_simhash_oracle",   // twin signature aggregate + brute pairs
    "d30_minhash_oracle",   // twin banding
    "d36_substring_dedup",  // gram exchange + islands
    "d37_gram_profile",     // shared gram pass, two window specs
    "d38_span_cut",         // spans + reconstruct join
    "d39_temperature_sample", // count agg + scan filter
    "d40_incremental_dedup",  // batch-vs-corpus band screen
    "d18_neardup_components", // components incl. small-graph path
    "d27_text_dedup",       // full text dedup pipeline
    "d43_decontaminate",    // broadcast holdout gram screen
    "d44_redact_pii",       // regex scrub scan
    "d45_shuffle_shard",    // shard-keyed window
    "d46_indexed_dedup",    // index build + screen end to end
    "d47_budget_select")    // two-phase prefix sum + budget filter

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    buildIfMissing(spark)

    def timeWarm(name: String, dir: String): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      once(); once()
    }

    println("| query | sf0.1 s | sf1 s | ratio (linear=10) |")
    println("|---|---|---|---|")
    probes.foreach { q =>
      try {
        val a = timeWarm(q, Sf01)
        val b = timeWarm(q, Sf1)
        println(f"| $q | $a%.2f | $b%.2f | ${b / a}%.1f |")
      } catch {
        case e: Throwable => println(s"| $q | FAILED ${e.getMessage} | | |")
      }
    }
    spark.stop()
  }

  private def buildIfMissing(spark: SparkSession): Unit = {
    val marker = new java.io.File(s"$Sf1/_SUCCESS_PROBE")
    if (marker.exists()) return
    new java.io.File(Sf1).mkdirs()

    val docs = spark.read.parquet(s"$Sf01/documents.parquet")
    // 5000 docs at sf0.1; shift well clear of the id range per copy
    val copies = (0 until 10).map { i =>
      if (i == 0) docs
      else docs.select(
        (col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"$$1c$i").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    copies.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$Sf1/documents.parquet")

    val li = spark.read.parquet(s"$Sf01/lineitem.parquet")
    (0 until 10).map(_ => li).reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$Sf1/lineitem.parquet")

    marker.createNewFile()
  }
}
