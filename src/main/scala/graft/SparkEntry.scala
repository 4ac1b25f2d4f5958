package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-block query registries (BBlock analytics, ABlock
  * reference surface, CBlock streaming batch-equivalents, DBlock
  * LLM-data-pipeline operators). Each block keeps its Spark plan and
  * DuckDB oracle side by side.
  */
object SparkEntry {

  private def blocks: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (ABlock.queries, ABlock.oracles),
      (BBlock.queries, BBlock.oracles),
      (CBlock.queries, CBlock.oracles),
      (DBlock.queries, DBlock.oracles))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("b2_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    blocks.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    blocks.map(_._2).reduce(_ ++ _)
}
