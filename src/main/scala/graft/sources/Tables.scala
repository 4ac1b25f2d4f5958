package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables.
  *
  * `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
  * reader only accepts as a raw long (spark.sql.legacy.parquet
  * .nanosAsLong). We read it that way and keep `ts` as long
  * nanoseconds; downstream code derives epoch-ms / epoch-us /
  * timestamps with integer arithmetic (never double division, which
  * would lose precision on int64 nanos).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private def withNanosAsLong[T](spark: SparkSession)(f: => T): T = {
    val k = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(k)
    spark.conf.set(k, "true")
    try f finally prev match {
      case Some(v) => spark.conf.set(k, v)
      case None    => spark.conf.set(k, "false")
    }
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") withNanosAsLong(spark) {
      spark.read.parquet(s"$dir/events.parquet")
    } else spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `ts` column is LongType epoch-nanoseconds (see class doc). */
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
