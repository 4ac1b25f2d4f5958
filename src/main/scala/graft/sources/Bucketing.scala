package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout for shuffle-free co-located joins.
  *
  * At 100 TB the dominant cost of a fact-fact join is the shuffle of
  * both sides. Writing each fact table bucketed (and sorted) by its
  * join key lets Spark plan a SortMergeJoin whose children read
  * pre-partitioned, pre-sorted buckets — zero Exchange, zero Sort at
  * query time. This is the Spark analog of the co-located layouts
  * MPP warehouses use for their distribution keys, and the standard
  * answer to "this join's shuffle is the bottleneck".
  *
  * Bucket count guidance: pick so each bucket file lands in the
  * 128 MB–1 GB range at the target scale; the count must match on
  * both sides of the join (or divide evenly) for co-location.
  */
object Bucketing {

  /** Drop a table AND its leftover warehouse directory. A fresh
    * session's in-memory catalog forgets managed tables but their
    * directories persist, and a stale location fails the next CREATE
    * with LOCATION_ALREADY_EXISTS. */
  private def dropStale(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Write `df` as a bucketed+sorted managed table. Idempotent across
    * sessions (see [[dropStale]]). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int): Unit = {
    dropStale(df.sparkSession, table)
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** APPEND to an existing bucketed table with a matching spec — new
    * rows land in new per-bucket files (no rewrite of existing data),
    * which is what makes a bucketed layout maintainable incrementally
    * (the [[graft.operators.Dedup]] persistent index append path). */
  def appendBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int): Unit =
    df.write
      .mode("append")
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Write a small unbucketed managed table (drop-and-replace,
    * idempotent across sessions like [[writeBucketed]]). */
  def writeTable(df: DataFrame, table: String): Unit = {
    dropStale(df.sparkSession, table)
    df.write.mode("overwrite").format("parquet").saveAsTable(table)
  }

  /** Rewrites a bucketed table accreted by [[appendBucketed]] back to
    * one file per bucket (every append adds a file per bucket; after
    * K appends each bucketed scan opens K× the files). The rewrite
    * stages into a `__compact_tmp` table first and swaps via
    * drop+rename, so the live table is replaced only after the
    * compacted copy fully exists; a crash between the drop and the
    * rename is recovered on the next call (within a session — the
    * in-memory catalog doesn't survive a restart, and a lost index
    * table is rebuildable from its source by construction). */
  def compactBucketed(
      df: DataFrame => DataFrame = identity)(
      spark: SparkSession, table: String, bucketCol: String,
      numBuckets: Int): Unit = {
    val tmp = s"${table}__compact_tmp"
    if (!spark.catalog.tableExists(table)) {
      require(spark.catalog.tableExists(tmp),
        s"neither $table nor its compact staging exists")
      spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$table`")
      return
    }
    dropStale(spark, tmp)
    df(spark.table(table)).write
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tmp)
    spark.sql(s"DROP TABLE `$table`")
    spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$table`")
  }

  /** Event-store layout for user-centric workloads: dt/hour PARTITIONS
    * (time-range directory pruning, like [[EventStore.write]]) plus
    * userid BUCKETS inside each partition — per-user aggregations,
    * sessionization, and event↔event self-joins on userid read
    * pre-clustered buckets instead of shuffling the fact table each
    * query. The write pays the one-time shuffle the queries skip. */
  def writeBucketedEvents(
      events: DataFrame,
      table: String,
      numBuckets: Int = 8): Unit = {
    dropStale(events.sparkSession, table)
    EventStore.withPartitionColumns(events)
      .write
      .mode("overwrite")
      .format("parquet")
      .partitionBy("dt", "hour")
      .bucketBy(numBuckets, "userid")
      .sortBy("userid")
      .saveAsTable(table)
  }
}
