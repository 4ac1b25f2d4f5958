package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** dt/hour-partitioned parquet event store — the Spark-native
  * re-expression of the reference's Firehose→S3 landing zone
  * (terraform/main.tf:84-96: `dt=yyyy-MM-dd/hour=H` partition
  * projection over Snappy parquet).
  *
  * - Writes are hive-partitioned on (dt, hour), so any query with a
  *   time predicate prunes partitions at planning time — the Spark
  *   analog of Athena partition projection, visible as
  *   "PartitionFilters" in `.explain`.
  * - `maxRecordsPerFile` caps file size; at 100 TB the knob that
  *   matters is files-per-partition ≈ ingest parallelism, and hourly
  *   partitions keep each directory listing small.
  * - Retention (clearExpiredEvents) is declared a no-op in the
  *   reference (FirehoseEventStoreProvider.java:102-121, lifecycle
  *   delegated to S3); a standalone engine must own it, so we
  *   implement a partition-pruned sweep: whole partitions strictly
  *   older than the cutoff are dropped by directory delete (no data
  *   scan), and only the single boundary hour is rewritten.
  */
object EventStore {

  /** Add the dt/hour partition columns derived from epoch-ms `time`. */
  def withPartitionColumns(events: DataFrame): DataFrame =
    events
      .withColumn("dt", date_format(timestamp_millis(col("time")), "yyyy-MM-dd"))
      .withColumn("hour", (expr("time DIV 3600000") % 24).cast("int"))

  /** Append a KeycloakEvent-shaped batch, partitioned dt/hour.
    *
    * `sortWithin` optionally clusters rows inside each hour partition
    * by secondary columns (e.g. userid): combined with
    * maxRecordsPerFile this yields files with tight parquet min/max
    * stats on those columns, so selective equality queries skip whole
    * files/row-groups — the single-dimension analog of Z-ordering,
    * and the cheap answer for "point lookups on a non-partition
    * column" at scale. */
  def write(events: DataFrame, path: String,
      maxRecordsPerFile: Int = 1000000,
      sortWithin: Seq[String] = Nil): Unit = {
    val partitioned = withPartitionColumns(events)
    val arranged =
      if (sortWithin.isEmpty) partitioned
      else partitioned
        .repartition(col("dt"), col("hour"))
        .sortWithinPartitions(
          (Seq("dt", "hour") ++ sortWithin).map(col): _*)
    arranged
      .write
      .mode("append")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy("dt", "hour")
      .parquet(path)
  }

  /** Read the store; time predicates prune dt/hour partitions. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Compact fragmented partitions: any hour directory with more than
    * `maxFilesPerPartition` data files is rewritten as a single file
    * (streaming micro-batches land one file per trigger per task —
    * at an hourly partition grain that accumulates into the
    * small-file problem that kills scan throughput at scale).
    * Partition-local: only oversized partitions are touched, each
    * rewritten and atomically swapped. Drops any streaming metadata
    * log for the same reason clearExpired does. Returns the number of
    * partitions compacted.
    */
  def compact(spark: SparkSession, path: String,
      maxFilesPerPartition: Int = 4): Int = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    val metadataLog = new Path(root, "_spark_metadata")
    if (fs.exists(metadataLog)) fs.delete(metadataLog, true)

    var compacted = 0
    for (dtDir <- fs.listStatus(root) if dtDir.isDirectory;
         hourDir <- fs.listStatus(dtDir.getPath) if hourDir.isDirectory) {
      val dataFiles = fs.listStatus(hourDir.getPath)
        .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
          !f.getPath.getName.startsWith("."))
      if (dataFiles.length > maxFilesPerPartition) {
        val partPath = hourDir.getPath.toString
        val rows = spark.read.parquet(partPath).coalesce(1).cache()
        rows.count() // materialize before the swap
        rows.write.mode("overwrite").parquet(partPath + "_compact")
        rows.unpersist()
        fs.delete(hourDir.getPath, true)
        fs.rename(new Path(partPath + "_compact"), hourDir.getPath)
        compacted += 1
      }
    }
    compacted
  }

  /** Delete events with time < olderThanMs.
    *
    * Partition-pruned: hours strictly before the boundary hour are
    * removed as whole directories (metadata-only, no row scan); the
    * boundary hour partition — the only one that can contain both
    * kept and expired rows — is rewritten with the surviving rows.
    * Returns the number of whole partitions dropped.
    */
  def clearExpired(spark: SparkSession, path: String, olderThanMs: Long): Int = {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd")
      .withZone(java.time.ZoneOffset.UTC)

    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0

    // A store fed by the streaming sink carries a _spark_metadata
    // write-ahead log; readers then list files from the log, not the
    // directory, and would crash on the files we are about to delete.
    // The log's only purpose is exactly-once streaming appends — after
    // a retention rewrite it no longer describes the store, so drop it
    // and let readers fall back to partition discovery. (Re-attaching
    // a streaming sink afterwards requires a fresh checkpoint, as with
    // any externally-compacted streaming output directory.)
    val metadataLog = new Path(root, "_spark_metadata")
    if (fs.exists(metadataLog)) fs.delete(metadataLog, true)

    var dropped = 0
    for (dtDir <- fs.listStatus(root) if dtDir.isDirectory) {
      val dtName = dtDir.getPath.getName // dt=yyyy-MM-dd
      if (dtName.startsWith("dt=")) {
        val dt = dtName.stripPrefix("dt=")
        for (hourDir <- fs.listStatus(dtDir.getPath) if hourDir.isDirectory) {
          val hourName = hourDir.getPath.getName // hour=H
          if (hourName.startsWith("hour=")) {
            val hour = hourName.stripPrefix("hour=").toInt
            val partStartMs = java.time.LocalDate
              .parse(dt, fmt).atStartOfDay(java.time.ZoneOffset.UTC)
              .toInstant.toEpochMilli + hour * 3600000L
            // every row in the partition satisfies
            // partStartMs <= time < partStartMs + 1h
            if (partStartMs + 3600000L <= olderThanMs) {
              // entire hour strictly before the cutoff → drop directory
              fs.delete(hourDir.getPath, true)
              dropped += 1
            } else if (partStartMs < olderThanMs) {
              // boundary hour: rewrite survivors only
              val partPath = hourDir.getPath.toString
              val survivors = spark.read.parquet(partPath)
                .filter(col("time") >= olderThanMs)
                .cache()
              survivors.count() // materialize before overwrite
              survivors.write.mode("overwrite")
                .parquet(partPath + "_rewrite")
              survivors.unpersist()
              fs.delete(hourDir.getPath, true)
              fs.rename(new Path(partPath + "_rewrite"), hourDir.getPath)
            }
          }
        }
        // drop empty dt directories
        if (fs.listStatus(dtDir.getPath).isEmpty) fs.delete(dtDir.getPath, true)
      }
    }
    dropped
  }
}
