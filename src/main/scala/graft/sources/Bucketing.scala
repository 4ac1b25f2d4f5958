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

  /** Canonical warehouse directory of a (managed or re-registered)
    * table. */
  private def tableDir(spark: SparkSession, table: String) =
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)

  private def fsOf(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Durable record that [[compactBucketed]]'s swap is between its
    * drop and its rename — the one non-atomic window. Lives in the
    * warehouse DIRECTORY (not the catalog), so it survives a process
    * death even under the default in-memory catalog, letting the
    * next call detect and finish the interrupted swap. */
  private def swapMarker(spark: SparkSession, table: String) =
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"${table.toLowerCase}__swap_pending")

  /** Drop a table AND its leftover warehouse directory. A fresh
    * session's in-memory catalog forgets managed tables but their
    * directories persist, and a stale location fails the next CREATE
    * with LOCATION_ALREADY_EXISTS. Also clears any pending-swap
    * marker: a rebuild supersedes an interrupted compaction. */
  /** Public face of [[dropStale]] for index families with OPTIONAL
    * side tables (the sim index's lazily-created `_vchunks` /
    * `_vframes`): a rebuild must clear them explicitly — they are
    * created by append, so no overwrite path would, and a stale
    * directory from a dead session would otherwise either poison
    * the rebuilt index with the old index's evidence or fail the
    * next lazy create with LOCATION_ALREADY_EXISTS. */
  def dropTableAndDir(spark: SparkSession, table: String): Unit =
    dropStale(spark, table)

  private def dropStale(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = tableDir(spark, table)
    val fs = fsOf(spark, loc)
    if (fs.exists(loc)) fs.delete(loc, true)
    val mk = swapMarker(spark, table)
    if (fs.exists(mk)) fs.delete(mk, false)
  }

  /** Durable filesystem markers for MULTI-table maintenance verbs
    * (the ANN rebalance changes centroids AND assignments together):
    * same warehouse-directory durability as [[swapMarker]], named by
    * the caller, so an index family can declare "the staged state is
    * now the truth" across a process death. */
  private[graft] def createMarker(spark: SparkSession, tag: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), tag)
    fsOf(spark, p).create(p, true).close()
  }
  private[graft] def markerExists(spark: SparkSession, tag: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), tag)
    fsOf(spark, p).exists(p)
  }
  private[graft] def deleteMarker(spark: SparkSession, tag: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), tag)
    val fs = fsOf(spark, p)
    if (fs.exists(p)) fs.delete(p, false)
  }

  // ---------------------------------------------------------------
  // Single-writer LEASE for index lifecycle verbs.
  //
  // Every index family's verbs (append/compact/reband/rebalance/
  // rebuild/rechunk/retire/reconcile) are individually crash-safe,
  // but not CONCURRENT-safe: two sessions running verbs on one index
  // can interleave stage/marker states (a streaming ingest appending
  // while an operator rebands is the realistic 100 TB window). The
  // lease makes that window fail LOUDLY: a verb acquires
  // `<name>__lease` in the warehouse directory before mutating,
  // releases after, and a second writer finding a live lease throws
  // instead of interleaving. A lease older than `staleMs` is STOLEN
  // (the holder is presumed dead — crash-exit never releases), so a
  // crashed verb blocks the index for at most the stale window.
  //
  // Scope, disclosed: the create(overwrite=false) acquire is atomic
  // on HDFS-like stores; on object stores without atomic create the
  // lease is best-effort mutual exclusion — still strictly better
  // than the nothing it replaces, and the steal path's
  // read-check-delete race is bounded by one verb's duration.
  // Re-entrancy is per-thread: a verb that nests other verbs
  // (reconcile → append → repair) holds ONE lease for the whole
  // composition.
  // ---------------------------------------------------------------

  private def leasePath(spark: SparkSession, name: String) =
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"${name.toLowerCase}__lease")

  private val heldLeases = new ThreadLocal[scala.collection.mutable.Set[String]] {
    override def initialValue(): scala.collection.mutable.Set[String] =
      scala.collection.mutable.Set.empty[String]
  }

  /** Default steal-after window: generous against slow verbs (a
    * compaction of a large index), small against operational pain.
    * With the heartbeat (below) refreshing the lease's mtime every
    * `staleMs / 3`, staleness now means CRASHED, not slow — a verb
    * legitimately running for hours keeps its lease fresh. */
  val DefaultLeaseStaleMs: Long = 15L * 60L * 1000L

  private def readLease(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Option[(String, String)] =
    try {
      val in = fs.open(p)
      val raw = try scala.io.Source.fromInputStream(in).mkString
      finally in.close()
      raw.split("\n", 2) match {
        case Array(verb, token) => Some((verb.trim, token.trim))
        case Array(verb) => Some((verb.trim, "")) // pre-token format
        case _ => None
      }
    } catch { case _: Exception => None }

  /** Runs `body` holding the single-writer lease of index `name`.
    * Throws IllegalStateException if another live writer holds it;
    * steals a lease older than `staleMs`. Re-entrant within the
    * acquiring thread (nested verbs share the outer lease).
    *
    * Liveness vs crash is disambiguated by a HEARTBEAT: a daemon
    * thread touches the lease file's mtime every `staleMs / 3`
    * while `body` runs, so a verb slower than the stale window is
    * never mistaken for a dead holder — staleness means the
    * heartbeat stopped, i.e. the holding JVM crashed. Release is
    * FENCED by a unique holder token written into the lease: the
    * finally re-reads the file and deletes it only if the token is
    * still its own, so a holder whose lease WAS stolen (clock skew,
    * a paused JVM outliving the window) can never release the new
    * holder's lease and open the index to a third writer. */
  def withIndexLease[T](spark: SparkSession, name: String, verb: String,
      staleMs: Long = DefaultLeaseStaleMs)(body: => T): T = {
    val key = name.toLowerCase
    if (heldLeases.get.contains(key)) return body
    val p = leasePath(spark, key)
    val fs = fsOf(spark, p)
    if (fs.exists(p)) {
      val st = fs.getFileStatus(p)
      val age = System.currentTimeMillis() - st.getModificationTime
      if (age <= staleMs) {
        val holder = readLease(fs, p).map(_._1).getOrElse("<unreadable>")
        throw new IllegalStateException(
          s"index '$key' is locked by an in-flight '$holder' verb " +
            s"(lease age ${age / 1000}s <= stale window " +
            s"${staleMs / 1000}s) — concurrent lifecycle verbs on one " +
            "index can interleave stage/marker states; wait for the " +
            "holder or, if it is dead, delete the lease at " +
            s"$p or retry after the stale window")
      }
      // stale: the heartbeat stopped, the holder is presumed
      // crashed — steal
      fs.delete(p, false)
    }
    val token = java.util.UUID.randomUUID().toString
    val out = fs.create(p, false) // atomic no-overwrite create
    try out.write(s"$verb\n$token".getBytes("UTF-8")) finally out.close()
    val beatEvery = math.max(staleMs / 3, 50L)
    val stop = new java.util.concurrent.CountDownLatch(1)
    val beat = new Thread(() => {
      while (!stop.await(beatEvery,
        java.util.concurrent.TimeUnit.MILLISECONDS)) {
        try {
          // only the still-owning holder refreshes: a stolen lease
          // is the NEW holder's to keep alive
          if (readLease(fs, p).exists(_._2 == token))
            fs.setTimes(p, System.currentTimeMillis(), -1)
        } catch { case _: Exception => () } // advisory; next beat retries
      }
    }, s"graft-lease-heartbeat-$key")
    beat.setDaemon(true)
    beat.start()
    heldLeases.get += key
    try body
    finally {
      heldLeases.get -= key
      stop.countDown()
      beat.join(1000)
      // fenced release: delete only OUR lease — if it was stolen,
      // the file now carries the new holder's token and must stand
      if (readLease(fs, p).exists(_._2 == token)) fs.delete(p, false)
    }
  }

  /** The verb named in index `name`'s live lease, if one exists —
    * the ops-card observability read of the single-writer protocol
    * (it does NOT check staleness; the card reports what is on
    * disk, the acquiring verb decides whether to steal). */
  def leaseHolder(spark: SparkSession, name: String): Option[String] = {
    val p = leasePath(spark, name.toLowerCase)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) None
    else Some(readLease(fs, p).map(_._1).getOrElse("<unreadable>"))
  }

  /** Public marker probe for ops observability ([[graft.operators
    * .OpsCard]] reads the maintenance markers every family's verbs
    * write; the verbs themselves keep the private[graft] faces). */
  def maintenanceMarkerExists(spark: SparkSession, tag: String): Boolean =
    markerExists(spark, tag)

  /** Cross-restart half of the swap recovery: if a PRIOR PROCESS
    * died inside [[compactBucketed]]'s drop→rename window (durable
    * marker present, catalog — having not survived the restart —
    * knows neither the live nor the staging table), finish the swap
    * at the filesystem level: the staging directory holds the
    * complete compacted copy (it is fully written before the marker
    * appears), so it becomes the live directory. No-op otherwise.
    * Idempotent. Callers then [[registerExisting]] to restore the
    * catalog entry. */
  def finishInterruptedSwap(spark: SparkSession, table: String): Unit = {
    val tmp = s"${table}__compact_tmp"
    val mk = swapMarker(spark, table)
    val fs = fsOf(spark, mk)
    if (!fs.exists(mk)) return
    if (spark.catalog.tableExists(table) || spark.catalog.tableExists(tmp))
      return // in-session state: the catalog-based recovery path owns it
    val live = tableDir(spark, table)
    val stage = tableDir(spark, tmp)
    if (fs.exists(stage)) {
      // marker ⇒ staging is complete; prefer it over any live leftover
      if (fs.exists(live)) fs.delete(live, true)
      fs.rename(stage, live)
    }
    fs.delete(mk, false)
  }

  /** Re-registers a table from its surviving warehouse directory
    * after a restart (the default in-memory catalog forgets every
    * managed table; the parquet files — bucket ids encoded in their
    * file names — persist). Schema is read from the files; the
    * bucket spec must be passed because parquet does not record it.
    * Returns false if the directory does not exist either. */
  def registerExisting(spark: SparkSession, table: String,
      bucketSpec: Option[(String, Int)]): Boolean = {
    if (spark.catalog.tableExists(table)) return true
    val loc = tableDir(spark, table)
    if (!fsOf(spark, loc).exists(loc)) return false
    val cols = spark.read.parquet(loc.toString).schema.fields
      .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
    val cluster = bucketSpec.map { case (c, n) =>
      s"CLUSTERED BY (`$c`) SORTED BY (`$c`) INTO $n BUCKETS "
    }.getOrElse("")
    spark.sql(s"CREATE TABLE `$table` ($cols) USING parquet " +
      cluster + s"LOCATION '${loc}'")
    true
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

  /** READER half of the reader-vs-writer contract on swap-maintained
    * tables: [[compactBucketed]]'s drop→rename window is writer-safe
    * (marker + lease) but a concurrent READER resolving the table
    * inside it sees TABLE_OR_VIEW_NOT_FOUND for the few milliseconds
    * the catalog is between names. This resolve retries while (and
    * only while) the table's swap marker shows a swap in flight —
    * a genuinely absent table still fails immediately and loudly,
    * and the reader never MUTATES anything (rolling an interrupted
    * swap forward is the next WRITER's job; a reader doing it would
    * race the live writer it is waiting for).
    *
    * Scope, disclosed: this closes the RESOLVE window. A reader that
    * resolved the table before the swap and is still scanning its
    * files when the swap deletes them is the scan-time window —
    * closed by [[VersionedTable]], whose published versions are
    * immutable until explicitly retired a generation later. */
  def stableTable(spark: SparkSession, table: String,
      maxWaitMs: Long = 30000L): DataFrame = {
    val mk = swapMarker(spark, table)
    val fs = fsOf(spark, mk)
    val deadline = System.currentTimeMillis() + maxWaitMs
    while (true) {
      try return spark.table(table)
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          if (System.currentTimeMillis() >= deadline || !fs.exists(mk))
            throw e
          Thread.sleep(50L)
      }
    }
    throw new IllegalStateException("unreachable")
  }

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
    * compacted copy fully exists. The drop→rename window is guarded
    * by a durable filesystem marker ([[swapMarker]]): a crash inside
    * it is finished on the next call — same-session via the catalog
    * (live gone, staging present → rename), across a restart via
    * [[finishInterruptedSwap]] (catalog gone, marker + staging
    * directory present → filesystem-level rename). */
  def compactBucketed(
      df: DataFrame => DataFrame = identity)(
      spark: SparkSession, table: String, bucketCol: String,
      numBuckets: Int): Unit = {
    finishInterruptedSwap(spark, table)
    val tmp = s"${table}__compact_tmp"
    val fs = fsOf(spark, swapMarker(spark, table))
    if (!spark.catalog.tableExists(table)) {
      require(spark.catalog.tableExists(tmp),
        s"neither $table nor its compact staging exists")
      spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$table`")
      fs.delete(swapMarker(spark, table), false)
      return
    }
    dropStale(spark, tmp)
    df(spark.table(table)).write
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tmp)
    fs.create(swapMarker(spark, table), true).close()
    spark.sql(s"DROP TABLE `$table`")
    // a table re-registered by [[registerExisting]] is external —
    // DROP leaves its directory, and the rename below must find the
    // live location free (no-op for managed tables, whose DROP
    // already deleted it)
    val liveDir = tableDir(spark, table)
    if (fs.exists(liveDir)) fs.delete(liveDir, true)
    spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$table`")
    fs.delete(swapMarker(spark, table), false)
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
