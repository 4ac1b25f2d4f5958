package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** VERSIONED tables — the reader-vs-writer consistency contract for
  * tables that get REWRITTEN in place (compactions, rebalances,
  * retention rewrites). [[Bucketing.compactBucketed]]'s swap is
  * crash-safe for the WRITER, and [[Bucketing.stableTable]] closes
  * the reader's catalog-resolve window, but one window remains: a
  * reader that resolved the table BEFORE a swap and is still
  * scanning when the swap deletes the old files fails mid-query. At
  * 100 TB with a streaming loop compacting while dashboards serve,
  * that fires daily.
  *
  * The fix is the snapshot-pointer discipline production table
  * formats use (Iceberg/Delta's metadata pointer, re-expressed
  * minimally): the logical name never holds data — it resolves
  * through an atomic POINTER to an immutable physical generation
  * `<name>__v<N>`. A rewrite builds `v(N+1)` completely, flips the
  * pointer, and retires only generations OLDER than the one it
  * replaced. So:
  *
  *   - a reader that resolved vN keeps scanning vN's untouched files
  *     to completion — the rewrite deleted nothing it can see;
  *   - a reader arriving after the flip sees v(N+1);
  *   - no reader, at any instant, can observe a missing table.
  *
  * The pointer is made atomic WITHOUT rename-over (not atomic on
  * every store): the version is encoded in the pointer file's NAME
  * (`<name>__ptr_v<N>`), publish = one atomic create of the new
  * pointer + delete of the old, resolve = max N over a prefix
  * listing. A crash between create and delete leaves two pointers —
  * max still wins, the next publish sweeps stragglers.
  *
  * Reader contract, disclosed: a resolved generation stays scannable
  * for ONE further rewrite (the rewrite retires `<= N-1`, keeping N).
  * A query outliving two maintenance generations re-resolves — the
  * same contract Iceberg gives a reader pinned to an expired
  * snapshot. Writers serialize through the existing single-writer
  * lease ([[Bucketing.withIndexLease]]); readers take no lease and
  * never block.
  *
  * Reference anchor: the reference's store delegates this to S3 +
  * Glue (readers of a Glue table racing a partition rewrite get the
  * same torn read; Athena answers it with snapshot-isolated Iceberg
  * tables). This is that isolation re-expressed engine-side.
  */
object VersionedTable {

  private def warehouse(spark: SparkSession) =
    new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))

  private def fsOf(spark: SparkSession) =
    warehouse(spark).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def ptrPrefix(name: String) = s"${name.toLowerCase}__ptr_v"

  /** Floor marker: lowest generation that can still be live, encoded
    * in the file NAME like the version pointer (`<name>__floor_<N>`,
    * max wins, create-then-sweep). Keeps [[retireBelow]] O(retired
    * this call) instead of O(all history): without it, rewrite N
    * re-probes every generation since 1 — ~9k useless FS round-trips
    * per rewrite after a year of hourly compactions. */
  private def floorPrefix(name: String) = s"${name.toLowerCase}__floor_"

  /** Physical catalog name of generation `v` of logical `name`. */
  def physicalName(name: String, v: Long): String =
    s"${name.toLowerCase}__v$v"

  /** All pointer versions currently on disk (usually one; two only
    * inside a publish's create→sweep window or after a crash in it). */
  private def pointerVersions(spark: SparkSession,
      name: String): Seq[Long] = {
    val pfx = ptrPrefix(name)
    // prefix-filtered listing ([[Bucketing.globWarehouse]]): a full
    // warehouse listStatus per resolve is O(#tables) driver-side and
    // pointer resolves happen several times per verb
    Bucketing.globWarehouse(spark, pfx)
      .map(_.getPath.getName)
      .flatMap(n => scala.util.Try(n.drop(pfx.length).toLong).toOption)
  }

  /** The live generation number, if the logical table exists. */
  def currentVersion(spark: SparkSession, name: String): Option[Long] =
    pointerVersions(spark, name).sorted.lastOption

  /** Lowest generation [[retireBelow]] has not yet retired (1 before
    * any retirement). Same prefix-listing resolve as the version
    * pointer. */
  private def floorVersion(spark: SparkSession, name: String): Long = {
    val pfx = floorPrefix(name)
    Bucketing.globWarehouse(spark, pfx)
      .map(_.getPath.getName)
      .flatMap(n => scala.util.Try(n.drop(pfx.length).toLong).toOption)
      .sorted.lastOption.getOrElse(1L)
  }

  private def flipFloor(spark: SparkSession, name: String,
      next: Long): Unit = {
    val fs = fsOf(spark)
    val wh = warehouse(spark)
    fs.mkdirs(wh)
    val pfx = floorPrefix(name)
    val p = new org.apache.hadoop.fs.Path(wh, s"$pfx$next")
    if (!fs.exists(p)) fs.create(p, false).close()
    Bucketing.globWarehouse(spark, pfx).map(_.getPath)
      .filter(q => scala.util.Try(
        q.getName.drop(pfx.length).toLong)
        .toOption.exists(_ < next))
      .foreach(fs.delete(_, false))
  }

  /** Resolves the logical name to its live physical table — the ONE
    * call every reader makes; the returned name's files are immutable
    * until a LATER rewrite retires the generation before it. */
  def resolve(spark: SparkSession, name: String): String =
    physicalName(name, currentVersion(spark, name).getOrElse(
      throw new IllegalStateException(
        s"no published version of versioned table '$name' — publish " +
          "one with VersionedTable.publishBucketed")))

  /** Snapshot-isolated read: resolve once, scan that generation. */
  def read(spark: SparkSession, name: String): DataFrame =
    spark.table(resolve(spark, name))

  /** Time-travel read of an EXPLICIT generation — audit/debug reads
    * ("what did the corpus look like before that sweep?"), valid for
    * any generation not yet retired; a retired one fails loudly with
    * the live version named. */
  def readVersion(spark: SparkSession, name: String, v: Long,
      bucketSpec: Option[(String, Int)] = None): DataFrame = {
    val t = physicalName(name, v)
    require(spark.catalog.tableExists(t) ||
      Bucketing.registerExisting(spark, t, bucketSpec),
      s"generation $v of versioned table '$name' is retired or never " +
        s"existed — live version is ${currentVersion(spark, name)}")
    spark.table(t)
  }

  /** Atomic pointer flip: create `__ptr_v<next>` (atomic no-overwrite
    * create), then sweep every older pointer. Readers listing between
    * the two steps see both — max wins. */
  private def flipPointer(spark: SparkSession, name: String,
      next: Long): Unit = {
    val fs = fsOf(spark)
    val wh = warehouse(spark)
    fs.mkdirs(wh)
    fs.create(new org.apache.hadoop.fs.Path(wh,
      s"${ptrPrefix(name)}$next"), false).close()
    pointerVersions(spark, name).filter(_ < next).foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(wh,
        s"${ptrPrefix(name)}$v"), false)
    }
  }

  /** Publishes `df` as the next generation of logical `name`,
    * bucketed — build fully, THEN flip. Returns the new version.
    * Serialized against other writers by the index lease. Applies the
    * same `keepGenerations` retirement as [[rewriteBucketed]] — a
    * publish-driven refresh loop must not leak one full table
    * generation per publish. */
  def publishBucketed(df: DataFrame, name: String, bucketCol: String,
      numBuckets: Int, keepGenerations: Int = 1): Long = {
    require(keepGenerations >= 1,
      s"keepGenerations must be >= 1, got $keepGenerations")
    val spark = df.sparkSession
    Bucketing.withIndexLease(spark, name, "publishVersioned") {
      val next = currentVersion(spark, name).getOrElse(0L) + 1L
      Bucketing.writeBucketed(df, physicalName(name, next), bucketCol,
        numBuckets)
      flipPointer(spark, name, next)
      retireBelow(spark, name, next - keepGenerations)
      next
    }
  }

  /** REWRITE = the maintenance verb (compaction, retention sweep,
    * re-cluster): builds generation N+1 from a transform of the live
    * generation, flips, and retires everything older than the
    * `keepGenerations` most recent REPLACED generations — the
    * default keeps one (the generation the flip replaced stays on
    * disk for in-flight readers, per the reader contract above); a
    * store serving queries that can outlive one maintenance cycle
    * raises it, trading disk for a longer reader grace (the Iceberg
    * snapshot-retention knob, generation-counted). Returns the new
    * version. */
  def rewriteBucketed(spark: SparkSession, name: String,
      transform: DataFrame => DataFrame, bucketCol: String,
      numBuckets: Int, keepGenerations: Int = 1): Long = {
    require(keepGenerations >= 1,
      s"keepGenerations must be >= 1 (a reader that resolved just " +
        s"before the flip needs its generation alive), got " +
        s"$keepGenerations")
    Bucketing.withIndexLease(spark, name, "rewriteVersioned") {
      val cur = currentVersion(spark, name).getOrElse(
        throw new IllegalStateException(
          s"rewriteBucketed: no published version of '$name'"))
      val next = cur + 1L
      Bucketing.writeBucketed(
        transform(spark.table(physicalName(name, cur))),
        physicalName(name, next), bucketCol, numBuckets)
      flipPointer(spark, name, next)
      retireBelow(spark, name, next - keepGenerations)
      next
    }
  }

  /** Drops every physical generation strictly below `keep` (catalog
    * entry AND directory). Callable directly for an aggressive
    * space reclaim once no reader can be pinned that far back.
    * Walks only [floor, keep) — the floor marker records where the
    * last retirement stopped, so a rewrite pays O(generations retired
    * THIS call), not O(all history); a crash mid-walk leaves the old
    * floor in place and the next call re-covers the gap (re-drops are
    * no-ops). Returns the number of generations probed — the spec's
    * O(keepGenerations) receipt. */
  def retireBelow(spark: SparkSession, name: String, keep: Long): Int = {
    val floor = floorVersion(spark, name)
    if (keep <= floor) return 0
    (floor until keep).foreach(v =>
      Bucketing.dropTableAndDir(spark, physicalName(name, v)))
    flipFloor(spark, name, keep)
    (keep - floor).toInt
  }

  /** Cross-session re-open: registers the live generation's physical
    * table from its directory (the [[Bucketing.registerExisting]]
    * face for versioned tables). Returns the resolved physical name. */
  def open(spark: SparkSession, name: String,
      bucketSpec: Option[(String, Int)]): String = {
    val phys = resolve(spark, name)
    require(Bucketing.registerExisting(spark, phys, bucketSpec),
      s"versioned table '$name' points at generation '$phys' but its " +
        "directory is missing — the warehouse was truncated out from " +
        "under the pointer")
    phys
  }
}
