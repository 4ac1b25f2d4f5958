package graft.api

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{IntegerType, StringType, StructType}

import graft.model.{KeycloakAdminEvent, KeycloakEvent}
import graft.sources.EventStore
import graft.streaming.StreamingIngest

/** The provider facade — the library's equivalent of the reference's
  * EventStoreProvider (FirehoseEventStoreProvider.java): one object a
  * caller holds to log events, run queries, and manage retention.
  *
  * | reference                              | here                       |
  * |----------------------------------------|----------------------------|
  * | onEvent → Firehose putRecord (:123-131)| onEvents / ingest stream   |
  * | onEvent(admin) (:133-141)              | onAdminEvents              |
  * | createQuery (Athena SQL)               | createQuery (EventQuery)   |
  * | createAdminQuery                       | createAdminQuery           |
  * | clear/clearAdmin/clearExpired (:102-121 | clearExpired (real,       |
  * |   — declared no-ops, S3 lifecycle)     |   partition-pruned)        |
  *
  * Batch `onEvents` appends directly to the partitioned store;
  * `startIngest` attaches the Structured-Streaming path for a
  * continuous JSON-lines source (the Firehose analog).
  */
final class GraftEventStoreProvider(
    spark: SparkSession,
    eventsPath: String,
    adminEventsPath: String) {
  import spark.implicits._

  /** Append a batch of user events (typed). */
  def onEvents(events: Dataset[KeycloakEvent]): Unit =
    EventStore.write(events.toDF(), eventsPath)

  /** Append a batch of admin events (typed). */
  def onAdminEvents(events: Dataset[KeycloakAdminEvent]): Unit =
    EventStore.write(events.toDF(), adminEventsPath)

  /** Attach a streaming JSON-lines source (reference wire format) to
    * the user-event store. */
  def startIngest(jsonLines: Dataset[String], checkpoint: String): StreamingQuery =
    StreamingIngest.toPartitionedSink(
      StreamingIngest.fromJsonLines(jsonLines), eventsPath, checkpoint)

  /** Drain the source's current backlog into the store, then stop
    * (Trigger.AvailableNow) — the scheduled-ingest deployment mode.
    * Caller awaits termination. */
  def drainBacklog(jsonLines: Dataset[String], checkpoint: String): StreamingQuery =
    StreamingIngest.drainAvailableNow(
      StreamingIngest.fromJsonLines(jsonLines), eventsPath, checkpoint)

  /** Attach the source with UPSERT semantics: replayed event ids
    * replace their earlier copies instead of duplicating — safe under
    * at-least-once delivery (the reference's Firehose retries) even
    * across checkpoint loss. */
  def startIngestUpsert(jsonLines: Dataset[String], checkpoint: String): StreamingQuery =
    StreamingIngest.toUpsertSink(
      StreamingIngest.fromJsonLines(jsonLines), eventsPath, checkpoint)

  /** Fluent user-event query over the store (EventQuery semantics of
    * AthenaEventQuery.java). */
  def createQuery(): EventQuery = EventQuery(events)

  /** Fluent admin-event query (AthenaAdminEventQuery semantics). */
  def createAdminQuery(): AdminEventQuery = AdminEventQuery(adminEvents)

  def events: DataFrame =
    readOrEmpty(eventsPath, Encoders.product[KeycloakEvent].schema)
  def adminEvents: DataFrame =
    readOrEmpty(adminEventsPath, Encoders.product[KeycloakAdminEvent].schema)

  /** A store that has never been written to is a valid empty store —
    * the reference returns an empty result stream, not an error, so a
    * fresh deployment can query before the first event lands. */
  private def readOrEmpty(path: String, schema: StructType): DataFrame = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) EventStore.read(spark, path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      schema.add("dt", StringType).add("hour", IntegerType))
  }

  /** Delete user events older than the cutoff (epoch ms). The
    * reference declares this a no-op and delegates to S3 lifecycle
    * (FirehoseEventStoreProvider.java:102-121); a standalone engine
    * owns it: partition-pruned directory drops + one boundary-hour
    * rewrite. Returns whole partitions dropped. */
  def clearExpired(olderThanMs: Long): Int =
    EventStore.clearExpired(spark, eventsPath, olderThanMs)

  /** Delete admin events older than the cutoff (epoch ms). */
  def clearExpiredAdmin(olderThanMs: Long): Int =
    EventStore.clearExpired(spark, adminEventsPath, olderThanMs)

  /** Drop the whole user-event store — `clear()`
    * (FirehoseEventStoreProvider.java:103). */
  def clear(): Unit = EventStore.clearAll(spark, eventsPath)

  /** Delete every user event of one realm — `clear(realm)`
    * (FirehoseEventStoreProvider.java:106). Touched-partitions-only
    * rewrite (realmid is not a partition column); returns partitions
    * touched. */
  def clear(realmId: String): Int =
    EventStore.clearRealm(spark, eventsPath, realmId)

  /** Delete one realm's user events with time < olderThanMs —
    * `clear(realm, olderThan)` (FirehoseEventStoreProvider.java:109). */
  def clear(realmId: String, olderThanMs: Long): Int =
    EventStore.clearRealm(spark, eventsPath, realmId, Some(olderThanMs))

  /** Drop the whole admin-event store — `clearAdmin()`
    * (FirehoseEventStoreProvider.java:115). */
  def clearAdmin(): Unit = EventStore.clearAll(spark, adminEventsPath)

  /** Delete every admin event of one realm — `clearAdmin(realm)`
    * (FirehoseEventStoreProvider.java:118). */
  def clearAdmin(realmId: String): Int =
    EventStore.clearRealm(spark, adminEventsPath, realmId)

  /** Delete one realm's admin events with time < olderThanMs —
    * `clearAdmin(realm, olderThan)`
    * (FirehoseEventStoreProvider.java:121). */
  def clearAdmin(realmId: String, olderThanMs: Long): Int =
    EventStore.clearRealm(spark, adminEventsPath, realmId, Some(olderThanMs))
}
