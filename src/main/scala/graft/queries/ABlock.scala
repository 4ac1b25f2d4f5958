package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.{AdminEventQuery, EventQuery}
import graft.model.EventAdapter
import graft.sources.Tables

/** A-block: the reference's own surface (SURVEY.md §2 A1-A10) —
  * flattening, the fluent query builders, partitioned ingest layout,
  * retention, row mapping — exercised over the driver's `events`
  * table via [[EventAdapter]].
  */
object ABlock {
  type Q = (SparkSession, String) => DataFrame

  private def ke(s: SparkSession, d: String): DataFrame =
    EventAdapter.keycloakEvents(Tables.events(s, d))
  private def kae(s: SparkSession, d: String): DataFrame =
    EventAdapter.keycloakAdminEvents(Tables.events(s, d))

  /** WITH-clause prefix shared by all A oracles. */
  private val withKe = s"WITH ke AS (${EventAdapter.duckdbEventsCte})"
  private val withKae = s"WITH kae AS (${EventAdapter.duckdbAdminCte})"

  // 2024-01-02T00:00:00Z / 2024-01-04T00:00:00Z as epoch millis —
  // inside the testdata's time range at every scale factor.
  private val T0 = 1704153600000L
  private val T1 = 1704326400000L
  /** Midpoint of [T0, T1) — 2024-01-03T00:00:00Z; the schema-evolution
    * and pruning boundary for the physical-store entries. */
  private val TMid = 1704240000000L

  /** Cache key for the one-time physical stores: sf dir + a
    * fingerprint (size ^ mtime) of the source events parquet, so a
    * regenerated testdata set invalidates the cached store instead of
    * silently serving stale rows. */
  private[queries] def storeKey(s: SparkSession, d: String): String = {
    val p = new org.apache.hadoop.fs.Path(d, "events.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    d.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      java.lang.Long.toHexString(st.getLen ^ st.getModificationTime)
  }

  /** Build-once-then-reuse for the physical stores, CRASH-SAFE: the
    * old `if (!exists) { mkdirs; build into place }` pattern meant a
    * failure mid-build left a half-built store every later invocation
    * silently reused — wrong rows against the oracle with no error.
    * The build lands in a `.building` staging directory and ONE
    * rename publishes it; a crash leaves only staging (deleted and
    * rebuilt next time), never a half-store under the live name.
    * Safe for snapshot stores too: manifests hold store-RELATIVE
    * paths, so the directory rename moves the whole discipline
    * intact. */
  private[queries] def cachedStore(s: SparkSession, store: String)(
      build: String => Unit): Unit = {
    val p = new org.apache.hadoop.fs.Path(store)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) return
    val staging = new org.apache.hadoop.fs.Path(store + ".building")
    if (fs.exists(staging)) fs.delete(staging, true)
    fs.mkdirs(staging)
    build(staging.toString)
    require(fs.rename(staging, p),
      s"failed to publish staged store $staging -> $p")
  }

  val queries: Map[String, Q] = Map(
    // A1: user-event flattening (FlatEvent.java:43-55).
    "a1_flatten_event" -> ((s, d) =>
      ke(s, d).orderBy(col("time"), col("id"))),

    // A2: admin-event flattening (FlatAdminEvent.java:56-85).
    "a2_flatten_admin_event" -> ((s, d) =>
      kae(s, d).orderBy(col("time"), col("id"))),

    // A3: details JSON roundtrip (FlatEvents.java:9-29): parse the
    // detailsjson map, read a key, re-serialize — proves ser/de is
    // lossless at the boundary.
    "a3_details_roundtrip" -> ((s, d) =>
      ke(s, d)
        .select(col("id"),
          get_json_object(col("detailsjson"), "$.k").cast("bigint").as("k"),
          to_json(map(lit("k"), get_json_object(col("detailsjson"), "$.k").cast("bigint")))
            .as("reserialized"))
        .orderBy(col("id").cast("bigint"))),

    // A4: dt/hour partition layout of the ingest path (terraform/
    // main.tf:84-96) — the partition columns + per-partition counts;
    // the physical partitioned write is covered by EventStoreSpec.
    "a4_partitioned_ingest" -> ((s, d) =>
      ke(s, d)
        .select(date_format(timestamp_millis(col("time")), "yyyy-MM-dd").as("dt"),
          (expr("time DIV 3600000") % 24).cast("int").as("hour"))
        .groupBy(col("dt"), col("hour"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("dt"), col("hour"))),

    // A5: EventQuery filters: type IN + realm/client equality
    // (AthenaEventQuery.java:161-198).
    "a5_event_query_filters" -> ((s, d) =>
      EventQuery(ke(s, d))
        .types("LOGIN", "ERROR", "CLICK")
        .realm("realm-1")
        .client("client-3")
        .orderByAscTime
        .toDF),

    // A6: time range + ORDER BY time DESC + LIMIT/OFFSET paging
    // (AthenaEventQuery.java:136-159).
    "a6_event_query_paging" -> ((s, d) =>
      EventQuery(ke(s, d))
        .fromDate(T0).toDate(T1)
        .orderByDescTime
        .firstResult(10)
        .maxResults(100)
        .toDF),

    // A7: AdminEventQuery: operation/resourceType IN + auth filters
    // (AthenaAdminEventQuery.java:185-240).
    "a7_admin_event_query" -> ((s, d) =>
      AdminEventQuery(kae(s, d))
        .operation("CREATE", "UPDATE")
        .resourceType("USER")
        .authRealm("realm-0")
        .orderByAscTime
        .maxResults(500)
        .toDF),

    // A8: retention sweep — what survives clearExpiredEvents(olderThan)
    // (declared no-op in FirehoseEventStoreProvider.java:102-121; we
    // implement it for real in EventStore, spec-covered; this query
    // verifies the survivor predicate).
    "a8_retention_sweep" -> ((s, d) =>
      ke(s, d)
        .filter(col("time") >= T1)
        .groupBy(col("eventtype"))
        .agg(count(lit(1)).as("n"), min(col("time")).as("min_time"))
        .orderBy(col("eventtype"))),

    // A9: partition pruning on dt/hour (terraform/main.tf:87-95's
    // partition projection analog) — predicate on the derived
    // partition keys; physical pruning shown in EventStoreSpec.
    "a9_partition_pruning" -> ((s, d) =>
      ke(s, d)
        .select(date_format(timestamp_millis(col("time")), "yyyy-MM-dd").as("dt"),
          (expr("time DIV 3600000") % 24).cast("int").as("hour"),
          col("eventtype"))
        .filter(col("dt") === "2024-01-03" && col("hour").between(6, 17))
        .groupBy(col("hour"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("hour"))),

    // A10: row→Event mapping with blank→null normalization
    // (AthenaEventQuery.java:207-255).
    "a10_event_mapping" -> ((s, d) =>
      EventQuery.normalized(
        ke(s, d).withColumn("error", coalesce(col("error"), lit(""))))
        .select(col("id"), col("eventtype"), col("error"), col("time"))
        .orderBy(col("id").cast("bigint"))),

    // A12: the PHYSICAL compaction path — events land fragmented (two
    // appends → ≥2 files per hour partition), compact() rewrites every
    // oversized partition to one file, and the oracle pins that the
    // compacted store still answers the per-partition counts exactly.
    // The store holds the [T0, T1) two-day slice: the capability is
    // partition-grain, so ~48 hour-partitions prove it at 1/15th the
    // one-time write cost of the full month (the write happens once
    // per sf dir; the READ is the measured operation).
    "a12_compacted_read" -> ((s, d) => {
      val store = "/tmp/graft_a12_store_" + storeKey(s, d)
      cachedStore(s, store) { st =>
        val slice = ke(s, d).filter(col("time") >= T0 && col("time") < T1)
        graft.sources.EventStore.write(slice.filter(col("time") % 2 === 0), st)
        graft.sources.EventStore.write(slice.filter(col("time") % 2 =!= 0), st)
        graft.sources.EventStore.compact(s, st, maxFilesPerPartition = 1)
      }
      graft.sources.EventStore.read(s, store)
        .groupBy(col("dt").cast("string").as("dt"), col("hour").cast("int").as("hour"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("dt"), col("hour"))
    }),

    // A14: the PHYSICAL schema-evolution path — old partitions written
    // before a column existed, new partitions carry it; a mergeSchema
    // read reconciles, surfacing null for pre-evolution rows. The
    // oracle derives the same split from the mid-slice boundary.
    "a14_evolved_read" -> ((s, d) => {
      val store = "/tmp/graft_a14_store_" + storeKey(s, d)
      cachedStore(s, store) { st =>
        val slice = ke(s, d).filter(col("time") >= T0 && col("time") < T1)
        graft.sources.EventStore.write(slice.filter(col("time") < TMid), st)
        graft.sources.EventStore.write(
          slice.filter(col("time") >= TMid)
            .withColumn("channel", upper(col("eventtype"))), st)
      }
      graft.sources.EventStore.read(s, store, mergeSchema = true)
        .groupBy(col("eventtype"))
        .agg(count(lit(1)).as("n"),
          count(col("channel")).as("n_evolved"))
        .orderBy(col("eventtype"))
    }),

    // A14 × A17: schema evolution THROUGH the snapshot discipline —
    // the first append predates the `channel` column, the second
    // carries it, and the snapshot read resolves the MERGED carried
    // schema (the `#schema=` header every publish forwards) instead
    // of sampling a file: pre-evolution rows surface null exactly as
    // the legacy mergeSchema read, proven by A14's oracle verbatim.
    "a14b_evolved_snapshot_read" -> ((s, d) => {
      val store = "/tmp/graft_a14b_store_" + storeKey(s, d)
      cachedStore(s, store) { st =>
        val slice = ke(s, d).filter(col("time") >= T0 && col("time") < T1)
        graft.sources.SnapshotEventStore.init(s, st)
        graft.sources.SnapshotEventStore.append(
          slice.filter(col("time") < TMid), st)
        graft.sources.SnapshotEventStore.append(
          slice.filter(col("time") >= TMid)
            .withColumn("channel", upper(col("eventtype"))), st)
      }
      graft.sources.SnapshotEventStore.read(s, store)
        .groupBy(col("eventtype"))
        .agg(count(lit(1)).as("n"),
          count(col("channel")).as("n_evolved"))
        .orderBy(col("eventtype"))
    }),

    // A15: the PHYSICAL user-bucketed layout — the two-day slice lands
    // as dt/hour PARTITIONS × userid BUCKETS (sorted); the measured
    // read is the per-user aggregation this layout exists for, with
    // the partition columns proving the dual layout round-trips. The
    // oracle derives the same counts from the raw events.
    "a15_bucketed_events" -> ((s, d) => {
      val table = "graft_a15_events_" + storeKey(s, d).toLowerCase
      if (!s.catalog.tableExists(table))
        graft.sources.Bucketing.writeBucketedEvents(
          ke(s, d).filter(col("time") >= T0 && col("time") < T1), table)
      graft.sources.Bucketing.read(s, table)
        .groupBy(col("userid"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("dt")).as("n_days"),
          min(col("time")).as("first_time"))
        .orderBy(col("userid"))
    }),

    // A11 promoted into the gate: the provider facade END-TO-END over
    // a physical store — config map → factory (enable gate) → provider
    // → typed onEvents append → createQuery builder → toDF. The oracle
    // replays the same filters over the raw events; ProviderSpec
    // covers the config/gate/ingest-mode matrix.
    "a11_provider_roundtrip" -> ((s, d) => {
      import s.implicits._
      val base = "/tmp/graft_a11_store_" + storeKey(s, d)
      cachedStore(s, base) { st =>
        graft.api.GraftEventStoreProviderFactory.fromConfig(
          Map("enabled" -> "true", "basePath" -> st)).create(s)
          .onEvents(
            ke(s, d).filter(col("time") >= T0 && col("time") < T1)
              .as[graft.model.KeycloakEvent])
      }
      val factory = graft.api.GraftEventStoreProviderFactory.fromConfig(
        Map("enabled" -> "true", "basePath" -> base))
      val provider = factory.create(s)
      provider.createQuery()
        .types("LOGIN", "LOGOUT")
        .realm("realm-2")
        .fromDate(T0).toDate(TMid)
        .orderByAscTime
        .toDF
        .select(col("id"), col("eventtype"), col("realmid"), col("userid"),
          col("time"))
    }),

    // A19: the provider facade in SNAPSHOT mode — a11's exact
    // end-to-end path (config map → factory → provider → typed
    // onEvents → createQuery → toDF) with ONE config key flipped
    // (`storeMode=snapshot`), so every verb rides the manifest
    // discipline: the append seals + publishes, the query resolves
    // the live snapshot, and a maintenance COMPACTION runs between
    // write and read to prove the query result is manifest-defined
    // (the replaced fragmented files are still on disk under reader
    // grace — a directory read would double-count). Oracle: a11's
    // SQL verbatim — the one-string-proves-two-disciplines rule.
    "a19_provider_snapshot" -> ((s, d) => {
      import s.implicits._
      val base = "/tmp/graft_a19_store_" + storeKey(s, d)
      def cfg(bp: String) = graft.api.GraftEventStoreProviderFactory
        .fromConfig(Map("enabled" -> "true", "basePath" -> bp,
          "storeMode" -> "snapshot"))
      cachedStore(s, base) { st =>
        val p = cfg(st).create(s)
        val slice = ke(s, d).filter(col("time") >= T0 && col("time") < T1)
        p.onEvents(slice.filter(col("time") % 2 === 0)
          .as[graft.model.KeycloakEvent])
        p.onEvents(slice.filter(col("time") % 2 =!= 0)
          .as[graft.model.KeycloakEvent])
        p.compactEvents(maxFilesPerPartition = 1)
      }
      cfg(base).create(s).createQuery()
        .types("LOGIN", "LOGOUT")
        .realm("realm-2")
        .fromDate(T0).toDate(TMid)
        .orderByAscTime
        .toDF
        .select(col("id"), col("eventtype"), col("realmid"), col("userid"),
          col("time"))
    }),

    // A16: the PHYSICAL realm-scoped purge — clear(realm, olderThan)
    // (FirehoseEventStoreProvider.java:106-109, no-ops there). The
    // two-day slice lands realmid-clustered, clearRealm rewrites ONLY
    // the partitions containing matching rows (realmid is not a
    // partition column), and the oracle pins the exact survivor set:
    // realm-1 keeps nothing before TMid, every other realm keeps all.
    // Idempotent on the cached store: a second call finds no matching
    // rows and touches nothing.
    "a16_realm_clear" -> ((s, d) => {
      val store = "/tmp/graft_a16_store_" + storeKey(s, d)
      cachedStore(s, store) { st =>
        graft.sources.EventStore.write(
          ke(s, d).filter(col("time") >= T0 && col("time") < T1), st,
          sortWithin = Seq("realmid"))
      }
      graft.sources.EventStore.clearRealm(s, store, "realm-1", Some(TMid))
      graft.sources.EventStore.read(s, store)
        .groupBy(col("realmid"))
        .agg(count(lit(1)).as("n"), min(col("time")).as("min_time"))
        .orderBy(col("realmid"))
    }),

    // A17: the SNAPSHOT-isolated store — the full maintenance cycle
    // (fragmented appends → compaction → retention sweep) run through
    // the manifest discipline, then read through the live snapshot.
    // The oracle pins that manifest-defined reads agree exactly with
    // the raw-slice semantics: survivors of clearExpired(TMid) over
    // the [T0, T1) two-day slice — even though the replaced/expired
    // files are STILL ON DISK under the one-cycle reader grace (a
    // directory read would double-count; the snapshot read must not).
    "a17_snapshot_store" -> ((s, d) => {
      val store = "/tmp/graft_a17_store_" + storeKey(s, d)
      cachedStore(s, store) { st =>
        val slice = ke(s, d).filter(col("time") >= T0 && col("time") < T1)
        graft.sources.SnapshotEventStore.init(s, st)
        graft.sources.SnapshotEventStore.append(
          slice.filter(col("time") % 2 === 0), st)
        graft.sources.SnapshotEventStore.append(
          slice.filter(col("time") % 2 =!= 0), st)
        graft.sources.SnapshotEventStore.compact(s, st,
          maxFilesPerPartition = 1)
      }
      graft.sources.SnapshotEventStore.clearExpired(s, store, TMid)
      graft.sources.SnapshotEventStore.read(s, store)
        .groupBy(col("eventtype"))
        .agg(count(lit(1)).as("n"), min(col("time")).as("min_time"))
        .orderBy(col("eventtype"))
    }),

    // A18: the reference QUERY SURFACE over the snapshot store — the
    // fluent builder's time range derives the same dt/hour partition
    // predicates over a MANIFEST-defined scan (basePath keeps the
    // partition columns, so planning-time pruning survives the
    // snapshot indirection; SnapshotEventStoreSpec pins the
    // PartitionFilters). Proves a reference user loses nothing by
    // moving their store onto the snapshot discipline.
    "a18_snapshot_query" -> ((s, d) => {
      val store = "/tmp/graft_a18_store_" + storeKey(s, d)
      cachedStore(s, store) { st =>
        graft.sources.SnapshotEventStore.init(s, st)
        graft.sources.SnapshotEventStore.append(
          ke(s, d).filter(col("time") >= T0 && col("time") < T1), st)
      }
      EventQuery(graft.sources.SnapshotEventStore.read(s, store))
        .fromDate(TMid).toDate(T1)
        .orderByAscTime
        .toDF
        .select(col("id"), col("eventtype"), col("realmid"), col("userid"),
          col("time"), col("detailsjson"))
    }),

    // A13: the PHYSICAL pruned read — events land in a real dt/hour
    // partitioned store, then the builder's time range derives
    // partition predicates (PartitionPruning) so the scan lists only
    // in-range directories (the [TMid, T1] probe prunes the slice's
    // first half at planning time). The oracle is the plain time
    // filter: pruning must be invisible in the results.
    "a13_pruned_read" -> ((s, d) => {
      val store = "/tmp/graft_a13_store_" + storeKey(s, d)
      cachedStore(s, store) { st =>
        graft.sources.EventStore.write(
          ke(s, d).filter(col("time") >= T0 && col("time") < T1), st)
      }
      EventQuery(graft.sources.EventStore.read(s, store))
        .fromDate(TMid).toDate(T1)
        .orderByAscTime
        .toDF
        .select(col("id"), col("eventtype"), col("realmid"), col("userid"),
          col("time"), col("detailsjson"))
    })
  )

  val oracles: Map[String, String] = Map(
    "a1_flatten_event" ->
      s"$withKe SELECT * FROM ke ORDER BY time, id",

    "a2_flatten_admin_event" ->
      s"$withKae SELECT * FROM kae ORDER BY time, id",

    "a3_details_roundtrip" ->
      s"""$withKe SELECT id,
         |  CAST(json_extract_string(detailsjson, '$$.k') AS BIGINT) AS k,
         |  '{"k":' || json_extract_string(detailsjson, '$$.k') || '}' AS reserialized
         |FROM ke ORDER BY CAST(id AS BIGINT)""".stripMargin,

    "a4_partitioned_ingest" ->
      s"""$withKe SELECT strftime(to_timestamp(time / 1000), '%Y-%m-%d') AS dt,
         |  CAST((time // 3600000) % 24 AS INT) AS hour, count(*) AS n
         |FROM ke GROUP BY 1, 2 ORDER BY dt, hour""".stripMargin,

    "a5_event_query_filters" ->
      s"""$withKe SELECT * FROM ke
         |WHERE eventtype IN ('LOGIN','ERROR','CLICK')
         |  AND realmid = 'realm-1' AND clientid = 'client-3'
         |ORDER BY time, id""".stripMargin,

    "a6_event_query_paging" ->
      s"""$withKe SELECT * FROM ke
         |WHERE time >= $T0 AND time <= $T1
         |ORDER BY time DESC, id DESC LIMIT 100 OFFSET 10""".stripMargin,

    "a7_admin_event_query" ->
      s"""$withKae SELECT * FROM kae
         |WHERE operationtype IN ('CREATE','UPDATE') AND resourcetype IN ('USER')
         |  AND authrealmid = 'realm-0'
         |ORDER BY time, id LIMIT 500""".stripMargin,

    "a8_retention_sweep" ->
      s"""$withKe SELECT eventtype, count(*) AS n, min(time) AS min_time
         |FROM ke WHERE time >= $T1
         |GROUP BY eventtype ORDER BY eventtype""".stripMargin,

    "a9_partition_pruning" ->
      s"""$withKe SELECT CAST((time // 3600000) % 24 AS INT) AS hour, count(*) AS n
         |FROM ke
         |WHERE strftime(to_timestamp(time / 1000), '%Y-%m-%d') = '2024-01-03'
         |  AND (time // 3600000) % 24 BETWEEN 6 AND 17
         |GROUP BY 1 ORDER BY hour""".stripMargin,

    "a10_event_mapping" ->
      s"""$withKe SELECT id, eventtype,
         |  CASE WHEN trim(coalesce(error, '')) = '' THEN NULL ELSE error END AS error,
         |  time
         |FROM ke ORDER BY CAST(id AS BIGINT)""".stripMargin,

    "a13_pruned_read" ->
      s"""$withKe SELECT id, eventtype, realmid, userid, time, detailsjson
         |FROM ke WHERE time >= $TMid AND time <= $T1 AND time >= $T0 AND time < $T1
         |ORDER BY time, id""".stripMargin,

    "a12_compacted_read" ->
      s"""$withKe SELECT strftime(to_timestamp(time / 1000), '%Y-%m-%d') AS dt,
         |  CAST((time // 3600000) % 24 AS INT) AS hour, count(*) AS n
         |FROM ke WHERE time >= $T0 AND time < $T1
         |GROUP BY 1, 2 ORDER BY dt, hour""".stripMargin,

    "a14_evolved_read" ->
      s"""$withKe SELECT eventtype, count(*) AS n,
         |  CAST(sum(CASE WHEN time >= $TMid THEN 1 ELSE 0 END) AS BIGINT) AS n_evolved
         |FROM ke WHERE time >= $T0 AND time < $T1
         |GROUP BY eventtype ORDER BY eventtype""".stripMargin,

    "a15_bucketed_events" ->
      s"""$withKe SELECT userid, count(*) AS n,
         |  count(DISTINCT time // 86400000) AS n_days,
         |  min(time) AS first_time
         |FROM ke WHERE time >= $T0 AND time < $T1
         |GROUP BY userid ORDER BY userid""".stripMargin,

    "a16_realm_clear" ->
      s"""$withKe SELECT realmid, count(*) AS n, min(time) AS min_time
         |FROM ke WHERE time >= $T0 AND time < $T1
         |  AND (realmid IS DISTINCT FROM 'realm-1' OR time >= $TMid)
         |GROUP BY realmid ORDER BY realmid""".stripMargin,

    "a17_snapshot_store" ->
      s"""$withKe SELECT eventtype, count(*) AS n, min(time) AS min_time
         |FROM ke WHERE time >= $T0 AND time < $T1 AND time >= $TMid
         |GROUP BY eventtype ORDER BY eventtype""".stripMargin,

    "a18_snapshot_query" ->
      s"""$withKe SELECT id, eventtype, realmid, userid, time, detailsjson
         |FROM ke WHERE time >= $TMid AND time <= $T1 AND time >= $T0 AND time < $T1
         |ORDER BY time, id""".stripMargin,

    "a11_provider_roundtrip" ->
      s"""$withKe SELECT id, eventtype, realmid, userid, time
         |FROM ke
         |WHERE eventtype IN ('LOGIN','LOGOUT') AND realmid = 'realm-2'
         |  AND time >= $T0 AND time <= $TMid
         |ORDER BY time, id""".stripMargin,

    // a11's SQL VERBATIM: the snapshot-mode provider must be
    // result-indistinguishable from the legacy one
    "a19_provider_snapshot" ->
      s"""$withKe SELECT id, eventtype, realmid, userid, time
         |FROM ke
         |WHERE eventtype IN ('LOGIN','LOGOUT') AND realmid = 'realm-2'
         |  AND time >= $T0 AND time <= $TMid
         |ORDER BY time, id""".stripMargin,

    // a14's SQL VERBATIM: evolved-schema reads through the snapshot
    // discipline must agree with the legacy mergeSchema read
    "a14b_evolved_snapshot_read" ->
      s"""$withKe SELECT eventtype, count(*) AS n,
         |  CAST(sum(CASE WHEN time >= $TMid THEN 1 ELSE 0 END) AS BIGINT) AS n_evolved
         |FROM ke WHERE time >= $T0 AND time < $T1
         |GROUP BY eventtype ORDER BY eventtype""".stripMargin
  )
}
