package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftEventStoreProvider
import graft.model.EventAdapter
import graft.sources.Tables

/** The provider facade: the reference EventStoreProvider journey —
  * log events, query them back, expire old ones — through one object. */
class ProviderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("log → query → retention round trip (user + admin)") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_provider_").toString
    val p = new GraftEventStoreProvider(spark, s"$base/events", s"$base/admin")

    // a never-written store answers queries with empty results, like
    // the reference's empty result stream — not PATH_NOT_FOUND
    assert(p.createQuery().types("ERROR").toDF.count() == 0)
    assert(p.createAdminQuery().operation("CREATE").toDF.count() == 0)

    val ev = EventAdapter.keycloakEvents(Tables.events(spark, TestSpark.sf))
    val adm = EventAdapter.keycloakAdminEvents(Tables.events(spark, TestSpark.sf))
    p.onEvents(ev.as[graft.model.KeycloakEvent])
    p.onAdminEvents(adm.as[graft.model.KeycloakAdminEvent])

    assert(p.events.count() == ev.count())
    assert(p.adminEvents.count() == adm.count())

    val errors = p.createQuery().types("ERROR").maxResults(10).results(spark).collect()
    assert(errors.nonEmpty && errors.forall(_.eventtype == "ERROR"))

    val creates = p.createAdminQuery().operation("CREATE").maxResults(10)
      .results(spark).collect()
    assert(creates.nonEmpty && creates.forall(_.operationtype == "CREATE"))

    import org.apache.spark.sql.functions._
    val minT = p.events.agg(min(col("time"))).head.getLong(0)
    val cutoff = minT + 12 * 3600000L
    assert(p.clearExpired(cutoff) > 0)
    assert(p.events.agg(min(col("time"))).head.getLong(0) >= cutoff)
    // admin store untouched by the user-event sweep
    assert(p.adminEvents.agg(min(col("time"))).head.getLong(0) == minT)
    assert(p.clearExpiredAdmin(cutoff) > 0)
  }

  test("drainBacklog and startIngestUpsert land through the facade") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t0 = 1704067200000L
    def ev(id: String, t: Long) =
      s"""{"id":"$id","type":"LOGIN","realmid":"r","userid":"u","time":$t,"detailsjson":"{}"}"""

    val base = Files.createTempDirectory("graft_provider2_").toString
    val p = new GraftEventStoreProvider(spark, s"$base/events", s"$base/admin")

    val drainSrc = MemoryStream[String](spark)
    drainSrc.addData(Seq(ev("d1", t0), ev("d2", t0 + 1000)))
    val q1 = p.drainBacklog(drainSrc.toDS(),
      Files.createTempDirectory("graft_drain_ck_").toString)
    assert(q1.awaitTermination(60000))
    assert(p.createQuery().toDF.count() == 2)

    val upsertSrc = MemoryStream[String](spark)
    val q2 = p.startIngestUpsert(upsertSrc.toDS(),
      Files.createTempDirectory("graft_ups_ck_").toString)
    try {
      upsertSrc.addData(Seq(ev("d2", t0 + 1000), ev("u1", t0 + 2000)))
      q2.processAllAvailable()
      // d2 replayed through upsert → still one copy; u1 appended
      assert(p.createQuery().toDF.count() == 3)
    } finally q2.stop()
  }
}
