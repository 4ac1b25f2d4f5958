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
}
