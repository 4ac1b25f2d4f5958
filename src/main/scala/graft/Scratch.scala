package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sample-code drive of the provider facade + ANN (scratch main). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.api.GraftEventStoreProvider
    import graft.model.EventAdapter
    import graft.operators.Similarity
    import graft.sources.Tables

    val base = java.nio.file.Files.createTempDirectory("prov_").toString
    val p = new GraftEventStoreProvider(spark, s"$base/ev", s"$base/adm")

    // the reference user journey: log a batch, query it back
    val ke = EventAdapter.keycloakEvents(Tables.events(spark, "/root/testdata/sf0.001"))
    p.onEvents(ke.as[graft.model.KeycloakEvent])
    val hits = p.createQuery().types("ERROR", "CLICK").realm("realm-2")
      .orderByDescTime.firstResult(5).maxResults(5).results(spark).collect()
    println(s"[e2e] paged query: n=${hits.length} types=${hits.map(_.eventtype).distinct.mkString(",")}")

    // probe: query on an EMPTY admin store (no files yet) — what does
    // a fresh deployment see?
    try {
      val n = p.createAdminQuery().operation("CREATE").toDF.count()
      println(s"[e2e] empty admin store query: n=$n")
    } catch {
      case e: Exception =>
        println("[e2e] empty admin store: " + e.getMessage.linesIterator.next())
    }

    // probe: retention cutoff before all data → nothing dropped
    val minT = p.events.agg(min(col("time"))).head.getLong(0)
    println(s"[e2e] no-op retention dropped=${p.clearExpired(minT - 1000)} " +
      s"count=${p.events.count()}")

    // probe: IVF with nprobe == nlist must equal brute force exactly
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val bf = pairs(Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 5))
    val ivfAll = pairs(Similarity.ivfTopK(q, emb, "vec_id", "embedding", 5,
      nlist = 16, nprobe = 16))
    println(s"[e2e] ivf(nprobe=nlist) == bruteforce: ${ivfAll == bf} " +
      s"(|bf|=${bf.size}, |ivf|=${ivfAll.size})")
    spark.stop()
  }
}
