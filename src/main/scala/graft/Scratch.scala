package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Profiling scratch main (contents change per investigation).
  * Current: do the IMAGE and VIDEO fingerprints concentrate the way
  * audio's did before the r17 envelope fix? Prints top exact-family
  * sizes and family counts at 1× and 10× of the sf0.1 media slices —
  * the measurement that decides whether the constant pixel gradient
  * (x·7 + y·131) needs the audio treatment or is healthy as the r16
  * probe ratios (2.0) suggest. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def topFam(media: org.apache.spark.sql.Dataset[
      graft.operators.Multimodal.MediaRow], label: String): Unit = {
      val sigs = graft.operators.Multimodal.mediaSigs(spark, media)
      val fams = sigs.groupBy(col("sim")).agg(count(lit(1)).as("n"))
      val top = fams.orderBy(desc("n")).limit(5).collect()
        .map(_.getLong(1)).mkString(", ")
      println(s"[$label] n_sigs=${sigs.count()} " +
        s"n_families=${fams.count()} top5=[$top]")
    }

    val docs = spark.read
      .parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id")).as[Long]
    val shift = 2000000011L
    def tenX(base: org.apache.spark.sql.Dataset[Long]) =
      (0 until 10).map(i => base.map(_ + i * shift)).reduce(_ union _)

    val img = docs.filter((id: Long) => id % 3 == 0)
    topFam(img.mapPartitions(_.map(id =>
      graft.operators.Multimodal.MediaRow(id, "image",
        graft.operators.Multimodal.imagePayload(id)))), "image-1x")
    topFam(tenX(img).mapPartitions(_.map(id =>
      graft.operators.Multimodal.MediaRow(id, "image",
        graft.operators.Multimodal.imagePayload(id)))), "image-10x")

    val vid = docs.filter((id: Long) => id % 3 == 2)
    topFam(vid.mapPartitions(_.map(id =>
      graft.operators.Multimodal.MediaRow(id, "video",
        graft.operators.Multimodal.videoPayload(id)))), "video-1x")
    topFam(tenX(vid).mapPartitions(_.map(id =>
      graft.operators.Multimodal.MediaRow(id, "video",
        graft.operators.Multimodal.videoPayload(id)))), "video-10x")
    spark.stop()
  }
}
