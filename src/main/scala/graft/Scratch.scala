package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Profiling scratch main (contents change per investigation).
  * Current: did the r17 structured audio samples (envelope ×
  * carrier — Multimodal.audioSample) fix the fingerprint-family
  * concentration the r16 probe diagnosed (top exact family 24 → 80
  * at 10×)? Prints the top family sizes and family count at 1× and
  * 10× of the sf0.1 audio slice. */
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

    def topFam(ids: org.apache.spark.sql.Dataset[Long], label: String): Unit = {
      val media = ids.mapPartitions(_.map(id =>
        graft.operators.Multimodal.MediaRow(id, "audio",
          graft.operators.Multimodal.audioPayload(id))))
      val sigs = graft.operators.Multimodal.mediaSigs(spark, media)
      val fams = sigs.groupBy(col("sim")).agg(count(lit(1)).as("n"))
      val top = fams.orderBy(desc("n")).limit(5).collect()
        .map(_.getLong(1)).mkString(", ")
      println(s"[$label] n_sigs=${sigs.count()} " +
        s"n_families=${fams.count()} top5=[$top]")
    }

    val base = spark.read
      .parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id")).as[Long].filter((id: Long) => id % 3 == 1)
    topFam(base, "1x")
    val shift = 2000000011L
    val ten = (0 until 10).map(i => base.map(_ + i * shift))
      .reduce(_ union _)
    topFam(ten, "10x")
    spark.stop()
  }
}
