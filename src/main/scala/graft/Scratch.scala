package graft

import org.apache.spark.sql.SparkSession

/** Multimodal stage probes (scratch main). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.operators.Multimodal
    import graft.operators.Multimodal.MediaRow

    val media = Seq(
      MediaRow(2L, "video", "some video payload bytes here".getBytes("UTF-8")),
      MediaRow(5L, "video", Array.empty[Byte]), // empty payload
      MediaRow(1L, "audio", "aud".getBytes("UTF-8")),
      MediaRow(3L, "image", "img bytes".getBytes("UTF-8"))
    ).toDS()

    // happy path + probe: tiny 1x1 target must clamp dims to >= 1
    val tiny = Multimodal.resizeStub(spark, media, 1, 1).collect()
    println(s"[probe] resize 1x1: dims=${tiny.map(r => (r.doc_id, r.width, r.height)).sortBy(_._1).toSeq}")

    // probe: frame sampler on empty payload video + huge interval
    val frames = Multimodal.frameSampleStub(spark, media, everyMs = 60000L)
      .collect()
    println(s"[probe] frames(60s interval): ${frames.map(f => (f.doc_id, f.frame_idx, f.ts_ms, f.payload.length)).sortBy(_._1).toSeq}")
    spark.stop()
  }
}
