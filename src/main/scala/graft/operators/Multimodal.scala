package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media (image/audio/video) as opaque
  * `binary` columns with typed metadata, plus a batched decode /
  * feature-extract stage.
  *
  * The Spark-side plumbing — schema, partitioning, batch iteration
  * shape — is real and tested; the actual codec call is STUBBED with
  * a deterministic fake (this container has no image/audio libs).
  * A production deployment replaces [[decodeStub]]'s body with the
  * real decoder; everything else stays identical.
  *
  * At 100 TB scale: binary payloads stay columnar in parquet, decode
  * runs per-partition (one codec context per partition, not per row),
  * and metadata-only queries never touch the binary column (column
  * pruning keeps the scan narrow).
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Decoded features (width/height/channels for images; a real
    * decoder fills these from the codec). */
  case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      byte_len: Int,
      width: Int,
      height: Int,
      channels: Int)

  /** Attach a binary payload column derived from text (the testdata
    * has no real media; payload bytes are the UTF-8 text, which keeps
    * the pipeline deterministic end-to-end). */
  def withBinaryPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      when(col(idCol) % 3 === 0, lit("image"))
        .when(col(idCol) % 3 === 1, lit("audio"))
        .otherwise(lit("video")).as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** STUB decode: a real implementation opens a codec per partition
    * and decodes each payload (e.g. via javax.imageio / ffmpeg
    * bindings). The fake derives deterministic dimensions from the
    * payload hash so specs can assert exact values. The partition-
    * iterator shape (init once, map many) is the real production
    * pattern. */
  def decodeStub(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init would happen here (codec context)
      rows.map { r =>
        val len = r.payload.length
        // ??? real decoder goes here; deterministic fake below
        val h = java.util.Arrays.hashCode(r.payload)
        MediaFeatures(
          doc_id = r.doc_id,
          media_type = r.media_type,
          byte_len = len,
          width = 64 + math.floorMod(h, 16) * 32,
          height = 64 + math.floorMod(h >> 4, 16) * 32,
          channels = if (r.media_type == "audio") 1 else 3)
      }
    }
  }

  /** Metadata-only projection (no decode, binary column pruned):
    * byte length + content hash + deterministic fake dimensions —
    * fully expression-based, so it has an exact DuckDB oracle. */
  def metadata(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"), col("media_type"),
      length(col("payload")).cast("int").as("byte_len"),
      md5(col("payload")).as("content_hash"),
      (lit(64) + (length(col("payload")) % 16) * 32).cast("int").as("width"),
      (lit(64) + (length(col("payload")) % 9) * 32).cast("int").as("height"),
      when(col("media_type") === "audio", 1).otherwise(3).as("channels"))
}
