package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * - [[cosine]]: codegen'd zip_with/aggregate dot product in double
  *   precision (left-to-right fold, so it is bit-reproducible).
  * - [[bruteForceTopK]]: the correctness baseline — broadcast the
  *   (small) query set against the full corpus, per-query top-k via
  *   window. At cluster scale the corpus side stays partitioned;
  *   only queries are broadcast, so this scales to any corpus size
  *   that a full scan can cover.
  * - [[lshTopK]]: the scale path — random-hyperplane signatures
  *   bucket the corpus; each query only probes its own bucket(s)
  *   (equi-join on signature), cutting the scanned fraction to
  *   ~1/2^bits per probe at some recall cost. Hyperplanes are
  *   derived from xxhash64 so the operator is deterministic and
  *   needs no driver-side randomness or broadcast plane matrix.
  */
object Similarity {

  /** Double-precision cosine similarity of two float-array columns. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column = aggregate(
      zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (s, v) => s + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** All pairs (id_a < id_b) with cosine >= threshold. The right side
    * is broadcast when small; at scale, replace with [[lshTopK]]-style
    * bucketing — kept as the exact baseline. */
  def cosinePairs(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val a = embeddings.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = embeddings.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Exact top-k neighbors for each query vector (excluding self). */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** ANN top-k: corpus bucketed by LSH signature; each query
    * multi-probes its own bucket plus every 1-bit-flip neighbor
    * (bits+1 probes) via equi-join, exact cosine re-rank inside the
    * probed buckets. Multi-probe expands only the (small) query side
    * — the corpus keeps exactly one row per vector, so the scan
    * fraction is ~(bits+1)/2^bits per query. Recall < 1 by
    * construction; spec checks recall vs brute force. */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      bits: Int = 8): DataFrame = {
    val sig = signatureExpr(vecCol, bits)
    val probes = expr(
      s"""explode(concat(array(sig),
         |  transform(sequence(0, ${bits - 1}),
         |    b -> sig ^ shiftleft(cast(1 as bigint), b))))""".stripMargin)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      sig.as("sig"))
      .select(col("query_id"), col("qv"), probes.as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      sig.as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Signature as a single SQL expression (shift amounts vary per
    * plane, which the DSL lambda can't express — SQL HOFs can). */
  private def signatureExpr(vecCol: String, bits: Int): Column = expr(
    s"""aggregate(
       |  transform(sequence(0, ${bits - 1}), p ->
       |    IF(aggregate(
       |         zip_with($vecCol, sequence(0, size($vecCol) - 1),
       |           (v, j) -> cast(v as double) * (cast(xxhash64(p, j) as double) / 9.223372036854776e18)),
       |         cast(0.0 as double), (s, v) -> s + v) >= 0,
       |       shiftleft(1L, p), 0L)),
       |  0L, (s, x) -> s | x)""".stripMargin)
}
