package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{vecDot, vecNorm}

/** Similarity search over an embedding column (Array[Float]).
  *
  * - [[cosine]]: double-precision cosine via [[graft.functions.FloatVecDot]],
  *   a codegen'd Catalyst expression (a tight primitive loop; the
  *   higher-order-function formulation is interpreted per element and
  *   ~100× slower — measured, not guessed).
  * - [[cosinePairs]] / [[bruteForceTopK]]: the exact baselines. Norms
  *   are computed once per vector before the pair join, so each pair
  *   costs exactly one dot product.
  * - [[lshTopK]]: the scale path — random-hyperplane signatures
  *   bucket the corpus; each query multi-probes its bucket and all
  *   1-bit-flip neighbors (equi-join on signature), cutting the
  *   scanned fraction to ~(bits+1)/2^bits at some recall cost.
  *   Hyperplanes are derived from xxhash64, so the operator is
  *   deterministic with no driver-side randomness or plane matrix.
  *
  * Scale posture (100 TB): pair generation is always an equi-join
  * (LSH bucket) or a broadcast of the small query set — the corpus
  * side never shuffles more than once, and never self-crosses except
  * in the explicitly-exact baselines.
  */
object Similarity {

  /** Double-precision cosine similarity of two float-array columns.
    * Left-to-right accumulation — bit-identical to the DuckDB
    * oracle's list arithmetic. */
  def cosine(a: Column, b: Column): Column =
    vecDot(a, b) / (vecNorm(a) * vecNorm(b))

  /** All pairs (id_a < id_b) with cosine >= threshold — the exact
    * O(n²) baseline (for modest n or as LSH ground truth). */
  def cosinePairs(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val withNorm = embeddings.select(col(idCol).as("id"), col(vecCol).as("v"),
      vecNorm(col(vecCol)).as("nrm"))
    val a = withNorm.select(col("id").as("id_a"), col("v").as("va"),
      col("nrm").as("na"))
    val b = withNorm.select(col("id").as("id_b"), col("v").as("vb"),
      col("nrm").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (vecDot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Exact all-pairs cosine, block-decomposed — same results as
    * [[cosinePairs]] (bit-equal cosines), restructured for scale.
    *
    * Vectors are grouped into id-range blocks of `blockSize`; every
    * block pair (upper triangle incl. diagonal) is joined and a
    * native kernel ([[graft.functions.BlockCosPairs]]) computes the
    * whole B×B tile in one tight primitive loop, unpacking each
    * block's vectors once per tile instead of once per pair. The
    * shuffle/materialization cost drops from n²·dim (row-per-pair
    * join) to n²·dim/B, and the tile kernel is where a real
    * deployment would drop in a BLAS GEMM. Dot count is unchanged —
    * exact all-pairs is inherently O(n²); this bounds the data
    * movement around it. */
  def cosinePairsBlocked(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      blockSize: Int = 256): DataFrame = {
    val blocked = embeddings
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
        vecNorm(col(vecCol)).as("nrm"))
      .withColumn("blk", expr(s"id DIV $blockSize"))
      .groupBy(col("blk"))
      .agg(sort_array(collect_list(struct(col("id"), col("v"), col("nrm"))))
        .as("rows"))
    blocked.as("a").join(blocked.as("b"), col("a.blk") <= col("b.blk"))
      .select(explode(graft.functions.VectorFunctions.blockCosPairs(
        col("a.rows"), col("b.rows"), col("a.blk") === col("b.blk"),
        threshold)).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
        col("p.cos").as("cos"))
  }

  /** Exact top-k neighbors for each query vector (excluding self),
    * block-decomposed: the corpus is grouped into id-range blocks and
    * each (corpus block × query block) tile runs the
    * [[graft.functions.BlockTopK]] kernel — vectors unpacked once per
    * tile, tight primitive dot loops, and only the BLOCK-LOCAL top-k
    * survives the tile. The final window then ranks nBlocks·k
    * candidate rows per query instead of the whole corpus, which is
    * what makes the exact scan viable when the corpus side is large:
    * a row-per-pair join would materialize n·q scored rows through
    * the shuffle; this materializes q·k per corpus block. Results are
    * identical (same left-to-right double dots, same
    * (cos desc, neighbor_id asc) order — block-local pruning keeps a
    * superset of the global top-k). Queries are broadcast; the corpus
    * is scanned once, partitioned. */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      blockSize: Int = 256): DataFrame = {
    val c = corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
        vecNorm(col(vecCol)).as("nrm"))
      .withColumn("blk", expr(s"id DIV $blockSize"))
      .groupBy(col("blk"))
      .agg(sort_array(collect_list(struct(col("id"), col("v"), col("nrm"))))
        .as("crows"))
    val q = queries
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
        vecNorm(col(vecCol)).as("nrm"))
      .withColumn("qblk", expr(s"id DIV $blockSize"))
      .groupBy(col("qblk"))
      .agg(sort_array(collect_list(struct(col("id"), col("v"), col("nrm"))))
        .as("qrows"))
    val candidates = c.join(broadcast(q))
      .select(explode(graft.functions.VectorFunctions.blockTopK(
        col("crows"), col("qrows"), k)).as("p"))
      .select(col("p.query_id").as("query_id"),
        col("p.neighbor_id").as("neighbor_id"), col("p.cos").as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    candidates.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** ANN top-k: corpus bucketed by LSH signature; each query
    * multi-probes its own bucket plus every 1-bit-flip neighbor
    * (bits+1 probes) via equi-join, exact cosine re-rank inside the
    * probed buckets. Multi-probe expands only the (small) query side
    * — the corpus keeps exactly one row per vector. Recall < 1 by
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
      vecNorm(col(vecCol)).as("qn"), sig.as("sig"))
      .select(col("query_id"), col("qv"), col("qn"), probes.as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      vecNorm(col(vecCol)).as("cn"), sig.as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (vecDot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF (inverted-file) ANN top-k — the clustered scale path.
    *
    * "Training": `nlist` centroids are sampled deterministically from
    * the corpus (every n/nlist-th vector by id), then optionally
    * refined with `refineIters` spherical-k-means (Lloyd) steps: each
    * corpus vector joins the broadcast centroid table, keeps its
    * argmax-cosine cell, and cell means become the next centroids.
    * Means are accumulated in FIXED-POINT (value·2²⁴ summed as long),
    * so the result is exactly deterministic regardless of partition
    * merge order — double summation would leak partition ordering
    * into the centroids. Assignment/probing: one narrow shuffle, no
    * driver-side collect; queries probe their `nprobe` nearest cells
    * and re-rank exactly within them, scanning ~nprobe/nlist of the
    * corpus.
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      refineIters: Int = 2,
      refineSampleMod: Long = 4): DataFrame = {
    val n = corpus.count()
    val step = math.max(n / nlist, 1L)
    val sampled = corpus
      .filter(col(idCol) % step === 0).limit(nlist)
      .select(col(idCol).cast("long").as("cell_id"), col(vecCol).as("cvec"),
        vecNorm(col(vecCol)).as("cnrm"))

    // MINI-BATCH Lloyd refinement: each iteration assigns a
    // deterministic 1/refineSampleMod slice of the corpus (rotated by
    // iteration number, so successive steps see different batches) to
    // its argmax-cosine cell, then cell means become the next
    // centroids — the mini-batch k-means trade: near-identical
    // centroid quality for a fraction of the full-corpus scans Lloyd
    // would pay per iteration. Means are accumulated in FIXED-POINT
    // (value·2²⁴ summed as long) so the result is exactly
    // deterministic regardless of partition merge order. The ≤nlist
    // centroid rows live driver-side between iterations (bounded by
    // nlist, never corpus size — and each iteration's plan starts
    // from a literal table, free of the previous one's lineage);
    // cells a batch leaves empty keep their previous centroid instead
    // of vanishing. Batch norms are computed once below the join, not
    // per (vector, centroid) row.
    val Scale = (1L << 24).toDouble
    var centroids = sampled
    if (refineIters > 0) {
      val spark = corpus.sparkSession
      import spark.implicits._
      val training = corpus
        .select(col(idCol).cast("long").as("__tid"), col(vecCol).as("__tv"))
        .withColumn("__tn", vecNorm(col("__tv")))
      var rows: Map[Long, Seq[Float]] = sampled
        .select(col("cell_id"), col("cvec")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
      for (it <- 1 to refineIters) {
        val cents = rows.toSeq.toDF("cell_id", "cvec")
          .withColumn("cnrm", vecNorm(col("cvec")))
        val batch = training
          .filter(pmod(col("__tid") + it, lit(refineSampleMod)) === 0)
        val w = Window.partitionBy(col("__tid"))
          .orderBy(col("__csim").desc, col("cell_id"))
        val assigned = batch
          .join(broadcast(cents))
          .withColumn("__csim",
            vecDot(col("__tv"), col("cvec")) / (col("__tn") * col("cnrm")))
          .withColumn("__crank", row_number().over(w))
          .filter(col("__crank") === 1)
          .select(col("cell_id"), col("__tv"))
        val refined = assigned
          .select(col("cell_id"), posexplode(col("__tv")))
          .groupBy(col("cell_id"), col("pos"))
          .agg(sum(round(col("col") * Scale).cast("long")).as("s"),
            count(lit(1)).as("c"))
          .withColumn("m", (col("s").cast("double") / col("c") / Scale).cast("float"))
          .groupBy(col("cell_id"))
          .agg(expr("transform(sort_array(collect_list(struct(pos, m))), x -> x.m)")
            .as("cvec"))
          .collect()
          .map(r => r.getLong(0) -> r.getSeq[Float](1))
        rows = rows ++ refined
      }
      centroids = rows.toSeq.toDF("cell_id", "cvec")
        .withColumn("cnrm", vecNorm(col("cvec")))
    }

    def assign(df: DataFrame, id: String, vec: String, keep: Int): DataFrame = {
      val w = Window.partitionBy(col(id))
        .orderBy(col("__csim").desc, col("cell_id"))
      df.join(broadcast(centroids))
        .withColumn("__csim",
          vecDot(col(vec), col("cvec")) / (vecNorm(col(vec)) * col("cnrm")))
        .withColumn("__crank", row_number().over(w))
        .filter(col("__crank") <= keep)
        .drop("__csim", "__crank", "cvec", "cnrm")
    }

    val corpusCells = assign(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        vecNorm(col(vecCol)).as("cn")), "neighbor_id", "cv", 1)
    val queryProbes = assign(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        vecNorm(col(vecCol)).as("qn")), "query_id", "qv", nprobe)

    val scored = corpusCells.join(broadcast(queryProbes), Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (vecDot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** `bits`-bit random-hyperplane signature as a single SQL
    * expression (shift amounts vary per plane, which the DSL lambda
    * can't express — SQL HOFs can). Signature computation is
    * per-vector (O(n), off the pair hot path), so the interpreted
    * HOF cost is acceptable here. */
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
