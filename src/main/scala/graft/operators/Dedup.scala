package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.SketchFunctions

/** Deduplication operators for large-scale text corpora.
  *
  * Sketches (minhash/simhash/winnow) are native Catalyst expressions
  * (graft.functions.SketchFunctions) — single tight loops per row,
  * not interpreted per-element lambdas. Candidate generation is
  * always *equi-join keyed* (hash bucket, LSH band, simhash chunk) so
  * the shuffle scales linearly in corpus size: no O(n²) comparison
  * ever happens except inside a bucket.
  *
  * Scale posture (100 TB): the explode(bands) → band-join stage
  * carries only (band key, doc id) — candidate pairs then re-join
  * the shingle sets by id, so the wide array payload crosses the
  * network once per doc, not once per band. Skewed buckets (e.g.
  * boilerplate dups) are handled by AQE skew-join splitting.
  */
object Dedup {

  /** Lowercased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Adds `out` = distinct word k-shingles of `textCol`; documents
    * shorter than k words get their whole text as a single shingle.
    * Native one-pass expression (the HOF slice-per-window form was
    * interpreted and re-evaluated the token split per shingle). */
  def withShingles(df: DataFrame, textCol: String, k: Int,
      out: String = "sh"): DataFrame =
    df.withColumn(out,
      SketchFunctions.wordShingles(tokens(col(textCol)), k))

  /** Sorted distinct xxhash64 of a string-array column — the compact
    * set representation the Jaccard merge-join verifies against. */
  private def hashedSet(sh: Column): Column =
    sort_array(array_distinct(transform(sh, s => xxhash64(s))))

  /** Exact dedup: group by content hash, keep the smallest id.
    * Returns (content_hash, keeper_id, n_copies). */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** MinHash + LSH near-dup pairs.
    *
    * shingle → minhash(numPerms) → band (bands × rowsPerBand) →
    * equi-join on (band_id, band_hash) over (key, id) rows only →
    * candidate id pairs → re-join hashed shingle sets by id → true
    * Jaccard via a sorted-merge expression → pairs >= threshold.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b, each pair once.
    */
  def minhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      numPerms: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.7): DataFrame = {
    require(numPerms % bands == 0, "numPerms must divide into bands")
    val r = numPerms / bands

    // NOTE: the shingle pipeline is evaluated once per consuming
    // branch (banding, verification) — deriving the signature from
    // pre-hashed longs was measured SLOWER because it drags the
    // sort/distinct set construction into the banding branch too.
    val withSets = withShingles(
      docs.select(col(idCol).as("doc_id"), col(textCol).as("__graft_text")),
      "__graft_text", shingleK, "sh")
      .select(col("doc_id"), col("sh"))
    val withSig = withSets
      .withColumn("sig", SketchFunctions.minhash64(col("sh"), numPerms))

    // narrow banding rows: (band_id, band_hash, doc_id) — no arrays
    val banded = withSig.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, slice(col("sig"), b * r + 1, lit(r))))))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "band_hash")

    val candidates = banded.as("a")
      .join(banded.as("b"), Seq("band_id", "band_hash"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()

    // verification: re-join the hashed sets by id, sorted-merge Jaccard
    val sets = withSets.select(col("doc_id"), hashedSet(col("sh")).as("shh"))
    candidates
      .join(sets.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("shh", "shh_a"), Seq("id_a"))
      .join(sets.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("shh", "shh_b"), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        SketchFunctions.jaccardSorted(col("shh_a"), col("shh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash over lowercased word tokens (native expression;
    * bit-compatible with the seed-42 xxhash64 vote formulation). */
  def simhash(text: Column): Column =
    SketchFunctions.simhash64(tokens(text))

  /** SimHash near-dup pairs with hamming distance <= maxDist.
    *
    * Candidate generation: split the 64-bit simhash into maxDist + 1
    * chunks (widths as equal as 64 allows); by pigeonhole any pair
    * with hamming <= maxDist differs in at most maxDist chunks, so it
    * shares at least one identical chunk → equi-join on (chunk_id,
    * chunk_value), verify with bit_count(a XOR b). Full recall at any
    * maxDist <= 63; the cost is chunk width 64/(maxDist+1), so large
    * maxDist means short chunks and more random bucket collisions —
    * the standard multi-index hamming-search tradeoff.
    * Returns (id_a, id_b, hamming).
    */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0 && maxDist <= 63,
      s"maxDist must be in [0, 63], got $maxDist")
    val withSim = docs.select(col(idCol).as("doc_id"),
      simhash(col(textCol)).as("sim"))

    // maxDist+1 chunks; the first 64 % n chunks take the extra bit
    val n = maxDist + 1
    val widths = Array.tabulate(n)(i => 64 / n + (if (i < 64 % n) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _).init
    val chunkCols = offsets.zip(widths).map { case (off, w) =>
      val mask = if (w == 64) -1L else (1L << w) - 1L
      shiftrightunsigned(col("sim"), off).bitwiseAND(lit(mask))
    }
    val chunked = withSim.select(col("doc_id"), col("sim"),
      posexplode(array(chunkCols.toIndexedSeq: _*)))
      .withColumnRenamed("pos", "chunk_id")
      .withColumnRenamed("col", "chunk_val")

    val a = chunked.select(col("chunk_id"), col("chunk_val"),
      col("doc_id").as("id_a"), col("sim").as("sim_a"))
    val b = chunked.select(col("chunk_id"), col("chunk_val"),
      col("doc_id").as("id_b"), col("sim").as("sim_b"))

    a.join(b, Seq("chunk_id", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct()
  }

  /** Connected components over verified near-dup pairs: the step that
    * turns pairwise matches into dedup GROUPS (a near-dup cluster is
    * the transitive closure of its pairs). Min-label propagation:
    * every node starts labeled with itself; each round a node takes
    * the minimum label among itself and its neighbors; fixpoint in
    * O(component diameter) rounds — near-dup clusters are shallow, so
    * this converges in a handful of shuffles even on huge corpora.
    * The driver loop is bounded by `maxIter` and only counts changed
    * labels per round (no data is collected). Returns (id, component)
    * where component = min id of the cluster, one row per id that
    * appears in any pair.
    */
  def components(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct().cache()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id")).cache()
    labels.count()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val prop = edges.join(labels, col("dst") === col("id"))
        .select(col("src").as("id"), col("component"))
        .unionAll(labels)
        .groupBy(col("id")).agg(min(col("component")).as("component"))
        .cache()
      changed = prop
        .join(labels.withColumnRenamed("component", "old"), Seq("id"))
        .filter(col("component") < col("old")).count()
      labels.unpersist()
      labels = prop
      iter += 1
    }
    edges.unpersist()
    labels
  }

  /** End of the near-dup pipeline: drop every document whose cluster
    * has a lower-id member — one survivor (the min id) per near-dup
    * group, all singletons kept. `pairs` is any (id_a, id_b) frame
    * from the verification joins above. */
  def dropNearDuplicates(docs: DataFrame, idCol: String,
      pairs: DataFrame): DataFrame = {
    val losers = components(pairs)
      .filter(col("component") < col("id"))
      .select(col("id"))
    docs.join(losers, docs(idCol) === losers("id"), "left_anti")
  }

  /** N-gram Jaccard verification join over blocked candidate pairs:
    * blocks by (lang, length bucket) to bound the pair count, then
    * verifies true word-k-gram Jaccard on hashed shingle sets with
    * the sorted-merge expression. Returns pairs >= threshold.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockCols: Seq[Column],
      shingleK: Int = 3,
      threshold: Double = 0.2): DataFrame = {
    val base = withShingles(
      docs.select(col(idCol).as("doc_id"), col(textCol).as("__graft_text"),
        struct(blockCols: _*).as("block")),
      "__graft_text", shingleK, "sh")
      .select(col("doc_id"), col("block"), hashedSet(col("sh")).as("shh"))
    val a = base.select(col("block"), col("doc_id").as("id_a"), col("shh").as("shh_a"))
    val b = base.select(col("block"), col("doc_id").as("id_b"), col("shh").as("shh_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        SketchFunctions.jaccardSorted(col("shh_a"), col("shh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .distinct()
  }
}
