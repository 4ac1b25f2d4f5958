package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora.
  *
  * All variants are built from codegen'd `functions._` primitives
  * (xxhash64 / transform / aggregate / zip_with / explode) — no Scala
  * UDFs — and all candidate generation is *equi-join keyed* (hash
  * bucket, LSH band, simhash chunk) so the shuffle scales linearly in
  * corpus size: no O(n²) comparison ever happens except inside a
  * bucket.
  *
  * Scale posture (100 TB): the explode(bands) × shuffle-join pattern
  * is the standard MinHash-LSH layout — candidate volume is bounded
  * by band collisions, verified pairs by a second equi-keyed join on
  * doc ids. Skewed buckets (e.g. boilerplate dups) are handled by
  * AQE skew-join splitting.
  */
object Dedup {

  /** Lowercased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Adds `out` = distinct word k-shingles of `textCol`; documents
    * shorter than k words get their whole text as a single shingle.
    *
    * Two-stage (tokens materialized as a column first): a lambda that
    * references the token-array *expression* re-splits the text per
    * shingle iteration — higher-order functions are interpreted with
    * no subexpression elimination, so that is O(words²) per document.
    * A bound attribute makes it O(words·k).
    */
  def withShingles(df: DataFrame, textCol: String, k: Int,
      out: String = "sh"): DataFrame = {
    val w = col("__graft_words")
    df.withColumn("__graft_words", tokens(col(textCol)))
      .withColumn(out, array_distinct(
        when(size(w) >= k,
          transform(sequence(lit(1), size(w) - (k - 1)),
            i => concat_ws(" ", slice(w, i, lit(k)))))
          .otherwise(array(concat_ws(" ", w)))))
      .drop("__graft_words")
  }

  /** Exact dedup: group by content hash, keep the smallest id.
    * Returns (content_hash, keeper_id, n_copies). */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature: `numPerms` permutations simulated as seeded
    * xxhash64 over the shingle set (min over shingles per seed). */
  def minhashSignature(shinglesCol: Column, numPerms: Int): Column =
    transform(sequence(lit(0), lit(numPerms - 1)),
      p => array_min(transform(shinglesCol, sh => xxhash64(p, sh))))

  /** MinHash + LSH near-dup pairs.
    *
    * shingle → minhash(numPerms) → band (bands × rowsPerBand) →
    * equi-join on (band_id, band_hash) → verify true Jaccard on the
    * distinct-shingle sets → pairs with jaccard >= threshold.
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

    val withSets = withShingles(
      docs.select(col(idCol).as("doc_id"), col(textCol).as("__graft_text")),
      "__graft_text", shingleK, "sh").drop("__graft_text")
    val withSig = withSets.withColumn("sig", minhashSignature(col("sh"), numPerms))

    // one row per (doc, band); band hash = xxhash64 over the band's
    // signature slice (hash of array<long> is supported natively)
    val banded = withSig.select(
      col("doc_id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, slice(col("sig"), b * r + 1, lit(r))))))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "band_hash")

    val a = banded.select(col("band_id"), col("band_hash"),
      col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band_id"), col("band_hash"),
      col("doc_id").as("id_b"), col("sh").as("sh_b"))

    a.join(b, Seq("band_id", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .distinct()
  }

  /** 64-bit SimHash over lowercased word tokens: per bit, sum +1/-1
    * votes weighted by each token's xxhash64 bit, then take signs.
    * Pure SQL expressions (HOFs), evaluated without UDFs. */
  def simhash(text: Column): Column = {
    // per-bit masks as Scala-side literals (1L << 63 = Long.MinValue
    // is the correct sign-bit pattern; a double pow would overflow,
    // and the DSL shiftright needs a constant shift amount)
    val masks = array((0 until 64).map(b => lit(1L << b)): _*)
    val votes = aggregate(
      tokens(text),
      array_repeat(lit(0), 64),
      (acc, t) => zip_with(acc,
        transform(masks,
          m => when(xxhash64(t).bitwiseAND(m) =!= 0, 1).otherwise(-1)),
        (x, y) => x + y))
    // fold bit votes into one long: bit b set iff votes[b] > 0
    aggregate(
      zip_with(votes, masks, (v, m) => when(v > 0, m).otherwise(lit(0L))),
      lit(0L), (s, x) => s.bitwiseOR(x))
  }

  /** SimHash near-dup pairs with hamming distance <= maxDist.
    *
    * Candidate generation: split the 64-bit simhash into 4 16-bit
    * chunks; by pigeonhole any pair with hamming <= 3 shares at least
    * one identical chunk → equi-join on (chunk_id, chunk_value),
    * verify with bit_count(a XOR b). Returns (id_a, id_b, hamming).
    */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int = 3): DataFrame = {
    val withSim = docs.select(col(idCol).as("doc_id"),
      simhash(col(textCol)).as("sim"))

    // per-chunk shift amount varies, so the SQL HOF form is used
    val chunked = withSim.select(col("doc_id"), col("sim"),
      posexplode(expr("transform(sequence(0, 3), c -> (sim >> (c * 16)) & 65535)")))
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

  /** N-gram Jaccard verification join over blocked candidate pairs:
    * blocks by (lang, length bucket) to bound the pair count, then
    * computes true word-k-gram Jaccard. Returns pairs >= threshold.
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
      "__graft_text", shingleK, "sh").drop("__graft_text")
    val a = base.select(col("block"), col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = base.select(col("block"), col("doc_id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .distinct()
  }
}
