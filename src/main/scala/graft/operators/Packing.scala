package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing for LLM pretraining: documents are laid out in a
  * deterministic global order, token counts accumulate into a global
  * offset, and fixed-capacity context windows ("bins") are cut at
  * every `capacity` tokens — the concat-then-split packing GPT-style
  * pipelines run (documents may straddle a bin boundary; the
  * (start_off, bin_start, bin_end) triple is exactly what a packer
  * needs to materialize each window).
  *
  * Scale design: the global running sum is NOT a single-partition
  * window (`sum() OVER (ORDER BY …)` collapses 100 TB onto one task —
  * the canonical global-cumsum trap). Instead, a two-phase prefix
  * sum:
  *
  *   1. `repartitionByRange(orderCol)` gives sorted, disjoint
  *      partitions, pinned by a narrow localCheckpoint so BOTH
  *      passes read the same materialized layout (range-boundary
  *      sampling is re-seeded per job; an un-pinned plan could give
  *      the two passes different boundaries at scale).
  *   2. A cheap column-pruned pass computes per-partition token
  *      totals (map-side partial agg → one row per partition); the
  *      driver pull is bounded by the partition COUNT, never by data
  *      size, and exclusive prefix bases are broadcast back in the
  *      task closure.
  *   3. `mapPartitions` emits base + partition-local running sum —
  *      genuine per-partition imperative logic, the documented
  *      mapPartitions exception.
  *
  * The result depends only on (orderCol order, token counts) — NOT on
  * the partition count or range boundaries — so packings are
  * reproducible on any cluster (PackingSpec pins 1/4/11-partition
  * agreement). Ordering by a hash of the id (see the d32 entry)
  * makes this "shuffle the corpus, then pack" in one operator.
  *
  * Fault-tolerance caveat: `localCheckpoint` stores the pinned blocks
  * in executor-local storage with lineage TRUNCATED — if an executor
  * is lost mid-run (preemption, dynamic allocation scale-down), the
  * job fails unrecoverably rather than recomputing. Fine for local
  * mode and dedicated clusters; on a cluster with executor churn,
  * pass `reliable = true` to pin via a RELIABLE checkpoint instead
  * (survives executor loss; requires `sparkContext.setCheckpointDir`
  * to a shared filesystem, and pays one distributed write of the
  * narrow projection).
  *
  * Returns (idCol, n_tokens, start_off, bin_start, bin_end), where
  * bin_end >= bin_start marks a straddling document; empty documents
  * (0 tokens) occupy their current bin without advancing the offset.
  */
object Packing {

  def sequencePack(
      df: DataFrame,
      idCol: String,
      tokens: org.apache.spark.sql.Column,
      orderCol: org.apache.spark.sql.Column,
      capacity: Long,
      partitions: Int = 32,
      reliable: Boolean = false): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(partitions > 0, s"partitions must be positive, got $partitions")

    val ranged = df
      // null token counts (null text) pack as 0-token docs rather
      // than NPE-ing the running sum
      .select(col(idCol), coalesce(tokens.cast("long"), lit(0L)).as("__n"),
        orderCol.as("__ord"))
      .repartitionByRange(partitions, col("__ord"))
    // pin ONE materialization: the totals pass and the packing pass
    // are separate jobs, and RangePartitioner seeds its boundary
    // sampling per execution (rdd.id) — un-pinned, the two jobs can
    // draw DIFFERENT range bounds once partitions exceed the sample
    // size, silently mis-basing every offset (invisible at test
    // scale, corrupt at 100 TB). The checkpoint is the narrow
    // (id, n, ord) projection, never the full rows. See the
    // fault-tolerance caveat above for localCheckpoint vs reliable.
    val parts = if (reliable) ranged.checkpoint() else ranged.localCheckpoint()

    // Phase 1: per-partition totals. Column pruning keeps this pass
    // narrow; partial aggregation ships one row per partition.
    val totals = parts
      .select(spark_partition_id().as("__pid"), col("__n"))
      .groupBy(col("__pid"))
      .agg(sum(col("__n")).as("__t"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    val bases = new Array[Long](partitions)
    var acc = 0L
    var p = 0
    while (p < partitions) {
      bases(p) = acc
      acc += totals.getOrElse(p, 0L)
      p += 1
    }

    // Phase 2: partition-local running sum on the SAME range layout.
    val idField = df.schema(idCol)
    val outSchema = StructType(Seq(idField,
      StructField("n_tokens", LongType, nullable = false),
      StructField("start_off", LongType, nullable = false)))
    val local = parts
      .sortWithinPartitions(col("__ord"))
      .select(spark_partition_id().as("__pid"), col(idCol), col("__n"))
    val packed = local.mapPartitions { rows =>
      var run = -1L // lazily initialized from the partition's base
      rows.map { r =>
        if (run < 0) run = bases(r.getInt(0))
        val n = r.getLong(2)
        val out = Row(r.get(1), n, run)
        run += n
        out
      }
    }(Encoders.row(outSchema))

    packed.select(col(idCol), col("n_tokens"), col("start_off"),
      expr(s"start_off div ${capacity}L").as("bin_start"),
      expr(s"(start_off + greatest(n_tokens, 1L) - 1L) div ${capacity}L")
        .as("bin_end"))
  }

  /** Per-bin document-boundary MANIFEST over [[sequencePack]] output
    * — the artifact a trainer actually consumes from packed data:
    * attention must reset at document boundaries inside a context
    * bin, so the loader needs, per (bin, document) overlap, WHERE
    * the document's segment sits in the bin and which slice of the
    * document it is. One row per overlap:
    * (bin, idCol, seg_start, seg_len, doc_off) with `seg_start` the
    * bin-local token offset, `seg_len` the overlap length, `doc_off`
    * the segment's offset within its document (0 for the first bin
    * a document touches, then accumulating — a straddling doc's
    * segments reassemble by doc_off order). Zero-token docs emit
    * one seg_len = 0 row in their bin (provenance must not vanish).
    *
    * Scale shape: ONE Generate (each doc explodes into its own bin
    * span — bounded by n_tokens/capacity + 1 rows) plus pure integer
    * projections: no shuffle, no window, no join. Every quantity is
    * re-derivable by any engine from the packed table, so the
    * operator is exactly as oracle-checkable as the packing it
    * annotates. Invariants (spec-pinned): per bin, Σ seg_len +
    * zero-rows = min(capacity, occupied) with segments contiguous
    * from 0; per doc, segments partition [0, n_tokens). */
  def binManifest(packed: DataFrame, idCol: String,
      capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val binLo = col("bin") * capacity
    val binHi = (col("bin") + 1) * capacity
    val segAbs = greatest(col("start_off"), binLo)
    packed
      .select(col(idCol), col("n_tokens"), col("start_off"),
        explode(sequence(col("bin_start"), col("bin_end"))).as("bin"))
      .select(col("bin"), col(idCol),
        (segAbs - binLo).as("seg_start"),
        (least(col("start_off") + col("n_tokens"), binHi) - segAbs)
          .as("seg_len"),
        (segAbs - col("start_off")).as("doc_off"))
  }

  /** Per-bin token-id MATERIALIZATION — the actual packed artifact a
    * trainer mmaps (the `.bin` file the [[binManifest]] addresses):
    * for each context bin, the concatenated token ids of its
    * document segments, segments in bin order, each segment the
    * doc_off-based slice of its document's id sequence. Together
    * with the manifest this makes the packing family's output
    * CONSUMABLE, not just addressable: bin k's array is exactly
    * capacity ids (the tail bin excepted), and re-slicing the bins
    * by the manifest's segments reassembles every document's id
    * sequence bit for bit (spec-pinned).
    *
    * Scale shape: tokenization runs ONCE (the id sequences are
    * pinned and feed both the pack — via their size — and the slice
    * join; the d82 one-decode-pass discipline), the pack rides
    * [[sequencePack]]'s two-phase prefix sum, the manifest is a
    * Generate, and the assembly is ONE hash join (manifest ⋈ ids on
    * the doc id) plus ONE bin-keyed aggregate whose per-group state
    * is bounded by `capacity` + segment count — never by corpus
    * size. No window, no driver loop; bins partition across the
    * cluster by bin id. */
  def binTokens(
      df: DataFrame,
      idCol: String,
      tokenIds: org.apache.spark.sql.Column,
      orderCol: org.apache.spark.sql.Column,
      capacity: Long,
      partitions: Int = 32,
      reliable: Boolean = false): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val ids0 = df.select(col(idCol), tokenIds.as("__ids"),
      orderCol.as("__ord0"))
    val ids = if (reliable) ids0.checkpoint() else ids0.localCheckpoint()
    val packed = sequencePack(ids, idCol,
      tokens = size(col("__ids")).cast("long"),
      orderCol = col("__ord0"), capacity = capacity,
      partitions = partitions, reliable = reliable)
    val manifest = binManifest(packed, idCol, capacity)
    val segs = manifest
      .join(ids.select(col(idCol), col("__ids")).hint("SHUFFLE_HASH"),
        Seq(idCol))
      .select(col("bin"), col("seg_start"),
        slice(col("__ids"), (col("doc_off") + 1).cast("int"),
          col("seg_len").cast("int")).as("__seg"))
    // zero-length segments flatten away but still carry their bin —
    // a zero-token doc sitting exactly on a capacity boundary at the
    // corpus tail legitimately yields an EMPTY final bin
    segs.groupBy(col("bin"))
      .agg(sort_array(collect_list(struct(
        col("seg_start").as("o"), col("__seg").as("s")))).as("__ss"))
      .select(col("bin"),
        flatten(expr("transform(__ss, x -> x.s)")).as("token_ids"))
  }

  /** EPOCH DELIVERY capstone — the checked artifact a trainer
    * actually loads, composing the packing family end to end: real
    * token ids pack into capacity-sized bins ([[binTokens]] — the
    * d92 `.bin` payload over the d90 manifest arithmetic), bins
    * shard into a deterministic training order
    * ([[graft.operators.Sampling.shuffleShard]] — md5(seed|bin) mod
    * numShards, positions in key order), and each shard publishes
    * ONE integrity row: (shard, n_bins, n_tokens, shard_md5), where
    * shard_md5 folds every bin's content hash in shard order. One
    * drifted token id, offset, segment boundary, bin assignment,
    * shard assignment or training-order position anywhere in the
    * composition breaks a shard hash — the d77 one-hash discipline
    * applied to the delivery artifact, which is exactly the check a
    * trainer runs before an epoch ("is this the corpus the curation
    * run signed?").
    *
    * Scale shape: the pack is [[sequencePack]]'s two-phase prefix
    * sum; per-BIN hashes bound aggregation state by `capacity`
    * (the bin's ids join as one array, never a corpus-wide token
    * explosion); the per-SHARD fold aggregates 32-byte hex digests,
    * so shard-aggregate state is ~36 B × bins-per-shard — for a
    * 100 TB corpus at 2048-token bins and 1024 shards, ~1.7 MB per
    * shard group, broadcast-class. Determinism is inherited from
    * the pinned two-phase prefix sums on both levels: the output
    * depends only on (orderCol order, token ids, seed, numShards,
    * capacity), never on partitioning or rerun (spec-pinned).
    *
    * The `reliable` flag is [[sequencePack]]'s: localCheckpoint
    * pins (fast, executor-loss-fragile) vs reliable checkpoints. */
  def epochShards(
      df: DataFrame,
      idCol: String,
      tokenIds: org.apache.spark.sql.Column,
      orderCol: org.apache.spark.sql.Column,
      capacity: Long,
      numShards: Int,
      seed: String,
      partitions: Int = 32,
      reliable: Boolean = false): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val bins0 = binTokens(df, idCol, tokenIds, orderCol, capacity,
      partitions, reliable)
      .select(col("bin"),
        size(col("token_ids")).cast("long").as("__nt"),
        // per-bin content hash: the comma-joined id string (the d92
        // ids_md5 convention — an empty tail bin hashes "")
        md5(expr("array_join(cast(token_ids as array<string>), ',')"))
          .as("__bmd5"))
    // two consumers (shard assignment + the hash join-back): pin so
    // the pack does not recompute
    val bins = if (reliable) bins0.checkpoint() else bins0.localCheckpoint()
    val sharded = Sampling.shuffleShard(bins.select(col("bin")), "bin",
      numShards, seed, partitions, reliable)
    sharded.join(bins.hint("SHUFFLE_HASH"), Seq("bin"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_bins"),
        sum(col("__nt")).as("n_tokens"),
        md5(expr("array_join(transform(" +
          "sort_array(collect_list(struct(pos, __bmd5))), " +
          "x -> x.__bmd5), '')")).as("shard_md5"))
  }

  /** Token-budget selection — the curation cut that turns "we can
    * afford B training tokens" into a document set: lay the corpus
    * out in priority order (highest first, id as tiebreak) and keep
    * the longest PREFIX whose token total fits the budget. A
    * document that would overflow the budget is dropped and so is
    * everything after it — prefix-cut semantics, deliberately NOT
    * knapsack back-fill: a budget cut that skips doc k but admits a
    * lower-priority doc k+7 because it happens to be shorter is no
    * longer monotone in priority, and monotonicity is what makes
    * budget cuts auditable ("everything above this priority line is
    * in").
    *
    * Scale shape: rides [[sequencePack]]'s two-phase prefix sum
    * verbatim (range layout + per-partition totals + broadcast
    * bases — never a single-partition global window), then a scan
    * filter on start_off; the budget comparison is embedded as a
    * literal. Everything said there about determinism
    * (partition-count independence, reproducible on any cluster)
    * and the localCheckpoint/reliable tradeoff applies unchanged.
    *
    * Returns (idCol, n_tokens, start_off) for the kept rows —
    * start_off is the exclusive running-token total before the doc,
    * so `start_off + n_tokens <= budget` for every survivor.
    * Zero-token documents sitting exactly at the budget line are
    * kept (they cost nothing). */
  def budgetSelect(
      df: DataFrame,
      idCol: String,
      tokens: org.apache.spark.sql.Column,
      priority: org.apache.spark.sql.Column,
      budget: Long,
      partitions: Int = 32,
      reliable: Boolean = false): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    // struct orders lexicographically: (-priority, id) ascending ==
    // priority descending with id tiebreak
    sequencePack(df, idCol, tokens,
      struct((-priority).as("np"), col(idCol).as("tb")),
      capacity = Long.MaxValue, partitions = partitions,
      reliable = reliable)
      .filter(col("start_off") + col("n_tokens") <= budget)
      .select(col(idCol), col("n_tokens"), col("start_off"))
  }

  /** Fixed-token chunking with overlap — the context-window split a
    * RAG / long-document pipeline runs before embedding or packing:
    * chunk i of a document covers tokens
    * [i·stride + 1, min(i·stride + chunkSize, n)] (1-based,
    * inclusive), for i in 0 .. min(ceil(max(n − chunkSize, 0) /
    * stride), floor((n − 1) / stride)); overlapping when stride <
    * chunkSize, gapped when stride > chunkSize, the final chunk may
    * be partial but never empty, and a document never emits a chunk
    * whose start lies beyond its last token (the floor term bites
    * exactly when stride > chunkSize, where the ceil term alone
    * would emit a phantom empty chunk past the end).
    *
    * Scale shape: a pure projection + one Generate (the chunk-index
    * sequence explodes per document; the token array never leaves
    * the scan stage — only chunk text and arithmetic columns ship).
    * Zero shuffles; whitespace tokenization matches [[sequencePack]]
    * and the D-block's `tokens()` convention.
    *
    * Returns (idCol, chunk_idx, chunk_start, chunk_tokens,
    * chunk_text); null-id/text rows are dropped.
    */
  def tokenChunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      stride: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val toks = df
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol), split(trim(col(textCol)), "\\s+").as("__w"))
      .withColumn("__n", size(col("__w")))
      // last chunk index: ceil(max(n - chunkSize, 0) / stride),
      // capped at floor((n - 1) / stride) so no start exceeds n
      .withColumn("__last",
        least(
          ceil(greatest(col("__n") - chunkSize, lit(0)).cast("double") / stride)
            .cast("int"),
          floor((col("__n") - 1).cast("double") / stride).cast("int")))
    toks
      .select(col(idCol), col("__w"), col("__n"),
        posexplode(transform(sequence(lit(0), col("__last")),
          i => i * stride)))
      .select(col(idCol), col("pos").as("chunk_idx"),
        (col("col") + 1).as("chunk_start"),
        least(lit(chunkSize), col("__n") - col("col")).as("chunk_tokens"),
        array_join(slice(col("__w"), col("col") + 1, lit(chunkSize)), " ")
          .as("chunk_text"))
  }

  /** Global re-pack of a streaming shard sink — the batch half of
    * the C12 contract ([[graft.streaming.StreamingIngest
    * .toPipelineIngest]] emits BATCH-scoped shards whose offsets
    * restart at 0 each micro-batch; an epoch that wants ONE
    * contiguous global bin sequence runs this over the accumulated
    * sink). Documents are deduplicated by id first — the stream's
    * crash-window residual is a duplicate shard row, and a re-pack
    * is the natural place to shed it — then re-packed from their
    * stored token counts (no re-tokenization; the stream already
    * paid it) in the same md5(id) order the shards used. Returns the
    * [[sequencePack]] shape plus the carried text column. */
  def repackShards(spark: org.apache.spark.sql.SparkSession,
      path: String, capacity: Long, idCol: String = "doc_id",
      textCol: String = "main_text",
      reliable: Boolean = false): DataFrame = {
    val docs = spark.read.parquet(path)
      .select(col(idCol), col(textCol), col("n_tokens"))
      .dropDuplicates(idCol)
    sequencePack(docs, idCol,
      tokens = col("n_tokens"),
      orderCol = md5(col(idCol).cast("string")),
      capacity = capacity, reliable = reliable)
      .join(docs.select(col(idCol), col(textCol)), Seq(idCol))
  }

  /** Sequence-LENGTH distribution — the evidence behind choosing a
    * pack capacity (and a max-sequence cut): documents bucketed by
    * power-of-two token count, one row per occupied bucket with its
    * exact [lo, hi] range, doc count and token mass. Read it before
    * setting [[sequencePack]]'s capacity: mass above the capacity
    * bucket is what gets split across bins; a long tail argues for a
    * length cut upstream.
    *
    * The bucket is PURE INTEGER arithmetic — length(bin(n)) is
    * floor(log2 n)+1 on the binary string, no float log to disagree
    * at exact powers of two — and lo/hi derive by bit shifts. Bucket
    * 0 holds token-less documents (empty text). One scan projection +
    * ONE ≤64-row aggregate; map-side partials. */
  def lengthHistogram(docs: DataFrame, idCol: String,
      tokens: Column): DataFrame =
    docs.filter(col(idCol).isNotNull)
      .select(tokens.cast("long").as("__n"))
      .select(when(col("__n") <= 0, lit(0L))
        .otherwise(length(bin(col("__n"))).cast("long")).as("bucket"),
        col("__n"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__n")).as("n_tokens"))
      .select(col("bucket"),
        when(col("bucket") === 0, lit(0L))
          .otherwise(expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT) - 1)"))
          .as("lo"),
        when(col("bucket") === 0, lit(0L))
          .otherwise(expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT)) - 1"))
          .as("hi"),
        col("n_docs"), col("n_tokens"))
}
