package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Deterministic stratified sampling for corpus curation.
  *
  * The standard way to rebalance a web-scale corpus — downsample the
  * head strata (e.g. English at 40+ % of the crawl) to a language
  * budget — without a shuffle, a sort, or any randomness: membership
  * is a pure function of the row's id, so the same documents are
  * selected on any cluster, any partitioning, any run, and the
  * sample is a subset of any larger-rate sample of the same stratum
  * (nested samples, the property that makes hash sampling the
  * curation default over seeded rand()).
  */
object Sampling {

  /** Upper bound on distinct strata for the driver-side pulls below
    * (per-stratum counts / weights / thresholds): each stratum
    * becomes one row on the driver AND one CASE arm in a literal
    * plan, so the operators here are built for mixture TABLES (tens
    * of strata — languages, sources, tiers), not high-cardinality
    * keys. A user passing e.g. a raw domain column would otherwise
    * get an unbounded driver pull plus a megabyte CASE expression
    * that slows planning before it breaks anything visibly —
    * raise-don't-drift. Pre-bucket such a column (hash ranges,
    * [[capPerStratum]] output tiers) to get under the bound. */
  val MaxStrata: Int = 4096

  /** The bounded pull itself: LIMIT MaxStrata+1 caps what can ever
    * reach the driver (the guard fires off one extra row, not after
    * materializing a million), then fail loud past the bound. */
  private def boundedStrataPull(grouped: DataFrame, op: String): Array[Row] = {
    val rows = grouped.limit(MaxStrata + 1).collect()
    require(rows.length <= MaxStrata,
      s"$op: more than $MaxStrata distinct strata — this operator pulls " +
        "one row per stratum to the driver and builds a per-stratum " +
        "literal plan; use a coarser stratum column or pre-bucket it " +
        "(Sampling.MaxStrata)")
    rows
  }

  /** Keeps each row iff the first two hex chars of md5(id) sort
    * below the row's stratum threshold — rates quantize to 1/256ths
    * (plenty for corpus budgeting; use more prefix chars for finer
    * grain). Rates >= 1.0 keep the whole stratum ("g" sorts above
    * every hex digit). Strata absent from `rates` use `defaultRate`.
    *
    * Scale shape: a codegen'd scan filter — zero shuffle, map-only
    * at 100 TB, and the md5 prefix filter composes with partition
    * pruning and column pruning untouched.
    */
  def stratifiedHashSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 1.0): DataFrame = {
    def thr(rate: Double): String =
      if (rate >= 1.0) "g"
      else f"${math.max(0L, (rate * 256).round)}%02x"
    val threshold = rates.foldLeft(lit(thr(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit(thr(rate))).otherwise(acc)
    }
    df.filter(substring(md5(col(idCol).cast("string")), 1, 2) < threshold)
  }

  /** Temperature resampling — the standard training-mix reweighting
    * pass: flatten a skewed stratum distribution toward uniform by
    * sampling stratum i at rate (n_min / n_i)^(1−T), the largest
    * feasible (no upsampling) rate schedule whose output proportions
    * are ∝ n_i^T. T = 1 keeps the natural mix (all rates 1), T = 0
    * equalizes every stratum down to the smallest. Selection reuses
    * [[stratifiedHashSample]]'s determinism: membership is a pure
    * function of md5(id) against a per-stratum threshold, so the
    * sample is machine-, partitioning- and run-independent, and
    * nested across temperatures (a hotter sample contains every
    * cooler one's rows per stratum).
    *
    * Rates are DERIVED from the corpus itself: one narrow count
    * aggregate, collected to the driver (bounded by the number of
    * distinct strata — the same bounded-pull pattern as the
    * count-min probe keys and IVF centroids), thresholds embedded as
    * literals so the sampling pass stays a pure codegen'd scan
    * filter: zero joins, zero shuffles, map-only at 100 TB.
    *
    * Engine-reproducibility: at T = 0.5 the rate is
    * sqrt(n_min / n_i) — division and sqrt are IEEE-correctly-
    * rounded everywhere, so an external engine re-derives the exact
    * thresholds from its own counts (the d39 oracle does). Other
    * temperatures ride Math.pow, whose last-ULP behavior is
    * engine-specific — fine in production (a one-ULP rate wiggle
    * moves at most one boundary document), but only T = 0.5 is held
    * to the hash-match gate. Thresholds quantize to 1/65536ths
    * (4 md5 hex chars, floor(rate·65536 + 0.5)).
    *
    * Null-stratum rows are dropped (they belong to no mix
    * component). Returns the sampled rows unchanged.
    */
  /** Deterministic EXACT-k sample — the budgeted-count sibling of the
    * rate-based hash sampling (D18 pins a FRACTION; a labeling run,
    * an eval build or a spot-check audit pins a COUNT): the k rows
    * with the smallest md5(seed|id), all original columns intact.
    * Deterministic across machines, partitionings and engines;
    * NESTED like the rate sampler — the k'-sample (k' < k) is a
    * prefix of the k-sample under the same seed, so budgets can grow
    * without resampling; a new seed draws an independent sample.
    *
    * Scale shape: plans as TakeOrderedAndProject — per-partition
    * k-row heaps + one k-row driver merge, never a global sort. k is
    * a driver-bounded pull by contract (same bound class as the
    * strata pulls), guarded. The id tiebreak makes the cut
    * deterministic even under an md5 prefix collision. */
  def exactSample(df: DataFrame, idCol: String, k: Int,
      seed: String = ""): DataFrame = {
    require(k >= 1 && k <= 10000000,
      s"exactSample: k must be in [1, 1e7] (a driver-merged pull), got $k")
    df.filter(col(idCol).isNotNull)
      .orderBy(md5(concat(lit(seed), lit("|"), col(idCol).cast("string"))),
        col(idCol))
      .limit(k)
  }

  def temperatureSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      temperature: Double): DataFrame = {
    require(temperature >= 0.0 && temperature <= 1.0,
      s"temperature must be in [0, 1], got $temperature")
    val counts = boundedStrataPull(df.filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol).cast("string").as("__s"))
      .agg(count(lit(1)).as("__n")), "temperatureSample")
      .map(r => r.getString(0) -> r.getLong(1))
    if (counts.isEmpty) return df.filter(lit(false))
    val nMin = counts.map(_._2).min.toDouble
    def rate(n: Long): Double =
      if (temperature == 0.5) math.sqrt(nMin / n) // exact cross-engine
      else math.pow(nMin / n, 1.0 - temperature)
    def thr(r: Double): String = {
      // quantize FIRST, then the keep-all check: a rate within half
      // a quantum of 1.0 rounds to 65536, whose 5-hex-char rendering
      // would sort BELOW "ffff" and silently select nothing
      val v = math.floor(r * 65536 + 0.5).toLong
      if (v >= 65536L) "g" else f"$v%04x"
    }
    val threshold = counts.foldLeft(lit("0"): Column) {
      case (acc, (s, n)) =>
        when(col(strataCol) === s, lit(thr(rate(n)))).otherwise(acc)
    }
    df.filter(col(strataCol).isNotNull &&
      substring(md5(col(idCol).cast("string")), 1, 4) < threshold)
  }

  /** Per-stratum cap — the RefinedWeb-style "at most N documents per
    * source/domain" guard against a single origin dominating the
    * corpus. Deterministic: within each stratum, rows rank by
    * md5(id) (id as tiebreak — unreachable for distinct ids), so the
    * SAME documents are kept on any cluster, any run, and the kept
    * set of a smaller cap nests inside a larger one's.
    *
    * Scale shape: ONE stratum-keyed exchange + a rank window —
    * the per-group-top-N standard. A MONSTER stratum (one domain at
    * 30 % of the corpus) would land its entire row set in one
    * sorting task just to rank-and-drop it; `prefilter = true` adds
    * the two-phase escape: from the same bounded per-stratum count
    * aggregate [[temperatureSample]] uses, derive the md5-prefix
    * threshold that admits ~`prefilterSlack`·cap rows per stratum,
    * filter MAP-SIDE on it (a codegen'd scan filter — the monster
    * stratum dies before the exchange), then exact-rank only the
    * survivors. Exactness is unconditional, not probabilistic: the
    * kept set is the cap smallest full-md5 rows, every one of which
    * necessarily carries one of the cap smallest prefixes, so it is
    * contained in the admitted set whenever the stratum admits >=
    * min(cap, n) rows — and an in-plan guard (count over the
    * filtered stratum) RAISES if hash variance ever admits fewer
    * (P ~ exp(−cap·(s−1)²/2s) at slack s; rerun with a larger
    * slack), rather than silently returning a different sample.
    *
    * Null-stratum and null-id rows are dropped (several null ids in
    * one stratum would tie on both sort keys, making the kept set
    * run-dependent — the determinism claim is only honest without
    * them).
    */
  def capPerStratum(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      cap: Int,
      prefilter: Boolean = false,
      prefilterSlack: Double = 4.0): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    import org.apache.spark.sql.expressions.Window
    val live = df.filter(col(strataCol).isNotNull && col(idCol).isNotNull)
    val base = if (!prefilter) live else {
      require(prefilterSlack >= 2.0,
        s"prefilterSlack must be >= 2, got $prefilterSlack")
      val counts = boundedStrataPull(live
        .groupBy(col(strataCol).cast("string").as("__s"))
        .agg(count(lit(1)).as("__n")), "capPerStratum")
        .map(r => r.getString(0) -> r.getLong(1))
      def thr(n: Long): String = {
        val r = prefilterSlack * cap / n
        // quantize UP (1/65536ths): the threshold may admit more
        // than slack·cap, never meaningfully fewer
        val v = math.ceil(r * 65536).toLong + 1
        if (r >= 1.0 || v >= 65536L) "g" else f"$v%04x"
      }
      val sCol = col(strataCol).cast("string")
      val threshold = counts.foldLeft(lit("0"): Column) {
        case (acc, (s, n)) => when(sCol === s, lit(thr(n))).otherwise(acc)
      }
      val nTotal = counts.foldLeft(lit(0L): Column) {
        case (acc, (s, n)) => when(sCol === s, lit(n)).otherwise(acc)
      }
      val admitted = count(lit(1))
        .over(Window.partitionBy(col(strataCol)))
      live
        .filter(substring(md5(col(idCol).cast("string")), 1, 4) < threshold)
        .withColumn("__adm", admitted)
        .filter(when(col("__adm") >= least(lit(cap.toLong), nTotal),
          lit(true))
          .otherwise(raise_error(concat(
            lit("capPerStratum prefilter clipped stratum "), sCol,
            lit(" — rerun with a larger prefilterSlack")))))
        .drop("__adm")
    }
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    base
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= cap)
      .drop("__rk")
  }

  /** Deterministic epoch upsampling — the other half of data mixing
    * ([[mixtureSample]] cuts strata DOWN; this repeats high-value
    * documents UP, the "Wikipedia × N epochs" row of every public
    * mixture table): each document expands to `repeats` copies
    * (doc_id, copy_idx 0-based), each copy carrying a 60-bit
    * md5(seed|id|copy) shuffle key so the expanded corpus feeds
    * [[shuffleShard]] / [[graft.operators.Packing.sequencePack]] in
    * a deterministic interleaved order — copies of one document
    * scatter across the epoch instead of clumping back-to-back
    * (which would put correlated gradients in consecutive steps).
    *
    * `repeats` must be a per-row integer >= 0 (0 drops the doc — a
    * gate and an upsampler compose in one pass); an in-plan guard
    * RAISES past `maxRepeats` — a runaway repeat expression
    * silently exploding the corpus N× is the failure mode that
    * must be loud.
    *
    * Scale shape: a pure projection + ONE Generate (the copy-index
    * sequence explodes per document) — zero shuffles, zero joins;
    * the blow-up factor is exactly Σ repeats / N, chosen by the
    * caller's policy, and composes with partition pruning and
    * column pruning untouched. Returns (idCol, copy_idx, n_copies,
    * shuffle_key). Null-id rows are dropped. */
  def upsample(
      df: DataFrame,
      idCol: String,
      repeats: Column,
      seed: String = "up",
      maxRepeats: Int = 100): DataFrame = {
    require(maxRepeats >= 1, s"maxRepeats must be >= 1, got $maxRepeats")
    df.filter(col(idCol).isNotNull)
      .select(col(idCol), repeats.cast("int").as("__r"))
      .filter(col("__r").isNotNull && col("__r") > 0)
      .select(col(idCol),
        when(col("__r") <= maxRepeats, col("__r"))
          .otherwise(raise_error(concat(
            lit(s"upsample: repeats exceeds maxRepeats=$maxRepeats for id "),
            col(idCol).cast("string")))).as("__r"))
      .select(col(idCol), col("__r").cast("long").as("n_copies"),
        posexplode(sequence(lit(0), col("__r") - 1)))
      .select(col(idCol), col("col").cast("long").as("copy_idx"),
        col("n_copies"),
        Dedup.md5Hash60(concat(lit(seed), lit("|"),
          col(idCol).cast("string"), lit("|"),
          col("col").cast("string"))).as("shuffle_key"))
  }

  /** Mixture-matching sampler — the data-mixing cut that turns "the
    * training set is W% web, X% books, Y% code, inside a budget of B
    * tokens" into a document set (the Pile / Gopher / LLaMA mixture
    * table made executable). Each stratum s gets an integer token
    * allowance
    *
    *   allowance(s) = rawWeight(s) · B  div  Σ_s rawWeight(s)
    *
    * (pure integer arithmetic — no float shares to drift across
    * engines), and within each stratum documents are kept in
    * deterministic md5(seed|id)-priority order as the longest prefix
    * whose token total fits the allowance — [[graft.operators
    * .Packing.budgetSelect]]'s prefix-cut semantics per stratum
    * (a doc that would overflow is dropped and so is everything
    * after it: monotone in priority, so the cut stays auditable).
    *
    * `rawWeight` must be a function of the stratum (one integer per
    * stratum, riding the rows); an in-plan-derived guard RAISES on
    * an inconsistent weight column rather than silently averaging.
    *
    * Scale shape: [[shuffleShard]]'s two-phase prefix-sum discipline
    * with token SUMS instead of counts — a (stratum, priority) range
    * layout pinned once (checkpoint; see sequencePack on why), phase
    * 1 collects per-(partition, stratum) token totals (narrow,
    * ≤ partitions·|strata| rows), the driver prefix-sums them into
    * bases, phase 2 assigns within-stratum running offsets
    * partition-locally — NEVER `sum() OVER (PARTITION BY stratum)`,
    * whose WindowExec buffers a whole stratum (~corpus/|strata|
    * rows) in one task. The allowance comparison is a scan filter
    * on the result.
    *
    * Returns (idCol, strataCol, n_tokens, start_off) for kept rows —
    * start_off is the within-stratum exclusive prefix total, so
    * start_off + n_tokens <= allowance(stratum) for every survivor.
    * Null id/stratum/token rows are dropped. `reliable = true` swaps
    * the layout pin to a reliable checkpoint (the sequencePack
    * contract). */
  def mixtureSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      tokens: Column,
      rawWeight: Column,
      budget: Long,
      seed: String = "mix",
      partitions: Int = 32,
      reliable: Boolean = false): DataFrame = {
    val (offsets, allowance, _) = mixtureOffsets(df, idCol, strataCol,
      tokens, rawWeight, budget, seed, partitions, reliable)
    // allowance as a literal CASE over the bounded strata set (the
    // capPerStratum threshold-fold shape), then the prefix-cut filter
    val allowCol = allowance.foldLeft(lit(-1L): Column) {
      case (acc, (s, a)) => when(col("__s") === s, lit(a)).otherwise(acc)
    }
    offsets
      .filter(col("start_off") + col("n_tokens") <= allowCol)
      .select(col(idCol), col("__s").as(strataCol), col("n_tokens"),
        col("start_off"))
  }

  /** FULL mixture semantics — [[mixtureSample]] extended with
    * EPOCHS, the up-sampling half every public mixture table carries
    * (LLaMA's "epochs" column: Wikipedia at 2.45 epochs while web
    * crawl sits below 1): when a stratum's token allowance exceeds
    * its total mass, every document earns `allowance div total`
    * whole-corpus epochs and the REMAINDER fills as the usual
    * md5-priority prefix — so Σ n_copies·n_tokens <= allowance
    * exactly, per stratum, in pure integer arithmetic. A stratum
    * whose allowance is below its mass degenerates to the
    * [[mixtureSample]] prefix cut (epochs = 0); rows with zero
    * copies are dropped. Feed the result to [[upsample]] (repeats =
    * n_copies) for the physical copy explosion with scatter keys.
    *
    * Same two-phase machinery, same guards, same determinism as
    * [[mixtureSample]]; the per-stratum totals come from the SAME
    * phase-1 aggregate the offsets need (no extra pass). Returns
    * (idCol, strataCol, n_tokens, start_off, n_copies). */
  def mixtureEpochs(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      tokens: Column,
      rawWeight: Column,
      budget: Long,
      seed: String = "mix",
      partitions: Int = 32,
      reliable: Boolean = false): DataFrame = {
    val (offsets, allowance, totals) = mixtureOffsets(df, idCol,
      strataCol, tokens, rawWeight, budget, seed, partitions, reliable)
    val epochs: Map[String, (Long, Long)] = allowance.map { case (s, a) =>
      val t = totals.getOrElse(s, 0L)
      // t > 0 for every stratum that reaches here (mixtureOffsets
      // drops zero-token rows, so a present stratum has mass);
      // the branch stays as a defensive dead end, not a behavior
      if (t <= 0) s -> (0L, 0L) else s -> (a / t, a % t)
    }
    val epochCol = epochs.foldLeft(lit(0L): Column) {
      case (acc, (s, (e, _))) => when(col("__s") === s, lit(e)).otherwise(acc)
    }
    val remCol = epochs.foldLeft(lit(0L): Column) {
      case (acc, (s, (_, r))) => when(col("__s") === s, lit(r)).otherwise(acc)
    }
    offsets
      .select(col(idCol), col("__s").as(strataCol), col("n_tokens"),
        col("start_off"),
        (epochCol + when(col("start_off") + col("n_tokens") <= remCol,
          lit(1L)).otherwise(lit(0L))).as("n_copies"))
      .filter(col("n_copies") > 0)
  }

  /** Shared [[mixtureSample]]/[[mixtureEpochs]] machinery: the
    * pinned (stratum, md5-priority) range layout, the two-phase
    * per-stratum token prefix sum, and the integer allowance map —
    * returns (offsets, allowance by stratum, total token mass by
    * stratum; the totals fall out of the SAME phase-1 aggregate). */
  private def mixtureOffsets(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      tokens: Column,
      rawWeight: Column,
      budget: Long,
      seed: String,
      partitions: Int,
      reliable: Boolean)
      : (DataFrame, Map[String, Long], Map[String, Long]) = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(partitions >= 1, s"partitions must be >= 1, got $partitions")
    val pr = Dedup.md5Hash60(
      concat(lit(seed), lit("|"), col(idCol).cast("string")))
    val base = df
      .filter(col(idCol).isNotNull && col(strataCol).isNotNull)
      .select(col(idCol), col(strataCol).cast("string").as("__s"),
        tokens.cast("long").as("__n"), rawWeight.cast("long").as("__w"),
        pr.as("__p"))
      // zero-token rows are dropped EXPLICITLY (they carry no mass,
      // would earn phantom copies under mixtureEpochs' start_off+n<=r
      // test, and divide the oracle's allowance arithmetic by zero —
      // one defined behavior on both engines)
      .filter(col("__n").isNotNull && col("__n") > 0)
    // per-stratum integer allowances: bounded driver pull (|strata|
    // rows), fail-loud on a weight column that is not a function of
    // the stratum, overflow-guarded multiply. Null weights are
    // checked FIRST — min/max ignore nulls, so without the count
    // comparison a stratum mixing null and non-null weights would
    // slip the lo==hi guard, and an all-null one would NPE opaquely.
    val wRows = boundedStrataPull(base.groupBy(col("__s"))
      .agg(min(col("__w")).as("lo"), max(col("__w")).as("hi"),
        count(lit(1)).as("nrows"), count(col("__w")).as("nw")),
      "mixtureSample")
      .map { r =>
        val s = r.getString(0)
        require(r.getLong(3) == r.getLong(4),
          s"mixtureSample: rawWeight is NULL on " +
            s"${r.getLong(3) - r.getLong(4)} of ${r.getLong(3)} rows in " +
            s"stratum $s — it must be a non-null function of the stratum")
        val (lo, hi) = (r.getLong(1), r.getLong(2))
        require(lo == hi,
          s"mixtureSample: rawWeight inconsistent within stratum $s " +
            s"($lo vs $hi) — it must be a function of the stratum")
        require(lo > 0, s"mixtureSample: rawWeight must be > 0 " +
          s"(stratum $s has $lo)")
        s -> lo
      }
    val totalW = wRows.map(_._2).sum
    val allowance: Map[String, Long] = wRows.map { case (s, w) =>
      require(w == 0 || math.abs(budget) <= Long.MaxValue / w,
        s"mixtureSample: rawWeight·budget overflows for stratum $s")
      s -> (w * budget / totalW)
    }.toMap

    // range layout over (stratum, priority desc, id), pinned
    val ranged = base
      .select(col(idCol), col("__s"), col("__n"), col("__p"))
      .repartitionByRange(partitions, col("__s"), col("__p").desc,
        col(idCol))
    val parts = if (reliable) ranged.checkpoint() else ranged.localCheckpoint()

    // Phase 1: per-(partition, stratum) token totals.
    val counts = parts
      .select(spark_partition_id().as("__pid"), col("__s"), col("__n"))
      .groupBy(col("__pid"), col("__s"))
      .agg(sum(col("__n")).as("__t"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2))
    // Driver prefix sum per stratum across partitions in range order.
    val bases: Map[(Int, String), Long] = counts
      .groupBy(_._1._2)
      .iterator.flatMap { case (s, entries) =>
        var acc = 0L
        entries.sortBy(_._1._1).map { case ((pid, _), t) =>
          val r = (pid, s) -> acc; acc += t; r
        }
      }.toMap

    // Phase 2: partition-local running token offsets on the SAME
    // pinned layout.
    val idField = df.schema(idCol)
    val outSchema = StructType(Seq(idField,
      StructField("__s", org.apache.spark.sql.types.StringType,
        nullable = false),
      StructField("n_tokens", org.apache.spark.sql.types.LongType,
        nullable = false),
      StructField("start_off", org.apache.spark.sql.types.LongType,
        nullable = false)))
    val offsets = parts
      .sortWithinPartitions(col("__s"), col("__p").desc, col(idCol))
      .select(spark_partition_id().as("__pid"), col(idCol), col("__s"),
        col("__n"))
      .mapPartitions { rows =>
        var curStratum: String = null
        var run = 0L
        rows.map { r =>
          val s = r.getString(2)
          if (s != curStratum) {
            curStratum = s
            run = bases.getOrElse((r.getInt(0), s), 0L)
          }
          val n = r.getLong(3)
          val out = Row(r.get(1), s, n, run)
          run += n
          out
        }
      }(Encoders.row(outSchema))

    val totals: Map[String, Long] = counts
      .groupBy(_._1._2).map { case (s, es) => s -> es.map(_._2).sum }
    (offsets, allowance, totals)
  }

  /** Deterministic global shuffle + sharding — the last pass before
    * a training run: assign every document a shard and a position
    * within it, so the corpus streams to the trainer in a fixed
    * pseudo-random order that is identical on any cluster, any
    * partitioning, any rerun (seeded rand() is none of those under
    * Spark task retry). The shuffle key is a 60-bit md5 of
    * (seed, id): changing the seed reshuffles everything; keeping it
    * makes the training order a pure function of the corpus.
    *
    * Scale shape: [[graft.operators.Packing.sequencePack]]'s
    * two-phase prefix-sum discipline, applied per shard — NEVER
    * `row_number() OVER (PARTITION BY shard)`, whose WindowExec
    * buffers a whole shard (~corpus/numShards rows) in one task's
    * spillable array. Instead: a range layout over
    * (shard, key, id) — balanced by sampling even when a shard far
    * outweighs a task — is pinned once (checkpoint; see
    * sequencePack on WHY the RangePartitioner's per-execution
    * boundary sampling makes this mandatory, not an optimization),
    * then phase 1 collects per-(partition, shard) COUNTS (narrow
    * rows, ≤ partitions·numShards of them), the driver prefix-sums
    * them into per-(partition, shard) rank bases, and phase 2
    * assigns positions partition-locally on the same layout. A
    * shard's rows span partitions contiguously in range order, so
    * base + local running count IS the global within-shard rank.
    *
    * Returns (idCol, shard, pos): shard in [0, numShards),
    * pos 1-based within its shard in key order (tiebreak id —
    * unreachable for distinct ids). Null ids are dropped.
    * `reliable = true` swaps the layout pin from localCheckpoint to
    * a reliable checkpoint (executor-loss safe), the sequencePack
    * contract. */
  def shuffleShard(
      df: DataFrame,
      idCol: String,
      numShards: Int,
      seed: String,
      partitions: Int = 32,
      reliable: Boolean = false): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    require(partitions >= 1, s"partitions must be >= 1, got $partitions")
    val key = Dedup.md5Hash60(
      concat(lit(seed), lit("|"), col(idCol).cast("string")))
    val ranged = df.filter(col(idCol).isNotNull)
      .select(col(idCol), key.as("__k"))
      .withColumn("shard", (col("__k") % numShards).cast("int"))
      .repartitionByRange(partitions, col("shard"), col("__k"), col(idCol))
    val parts = if (reliable) ranged.checkpoint() else ranged.localCheckpoint()

    // Phase 1: per-(partition, shard) counts — narrow, one row per
    // occupied (pid, shard) cell, bounded by partitions · numShards.
    val counts = parts
      .select(spark_partition_id().as("__pid"), col("shard"))
      .groupBy(col("__pid"), col("shard"))
      .agg(count(lit(1)).as("__c"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2))
    // Driver prefix sum per shard across partitions in range order.
    val bases: Map[(Int, Int), Long] = counts
      .groupBy(_._1._2)
      .iterator.flatMap { case (sh, entries) =>
        var acc = 0L
        entries.sortBy(_._1._1).map { case ((pid, _), c) =>
          val r = (pid, sh) -> acc; acc += c; r
        }
      }.toMap

    // Phase 2: partition-local ranks on the SAME pinned layout.
    val idField = df.schema(idCol)
    val outSchema = StructType(Seq(idField,
      StructField("shard", IntegerType, nullable = false),
      StructField("pos", IntegerType, nullable = false)))
    parts
      .sortWithinPartitions(col("shard"), col("__k"), col(idCol))
      .select(spark_partition_id().as("__pid"), col(idCol), col("shard"))
      .mapPartitions { rows =>
        var curShard = Int.MinValue
        var run = 0L
        rows.map { r =>
          val sh = r.getInt(2)
          if (sh != curShard) {
            curShard = sh
            run = bases.getOrElse((r.getInt(0), sh), 0L)
          }
          run += 1L
          Row(r.get(1), sh, run.toInt)
        }
      }(Encoders.row(outSchema))
  }

  private def checkSplits(splits: Seq[(String, Double)]): Unit = {
    require(splits.nonEmpty, "splits must be non-empty")
    require(splits.map(_._1).distinct == splits.map(_._1),
      s"split names must be distinct, got ${splits.map(_._1)}")
    splits.foreach { case (n, w) =>
      require(w > 0.0, s"split '$n' must have weight > 0, got $w") }
  }

  /** Deterministic train/val/test assignment, HASH mode — the
    * 100 TB default: each row's split is a pure function of
    * md5(seed|id), thresholds quantized to 1/65536ths (the
    * temperatureSample discipline), so the operator is a codegen'd
    * scan PROJECTION — zero shuffles, composable with partition
    * pruning, and any engine re-derives the assignment. Proportions
    * hold in expectation (±√n noise per split), which is what every
    * production split wants: membership must never depend on what
    * else is in the corpus, so yesterday's train doc is train
    * forever, under appends, deletes and re-partitioning. Use
    * [[stratifiedSplit]] when EXACT per-stratum counts matter more
    * than append-stability. Null-id rows are dropped (no identity,
    * no stable membership). */
  def hashSplit(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Double)],
      seed: String = "split"): DataFrame = {
    checkSplits(splits)
    val total = splits.map(_._2).sum
    // cumulative thresholds as 4-hex-char strings; the LAST split
    // takes everything above the previous threshold (never "g"-caps
    // early, so the weights always partition the hash space)
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail.map(_ / total)
    val thr = cums.init.map { c =>
      // the temperatureSample quantize-then-guard discipline: a
      // cumulative within half a quantum of 1.0 (e.g. a 6.5e-6
      // holdout split) rounds to 65536, whose 5-char "%04x"
      // rendering "10000" sorts BELOW most 4-char hashes and would
      // silently invert the assignment — clamp to the always-true
      // sentinel instead
      val v = math.floor(c * 65536 + 0.5).toLong
      if (v >= 65536L) "g" else f"$v%04x"
    }
    val h = substring(md5(concat(lit(seed), lit("|"),
      col(idCol).cast("string"))), 1, 4)
    val assign = thr.zip(splits.map(_._1)).foldRight(
      lit(splits.last._1): Column) {
      case ((t, name), acc) => when(h < t, name).otherwise(acc)
    }
    df.filter(col(idCol).isNotNull).withColumn("split", assign)
  }

  /** Deterministic train/val/test assignment, EXACT mode: within
    * each stratum, rows rank by (md5(seed|id), id) and the first
    * round(p_train·n) go to the first split, the next slice to the
    * second, and so on — cumulative boundaries floor(cum_i·n + 0.5),
    * so the counts are exact (the last boundary is n by
    * construction) and the per-stratum mix of every split matches
    * the corpus. The price vs [[hashSplit]] is append-stability:
    * adding rows moves boundaries, so membership is a function of
    * the WHOLE stratum — the eval-set builder's contract, not the
    * rolling-ingest one.
    *
    * Scale shape: the shuffleShard two-phase rank discipline keyed
    * by stratum — ONE range exchange on (stratum, hash, id), a
    * per-(partition, stratum) count aggregate (≤ partitions·strata
    * rows, strata capped by [[MaxStrata]]), driver prefix bases,
    * partition-local running ranks. No per-stratum window ever sees
    * a full stratum. Null id/stratum rows are dropped. Returns
    * (idCol, strataCol, split). */
  def stratifiedSplit(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      splits: Seq[(String, Double)],
      seed: String = "split",
      partitions: Int = 32,
      reliable: Boolean = false): DataFrame = {
    checkSplits(splits)
    val total = splits.map(_._2).sum
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail.map(_ / total)
    rankedAssign(df, idCol, strataCol,
      md5(concat(lit(seed), lit("|"), col(idCol).cast("string"))),
      cums, splits.map(_._1).toArray, outCol = "split",
      partitions, reliable, op = "stratifiedSplit")
  }

  /** Per-stratum RANKED bucketing — [[stratifiedSplit]]'s exact-count
    * machinery with the rank key caller-chosen instead of an md5
    * shuffle: within each stratum, rows order by (orderCol, id) and
    * cumulative boundaries floor(cum_i·n + 0.5) cut the buckets.
    * This is the CCNet discipline (Wenzek et al., LREC 2020): per
    * LANGUAGE, documents rank by LM quality score and split into
    * head/middle/tail fractions, so "keep the head, drop or reweight
    * the tail" is a per-language policy — a global score cut would
    * let a high-resource language's mid-range crowd out a
    * low-resource language's best documents. Pass
    * `orderCol = -score` to put the best score in the FIRST bucket
    * (keys sort ascending; IEEE negation is exact, so ranking by the
    * negated rounded score is bit-identical to `score DESC`). The
    * order key must be deterministic and total under the (orderCol,
    * id) tiebreak — round scores before ranking (§6's rule) so both
    * engines rank identical doubles.
    *
    * Scale shape: identical to [[stratifiedSplit]] — ONE range
    * exchange on (stratum, key, id), a bounded per-(partition,
    * stratum) count pull under [[MaxStrata]], partition-local running
    * ranks; no per-stratum window ever buffers a full stratum, which
    * is exactly what a rank-percentile cut per language must avoid at
    * 100 TB (English IS the zipf-head stratum). Returns (idCol,
    * strataCol, bucket). */
  def rankBuckets(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      orderCol: Column,
      buckets: Seq[(String, Double)],
      partitions: Int = 32,
      reliable: Boolean = false): DataFrame = {
    checkSplits(buckets)
    val total = buckets.map(_._2).sum
    val cums = buckets.map(_._2).scanLeft(0.0)(_ + _).tail.map(_ / total)
    rankedAssign(df, idCol, strataCol, orderCol,
      cums, buckets.map(_._1).toArray, outCol = "bucket",
      partitions, reliable, op = "rankBuckets")
  }

  /** The shared two-phase per-stratum rank assignment behind
    * [[stratifiedSplit]] and [[rankBuckets]]: range-partition by
    * (stratum, key, id), pin the layout, pull bounded per-(partition,
    * stratum) counts, derive prefix bases + floor(cum·n + 0.5)
    * boundaries on the driver, then walk partition-local running
    * ranks. Null id/stratum rows are dropped. */
  private def rankedAssign(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      keyCol: Column,
      cums: Seq[Double],
      names: Array[String],
      outCol: String,
      partitions: Int,
      reliable: Boolean,
      op: String): DataFrame = {
    require(partitions >= 1, s"partitions must be >= 1, got $partitions")
    val ranged = df
      .filter(col(idCol).isNotNull && col(strataCol).isNotNull)
      .select(col(idCol), col(strataCol).cast("string").as("__s"),
        keyCol.as("__k"))
      .repartitionByRange(partitions, col("__s"), col("__k"), col(idCol))
    val parts = if (reliable) ranged.checkpoint() else ranged.localCheckpoint()

    // Phase 1: per-(partition, stratum) counts; guard the stratum
    // cardinality BEFORE pulling (partitions · strata rows)
    val counts = parts
      .select(spark_partition_id().as("__pid"), col("__s"))
      .groupBy(col("__pid"), col("__s"))
      .agg(count(lit(1)).as("__c"))
      .limit(partitions * (MaxStrata + 1))
      .collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2))
    val strata = counts.map(_._1._2).distinct
    require(strata.length <= MaxStrata,
      s"$op: more than $MaxStrata distinct strata — " +
        "use a coarser stratum column or hashSplit (Sampling.MaxStrata)")
    val totals: Map[String, Long] =
      counts.groupBy(_._1._2).view.mapValues(_.map(_._2).sum).toMap
    val bases: Map[(Int, String), Long] = counts
      .groupBy(_._1._2)
      .iterator.flatMap { case (s, entries) =>
        var acc = 0L
        entries.sortBy(_._1._1).map { case ((pid, _), c) =>
          val r = (pid, s) -> acc; acc += c; r
        }
      }.toMap
    // per-stratum cumulative boundaries; the last is exactly n
    val bounds: Map[String, Array[Long]] = totals.map { case (s, n) =>
      val b = cums.init.map(c => math.floor(c * n + 0.5).toLong).toArray
      s -> (b :+ n)
    }

    // Phase 2: partition-local running ranks on the pinned layout
    val idField = df.schema(idCol)
    val strataField = StructField(strataCol, org.apache.spark.sql.types
      .StringType, nullable = false)
    val outSchema = StructType(Seq(idField, strataField,
      StructField(outCol, org.apache.spark.sql.types.StringType,
        nullable = false)))
    parts
      .sortWithinPartitions(col("__s"), col("__k"), col(idCol))
      .select(spark_partition_id().as("__pid"), col(idCol), col("__s"))
      .mapPartitions { rows =>
        var cur: String = null
        var run = 0L
        rows.map { r =>
          val s = r.getString(2)
          if (s != cur) {
            cur = s
            run = bases.getOrElse((r.getInt(0), s), 0L)
          }
          run += 1L
          val b = bounds(s)
          var i = 0
          while (i < b.length - 1 && run > b(i)) i += 1
          Row(r.get(1), s, names(i))
        }
      }(Encoders.row(outSchema))
  }
}
