package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Generator, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-sketch hot paths.
  *
  * The built-in route — nested `transform`/`aggregate`/`zip_with`
  * lambdas — is evaluated interpreted, per element, with no
  * subexpression elimination; profiled at sf0.1 it dominated the
  * dedup/fingerprint operators. These expressions do the same work
  * as single tight JVM loops over the unsafe array data (hashing via
  * the same XXH64 used by Spark's `xxhash64`). They are
  * engine-specific sketches (rows-only correctness surface +
  * property specs), so exact parity with a SQL oracle is not
  * required — but SimHash64 is bit-identical to the previous HOF
  * formulation by construction.
  */
object SketchFunctions {
  private def ub(e: Expression): Column = Bridge.column(e)
  private def x(c: Column): Expression = Bridge.expression(c)

  /** 64-bit SimHash of an array<string> token column. */
  def simhash64(tokens: Column): Column = ub(SimHash64(x(tokens)))

  /** MinHash signature (array<long>, `numPerms` seeded permutations)
    * of an array<string> shingle column. */
  def minhash64(shingles: Column, numPerms: Int): Column =
    ub(MinHash64(x(shingles), numPerms))

  /** Winnowing fingerprints (array<long>, ascending distinct) of a
    * string column: char k-gram rolling hashes, min per window of w. */
  def winnow(text: Column, k: Int, w: Int): Column = ub(Winnow(x(text), k, w))

  /** Winnowing SELECTION only (min per window of w, distinct,
    * ascending) over a precomputed positional gram-hash array — the
    * same kernel phase [[winnow]] runs after hashing, exposed so the
    * oracle twin can drive it with engine-reproducible hashes. */
  def winnowSelect(gramHashes: Column, w: Int): Column =
    ub(WinnowSelect(x(gramHashes), w))

  /** Jaccard similarity of two SORTED distinct array<long> columns
    * (single merge pass). */
  def jaccardSorted(a: Column, b: Column): Column =
    ub(JaccardSortedLong(x(a), x(b)))

  /** Distinct space-joined word k-shingles of an array<string>
    * token column (first-occurrence order). */
  def wordShingles(tokens: Column, k: Int): Column =
    ub(WordShingles(x(tokens), k))

  /** ALL space-joined word k-grams of an array<string> token column —
    * positional order, multiplicity KEPT (posexplode gives each
    * gram's 0-based token offset); inputs shorter than k words yield
    * no grams. The positional counterpart of [[wordShingles]]. */
  def wordGrams(tokens: Column, k: Int): Column =
    ub(WordGrams(x(tokens), k))

  /** Engine-reproducible 60-bit SimHash of an array<string> token
    * column: md5-hash60 per token (with multiplicity), majority vote
    * per bit — the d29 oracle-twin signature
    * ([[graft.operators.Dedup.md5Simhash60]]) as ONE codegen'd pass
    * per document instead of a 60-way explode→sum aggregate. */
  def md5Simhash60(tokens: Column): Column = ub(Md5SimHash60(x(tokens)))

  /** The d30 oracle-twin minhash signature (md5-hash60 low 30 bits
    * per shingle, universal-hash min per permutation) as ONE
    * codegen'd pass ([[Md5MinHash30]]) — replaces an explode →
    * numPerms-way min aggregate plus a signature join-back. Callers
    * must exclude empty-shingle inputs. */
  def md5Minhash30(shingles: Column, numPerms: Int): Column =
    ub(Md5MinHash30(x(shingles), numPerms))

  /** [[md5Minhash30]] with the per-shingle md5Hash60 step already
    * done — signature re-derivation from a dedup index's STORED
    * hashed shingle sets (the reband verb's kernel); value-identical
    * to md5Minhash30 over the original shingles at any numPerms. */
  def md5Minhash30FromHashes(hashes: Column, numPerms: Int): Column =
    ub(Md5MinHash30FromHashes(x(hashes), numPerms))

  /** Symmetric int8 quantization to a float array (integer values
    * <= 127, exact) — `Similarity.quantizeInt8`'s q column as ONE
    * codegen'd kernel pass instead of four interpreted HOF passes;
    * the ANN oracle twins' vector prep ([[QuantizeInt8Floats]]). */
  def quantizeInt8Floats(vec: Column): Column = ub(QuantizeInt8Floats(x(vec)))

  /** Integer-hyperplane LSH signature over an int8-quantized float
    * vector — the d34 oracle-twin signature as one codegen'd pass
    * ([[Md5PlaneSig]]) instead of a bits×dim nested-HOF aggregate. */
  def md5PlaneSig(vec: Column, bits: Int, dim: Int): Column =
    ub(Md5PlaneSig(x(vec), bits, dim))

  /** Per-marker occurrence counts (array<int>, aligned with
    * `markers`) in padded lowercased text — one expression, one text
    * pass per marker. */
  def markerCounts(text: Column, markers: Seq[String]): Column =
    ub(MarkerCounts(x(text), markers))

  /** struct(n_words, non_space, stop_n) — the quality-scoring base
    * stats in one native pass (vs ~10 split/replace/regex passes when
    * the SQL-arithmetic forms get inlined into every reference). */
  def textStats(text: Column): Column = ub(TextStats(x(text)))

  /** Per-document (term, tf) posting entries (array<struct>, term-
    * sorted) — the map-side-complete rows of an inverted-index build
    * ([[TermCounts]]): tf is a per-doc statistic, so deriving it via
    * explode→groupBy would pay a corpus-wide exchange that merges
    * nothing. */
  def termCounts(tokens: Column): Column = ub(TermCounts(x(tokens)))

  /** [[termCounts]] with positions kept (array<struct<term,
    * positions>>, 1-based ascending) — the positional inverted-index
    * build rows phrase/proximity serving reads ([[TermPositions]]). */
  def termPositions(tokens: Column): Column = ub(TermPositions(x(tokens)))

  /** struct(n_words, denom, top2, top3, dup5) — the per-document
    * Gopher repetition masses in ONE native pass over the token
    * array (the corpus-wide (doc, n, gram) aggregate this replaces
    * shuffled gram strings and went superlinear at 10× — see
    * [[graft.operators.TextAnalysis.repetitionStats]]). */
  def repetitionStats(tokens: Column): Column =
    ub(RepetitionStats(x(tokens)))

  /** Bloom filter aggregate over a long column (Spark's internal
    * BloomFilterAggregate — the expression behind adaptive runtime
    * filtering, not registered as a public SQL function; surfaced
    * here for EXPLICIT cross-pipeline pre-filters). */
  def bloomFilterAgg(c: Column, estimatedItems: Long, numBits: Long): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    ub(new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
      x(c), Literal(estimatedItems), Literal(numBits)).toAggregateExpression())
  }

  /** Membership probe against a [[bloomFilterAgg]] result. May return
    * false positives, never false negatives. */
  def mightContain(bloom: Column, value: Column): Column =
    ub(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      x(bloom), x(value)))

  /** Generator: all (id_a, id_b, hamming) pairs with
    * popcount(sim_a XOR sim_b) <= maxDist from one bucket's
    * array<struct<id:long, sim:long>> members; id_a < id_b, streamed
    * lazily (selecting this column plans a Generate, like explode).
    * A bucket with more than `memberCap` members throws a descriptive
    * error instead of silently running the quadratic loop. */
  def hammingPairs(members: Column, maxDist: Int,
      memberCap: Int = Int.MaxValue): Column =
    ub(HammingPairsGen(x(members), maxDist, memberCap))
}

/** One-pass text statistics, bit-compatible with the SQL arithmetic
  * the d9/d10/d13 DuckDB oracles use:
  * - n_words  = size(split(trim(text), "\\s+", -1)), 0 when trim(text)
  *   is empty. trim strips 0x20 only; \s is the ASCII class
  *   [ \t\n\x0B\f\r]; split keeps leading/trailing empty tokens, so
  *   the count is (whitespace runs) + 1.
  * - non_space = length(replace(text, ' ', '')) — code points ≠ 0x20.
  * - stop_n   = non-overlapping occurrences of " the " in
  *   ' ' + lower(text) + ' ' (replace()-style left-to-right consume).
  * All three are byte-wise loops ([[SketchKernels.textStats]]): the
  * classes involved are single ASCII bytes, which never appear inside
  * UTF-8 continuation bytes.
  */
case class TextStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"TextStats requires string, got ${dt.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("non_space", IntegerType, nullable = false),
    StructField("stop_n", IntegerType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    SketchKernels.textStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.textStats($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Per-document Gopher repetition masses over the token array — see
  * [[SketchKernels.repetitionStats]] for the arithmetic contract
  * (bit-compatible with the (doc, n, gram)-aggregate formulation the
  * d26 DuckDB oracle mirrors). */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"RepetitionStats requires array<string>, got ${dt.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("denom", LongType, nullable = false),
    StructField("top2", LongType, nullable = false),
    StructField("top3", LongType, nullable = false),
    StructField("dup5", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    SketchKernels.repetitionStats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SketchKernels.repetitionStats($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** SimHash: per bit, sum +1/-1 votes from each token's xxhash64 bit,
  * then take signs. Same bits as the HOF formulation (seed 42, bit b
  * = (h >>> b) & 1). */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"SimHash64 requires array<string>, got ${dt.simpleString}")
  }
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SketchKernels.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.simhash64($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** MinHash signature: permutation p's hash of shingle s is XXH64 with
  * seed p; the signature element is the min over shingles. */
case class MinHash64(child: Expression, numPerms: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"MinHash64 requires array<string>, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    SketchKernels.minhash64(input.asInstanceOf[ArrayData], numPerms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SketchKernels.minhash64($c, $numPerms)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Winnowing (Schleimer et al., SIGMOD'03): xxhash64 of each
  * lowercased char k-gram, minimum per sliding window of w, distinct,
  * ascending. Single O(n·w) pass per document (w is small). */
case class Winnow(child: Expression, k: Int, w: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if k < 1 => TypeCheckResult.TypeCheckFailure(
      s"Winnow requires k >= 1, got $k")
    case _ if w < 1 => TypeCheckResult.TypeCheckFailure(
      s"Winnow requires w >= 1, got $w")
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"Winnow requires string, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    SketchKernels.winnow(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SketchKernels.winnow($c, $k, $w)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** The selection phase of [[Winnow]] over an already-hashed gram
  * sequence (array<long>, positional order): min per sliding window
  * of w, distinct, ascending. */
case class WinnowSelect(child: Expression, w: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // w <= 0 would make the selection loops vacuous and silently
    // return a [Long.MaxValue] sentinel — fail at analysis like the
    // null-gram path fails at runtime
    case _ if w < 1 => TypeCheckResult.TypeCheckFailure(
      s"WinnowSelect requires w >= 1, got $w")
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"WinnowSelect requires array<long>, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    SketchKernels.winnowSelect(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SketchKernels.winnowSelect($c, $w)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Distinct word k-shingles of a token array, space-joined, in
  * first-occurrence order; inputs shorter than k words yield the
  * whole token list as one shingle. One pass, no per-window lambda
  * interpretation and no re-evaluation of the token expression. */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"WordShingles requires array<string>, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    SketchKernels.wordShingles(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SketchKernels.wordShingles($c, $k)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** ALL word k-grams of a token array, space-joined, in positional
  * order with multiplicity (the [[WordShingles]] counterpart for
  * POSITION-aware consumers: posexplode yields each gram's token
  * offset). Inputs shorter than k words emit an empty array — a
  * document without a full k-token window holds no k-token span. */
case class WordGrams(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if k < 1 => TypeCheckResult.TypeCheckFailure(
      s"WordGrams requires k >= 1, got $k")
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"WordGrams requires array<string>, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    SketchKernels.wordGrams(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SketchKernels.wordGrams($c, $k)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Engine-reproducible 60-bit SimHash (the d29 oracle-twin
  * signature): md5-hash60 of each token — integer value of md5's
  * first 15 hex chars, recomputable in any engine — voted per bit
  * with multiplicity, bit i set iff 2·ones_i >= n. Bit-identical to
  * the explode → 60-way sum aggregate formulation it replaces,
  * including null parity (a null token counts into n without
  * voting). An EMPTY token array yields NULL: every vote 2·0 >= 0
  * would pass, and the resulting all-bits-set signature would bucket
  * all empty inputs as near-identical to each other (and to any real
  * document that legitimately hashes to ~all ones). Unreachable via
  * Dedup.tokens (split never returns an empty array), but the
  * registered md5_simhash60 SQL function reaches it with array(). */
case class Md5SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"Md5SimHash60 requires array<string>, got ${dt.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) null
    else SketchKernels.md5Simhash60(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      if ($c.numElements() == 0) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.SketchKernels.md5Simhash60($c);
      }""")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** The d30 oracle-twin minhash signature in one codegen'd pass:
  * h = low 30 bits of md5Hash60(shingle), m_j = min over shingles of
  * (a_j·h + b_j) mod p — products < 2^60, exact in long, the same
  * BIGINT arithmetic the DuckDB oracle runs ([[SketchKernels.mhA]]
  * is the shared constant source). Min is order-independent, so the
  * pass is value-identical to the explode → min-aggregate
  * formulation it replaces. An EMPTY array yields Long.MaxValue
  * sentinels — callers exclude empty-shingle docs, matching the
  * aggregate form's inner-join drop. */
/** Per-document term-frequency posting entries, computed locally per
  * row — see [[SketchKernels.termCounts]] for why this beats the
  * explode→groupBy formulation at scale (the exchange it deletes
  * merges nothing). */
case class TermCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"TermCounts requires array<string>, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)

  override def nullSafeEval(input: Any): Any =
    SketchKernels.termCounts(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SketchKernels.termCounts($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Per-document positional posting entries — see
  * [[SketchKernels.termPositions]]. */
case class TermPositions(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"TermPositions requires array<string>, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("positions", ArrayType(IntegerType, containsNull = false),
      nullable = false))), containsNull = false)

  override def nullSafeEval(input: Any): Any =
    SketchKernels.termPositions(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SketchKernels.termPositions($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class Md5MinHash30(child: Expression, numPerms: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if numPerms < 1 => TypeCheckResult.TypeCheckFailure(
      s"Md5MinHash30 requires numPerms >= 1, got $numPerms")
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"Md5MinHash30 requires array<string>, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    SketchKernels.md5Minhash30(input.asInstanceOf[ArrayData], numPerms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SketchKernels.md5Minhash30($c, $numPerms)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** [[Md5MinHash30]] over PRE-HASHED shingles (array<long> of
  * md5Hash60 values) — the reband verb's signature re-derivation
  * from a dedup index's stored `_docs` sets; value-identical to the
  * string form at any numPerms (see [[SketchKernels
  * .md5Minhash30FromHashes]] for the collision argument). */
case class Md5MinHash30FromHashes(child: Expression, numPerms: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if numPerms < 1 => TypeCheckResult.TypeCheckFailure(
      s"Md5MinHash30FromHashes requires numPerms >= 1, got $numPerms")
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"Md5MinHash30FromHashes requires array<bigint>, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    SketchKernels.md5Minhash30FromHashes(input.asInstanceOf[ArrayData],
      numPerms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SketchKernels.md5Minhash30FromHashes($c, $numPerms)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Symmetric int8 quantization of a float/double vector to a FLOAT
  * array in one codegen'd pass — the exact arithmetic of
  * `Similarity.quantizeInt8`'s q column (floor-half-up against
  * max|x|/127, all-zero when the vector is all-zero), whose
  * four-HOF formulation (cast, abs-max, quantize, float-cast) was
  * the interpreted bulk of the ANN oracle twins' per-vector prep.
  * Values are integers <= 127, exact in float, so downstream
  * [[FloatVecDot]] cosines are exact integer arithmetic an external
  * engine reproduces bit-for-bit. */
case class QuantizeInt8Floats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"QuantizeInt8Floats requires array<float|double>, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  private def isDouble = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    SketchKernels.quantizeInt8Floats(input.asInstanceOf[ArrayData], isDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SketchKernels.quantizeInt8Floats($c, $isDouble)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Integer-hyperplane LSH signature (the d34 oracle-twin signature):
  * plane (p, j) component = (first md5 nibble of "p:j") − 8, dot in
  * double per plane over an integer-valued float vector, sign test
  * >= 0 sets bit p. One codegen'd pass with a per-JVM cached plane
  * matrix — the nested-HOF form re-derived the bits×dim literal
  * array per row and was the twin's dominant interpreted cost.
  * Bit-identical to the HOF form and the DuckDB oracle (all
  * arithmetic exact: products <= 127·8). */
case class Md5PlaneSig(child: Expression, bits: Int, dim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if bits < 1 || bits > 63 => TypeCheckResult.TypeCheckFailure(
      s"Md5PlaneSig requires bits in [1, 63], got $bits")
    case _ if dim < 1 => TypeCheckResult.TypeCheckFailure(
      s"Md5PlaneSig requires dim >= 1, got $dim")
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"Md5PlaneSig requires array<float>, got ${dt.simpleString}")
  }
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SketchKernels.md5PlaneSig(input.asInstanceOf[ArrayData], bits, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SketchKernels.md5PlaneSig($c, $bits, $dim)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Count of occurrences of each marker substring in `' ' + lower(text)
  * + ' '`, returned as array<int> aligned with `markers` — one pass
  * over the text per marker set instead of two length() scans plus a
  * replace() rebuild per marker (the lang-id scorer does 15 markers:
  * 30 full string scans and 15 copies per row the arithmetic way).
  * Matching is byte-wise over UTF-8, same as the SQL length/replace
  * arithmetic on ASCII markers. */
case class MarkerCounts(child: Expression, markers: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"MarkerCounts requires string, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val markerBytes: Array[Array[Byte]] =
    markers.map(m => m.getBytes("UTF-8")).toArray

  override def nullSafeEval(input: Any): Any =
    SketchKernels.markerCounts(input.asInstanceOf[UTF8String], markerBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the marker byte table rides along as a codegen reference object
    val ref = ctx.addReferenceObj("markerBytes", markerBytes, "byte[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SketchKernels.markerCounts($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Per-bucket hamming-pair enumeration: emits (id_a, id_b, hamming)
  * for every member pair with hamming <= maxDist, id_a < id_b.
  *
  * This replaces the (chunk_id, chunk_val) equi-SELF-join form of
  * simhash candidate generation: simhash bits of natural text are
  * heavily biased, so chunk values skew (at sf0.1 one 7-bit chunk
  * bucket holds 41% of all docs) and the join grinds ~Σ|bucket|²
  * rows of SMJ machinery — mostly in one task. Here the pair loop
  * runs as registers-only popcounts inside a lazy Generator, and only
  * surviving pairs ever materialize as rows. A bucket of B members
  * costs 16·B bytes collected and B²/2 popcounts; callers should
  * exact-dedup identical documents first (d1) so degenerate
  * identical-text floods collapse to one member before this stage.
  */
case class HammingPairsGen(child: Expression, maxDist: Int,
    memberCap: Int = Int.MaxValue)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fields), _)
        if fields.length == 2 && fields.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"HammingPairsGen requires array<struct<long,long>>, got ${dt.simpleString}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false),
    StructField("hamming", IntegerType, nullable = false)))

  override def supportCodegen: Boolean = false

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val value = child.eval(input)
    if (value == null) return Iterator.empty
    val arr = value.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < 2) return Iterator.empty
    val ids = new Array[Long](m)
    val sims = new Array[Long](m)
    var n = 0
    var k = 0
    while (k < m) {
      // null entries or null fields (a null id / null sketch can't
      // meaningfully pair — getLong would silently read 0)
      if (!arr.isNullAt(k)) {
        val row = arr.getStruct(k, 2)
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          ids(n) = row.getLong(0)
          sims(n) = row.getLong(1)
          n += 1
        }
      }
      k += 1
    }
    if (n < 2) return Iterator.empty
    if (n > memberCap)
      // fail loudly instead of grinding an n²/2 popcount loop in one
      // task: a bucket this size means the upstream splitting ran
      // out of discriminating bits (e.g. a flood of near-identical
      // sketches) and the caller should exact-dedup identical texts
      // first or raise the cap knowingly
      throw new org.apache.spark.SparkException(
        s"hamming bucket holds $n members, over the cap of $memberCap: " +
        "the corpus floods one sketch bucket (likely mass-duplicated " +
        "text) - exact-dedup identical documents first, or raise the cap " +
        "to accept the quadratic bucket cost")
    new Iterator[InternalRow] {
      private var i = 0
      private var j = 1
      private var nextRow: InternalRow = _
      private def advance(): Unit = {
        nextRow = null
        while (nextRow == null && i < n - 1) {
          val d = java.lang.Long.bitCount(sims(i) ^ sims(j))
          if (d <= maxDist && ids(i) != ids(j)) {
            val (a, b) =
              if (ids(i) < ids(j)) (ids(i), ids(j)) else (ids(j), ids(i))
            nextRow = new GenericInternalRow(Array[Any](a, b, d))
          }
          j += 1
          if (j >= n) { i += 1; j = i + 1 }
        }
      }
      advance()
      override def hasNext: Boolean = nextRow != null
      override def next(): InternalRow = { val r = nextRow; advance(); r }
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Jaccard of two sorted distinct long arrays via one merge pass —
  * O(|a|+|b|) with no per-element boxing (vs interpreted
  * array_intersect + array_union). */
case class JaccardSortedLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"JaccardSortedLong requires array<long>, got ${l.simpleString} / ${r.simpleString}")
    }
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    SketchKernels.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (l, r) => s"graft.functions.SketchKernels.jaccardSorted($l, $r)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}
