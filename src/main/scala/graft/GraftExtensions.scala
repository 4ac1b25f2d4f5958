package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** SparkSessionExtensions registering the native expressions as SQL
  * functions, so the whole surface — including the sketches — is
  * reachable from `spark.sql` exactly like the DataFrame API:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)...
  * spark.sql("SELECT simhash64(split(text, ' ')) FROM docs")
  * }}}
  *
  * Also usable via `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(e: SparkSessionExtensions): Unit = {
    // bounded range theta-joins → 2-bucket equi-joins, transparently
    e.injectOptimizerRule(_ => graft.plans.BoundedRangeJoinRewrite)
    e.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(array<string>) - 64-bit SimHash of tokens"),
      (args: Seq[Expression]) => SimHash64(args.head)))
    e.injectFunction((FunctionIdentifier("minhash64"),
      info("minhash64", "minhash64(array<string>, numPerms) - MinHash signature"),
      (args: Seq[Expression]) => MinHash64(args.head,
        args(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((FunctionIdentifier("winnow"),
      info("winnow", "winnow(text, k, w) - winnowing fingerprints"),
      (args: Seq[Expression]) => Winnow(args.head,
        args(1).eval().asInstanceOf[Number].intValue(),
        args(2).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((FunctionIdentifier("winnow_select"),
      info("winnow_select", "winnow_select(array<long>, w) - winnowing selection over gram hashes"),
      (args: Seq[Expression]) => WinnowSelect(args.head,
        args(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((FunctionIdentifier("jaccard_sorted"),
      info("jaccard_sorted", "jaccard_sorted(array<long>, array<long>) - Jaccard of sorted sets"),
      (args: Seq[Expression]) => JaccardSortedLong(args.head, args(1))))
    e.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(array<float>, array<float>) - double dot product"),
      (args: Seq[Expression]) => FloatVecDot(args.head, args(1))))
    e.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(array<string>, k) - distinct word k-shingles"),
      (args: Seq[Expression]) => WordShingles(args.head,
        args(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((FunctionIdentifier("word_grams"),
      info("word_grams", "word_grams(array<string>, k) - all word k-grams in positional order"),
      (args: Seq[Expression]) => WordGrams(args.head,
        args(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((FunctionIdentifier("md5_simhash60"),
      info("md5_simhash60", "md5_simhash60(array<string>) - engine-reproducible 60-bit simhash"),
      (args: Seq[Expression]) => Md5SimHash60(args.head)))
    e.injectFunction((FunctionIdentifier("md5_minhash30"),
      info("md5_minhash30", "md5_minhash30(array<string>, numPerms) - engine-reproducible minhash signature"),
      (args: Seq[Expression]) => Md5MinHash30(args.head,
        args(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((FunctionIdentifier("quantize_int8f"),
      info("quantize_int8f", "quantize_int8f(array<float|double>) - symmetric int8 quantization as floats"),
      (args: Seq[Expression]) => QuantizeInt8Floats(args.head)))
    e.injectFunction((FunctionIdentifier("pq_adc"),
      info("pq_adc", "pq_adc(array<int> codes, array<array<double>> lut) - product-quantization asymmetric-distance score"),
      (args: Seq[Expression]) => PqAdc(args.head, args(1))))
    e.injectFunction((FunctionIdentifier("md5_plane_sig"),
      info("md5_plane_sig", "md5_plane_sig(array<float>, bits, dim) - integer-hyperplane LSH signature"),
      (args: Seq[Expression]) => Md5PlaneSig(args.head,
        args(1).eval().asInstanceOf[Number].intValue(),
        args(2).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((FunctionIdentifier("marker_counts"),
      info("marker_counts", "marker_counts(text, marker...) - occurrence count per marker"),
      (args: Seq[Expression]) => MarkerCounts(args.head,
        args.tail.map(_.eval().toString))))
    e.injectFunction((FunctionIdentifier("text_stats"),
      info("text_stats", "text_stats(text) - struct(n_words, non_space, stop_n)"),
      (args: Seq[Expression]) => TextStats(args.head)))
    e.injectFunction((FunctionIdentifier("block_cos_pairs"),
      info("block_cos_pairs",
        "block_cos_pairs(blockA, blockB, sameBlock, threshold) - above-threshold cosine pairs of two vector blocks"),
      (args: Seq[Expression]) => BlockCosPairs(args.head, args(1), args(2),
        toDouble(args(3).eval()))))
    e.injectFunction((FunctionIdentifier("block_top_k"),
      info("block_top_k",
        "block_top_k(corpusBlock, queryBlock, k) - per-query block-local cosine top-k"),
      (args: Seq[Expression]) => BlockTopK(args.head, args(1),
        args(2).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((FunctionIdentifier("hamming_pairs"),
      info("hamming_pairs",
        "hamming_pairs(members, maxDist) - generator of (id_a, id_b, hamming) pairs within a bucket"),
      (args: Seq[Expression]) => HammingPairsGen(args.head,
        args(1).eval().asInstanceOf[Number].intValue())))
  }
}

object GraftExtensions {
  /** SQL numeric literals arrive as Decimal, not java.lang.Number. */
  private[graft] def toDouble(v: Any): Double = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: Number => n.doubleValue()
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** Register the same functions as session-scoped temp functions on
    * an already-created session (extensions can only be injected at
    * build time; this covers notebooks / shared sessions). */
  def registerTemp(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("simhash64",
      (args: Seq[Expression]) => SimHash64(args.head), "scala_udf")
    reg.createOrReplaceTempFunction("minhash64",
      (args: Seq[Expression]) => MinHash64(args.head,
        args(1).eval().asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("winnow",
      (args: Seq[Expression]) => Winnow(args.head,
        args(1).eval().asInstanceOf[Number].intValue(),
        args(2).eval().asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("winnow_select",
      (args: Seq[Expression]) => WinnowSelect(args.head,
        args(1).eval().asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("jaccard_sorted",
      (args: Seq[Expression]) => JaccardSortedLong(args.head, args(1)), "scala_udf")
    reg.createOrReplaceTempFunction("vec_dot",
      (args: Seq[Expression]) => FloatVecDot(args.head, args(1)), "scala_udf")
    reg.createOrReplaceTempFunction("word_shingles",
      (args: Seq[Expression]) => WordShingles(args.head,
        args(1).eval().asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("word_grams",
      (args: Seq[Expression]) => WordGrams(args.head,
        args(1).eval().asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("md5_simhash60",
      (args: Seq[Expression]) => Md5SimHash60(args.head), "scala_udf")
    reg.createOrReplaceTempFunction("md5_minhash30",
      (args: Seq[Expression]) => Md5MinHash30(args.head,
        args(1).eval().asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("quantize_int8f",
      (args: Seq[Expression]) => QuantizeInt8Floats(args.head), "scala_udf")
    reg.createOrReplaceTempFunction("md5_plane_sig",
      (args: Seq[Expression]) => Md5PlaneSig(args.head,
        args(1).eval().asInstanceOf[Number].intValue(),
        args(2).eval().asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("marker_counts",
      (args: Seq[Expression]) => MarkerCounts(args.head,
        args.tail.map(_.eval().toString)), "scala_udf")
    reg.createOrReplaceTempFunction("text_stats",
      (args: Seq[Expression]) => TextStats(args.head), "scala_udf")
    reg.createOrReplaceTempFunction("block_cos_pairs",
      (args: Seq[Expression]) => BlockCosPairs(args.head, args(1), args(2),
        toDouble(args(3).eval())), "scala_udf")
    reg.createOrReplaceTempFunction("block_top_k",
      (args: Seq[Expression]) => BlockTopK(args.head, args(1),
        args(2).eval().asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("hamming_pairs",
      (args: Seq[Expression]) => HammingPairsGen(args.head,
        args(1).eval().asInstanceOf[Number].intValue()), "scala_udf")
  }
}
