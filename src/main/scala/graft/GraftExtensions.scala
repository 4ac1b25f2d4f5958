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
    e.injectFunction((FunctionIdentifier("jaccard_sorted"),
      info("jaccard_sorted", "jaccard_sorted(array<long>, array<long>) - Jaccard of sorted sets"),
      (args: Seq[Expression]) => JaccardSortedLong(args.head, args(1))))
    e.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(array<float>, array<float>) - double dot product"),
      (args: Seq[Expression]) => FloatVecDot(args.head, args(1))))
  }
}

object GraftExtensions {
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
    reg.createOrReplaceTempFunction("jaccard_sorted",
      (args: Seq[Expression]) => JaccardSortedLong(args.head, args(1)), "scala_udf")
    reg.createOrReplaceTempFunction("vec_dot",
      (args: Seq[Expression]) => FloatVecDot(args.head, args(1)), "scala_udf")
  }
}
