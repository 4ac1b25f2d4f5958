package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Edge-case probe for the sketch expressions (scratch main). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.functions.SketchFunctions._
    import graft.operators.Dedup

    // winnow: empty text, 1-char text, unicode, long ascii
    Seq((1L, ""), (2L, "a"), (3L, "héllo wörld ünïcode tëxt here we go"),
      (4L, "x" * 500))
      .toDF("id", "t")
      .select(col("id"), size(winnow(col("t"), 8, 4)).as("n_fp"))
      .show()

    // jaccard: empty vs empty (0/0 guard), disjoint, identical
    Seq(
      (1L, Seq.empty[Long], Seq.empty[Long]),
      (2L, Seq(1L, 2L), Seq(3L, 4L)),
      (3L, Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      (4L, Seq(1L, 2L, 3L, 4L), Seq(3L, 4L, 5L))
    ).toDF("id", "a", "b")
      .select(col("id"), jaccardSorted(col("a"), col("b")).as("j"))
      .show()

    // simhash/minhash on empty token arrays
    Seq((1L, Seq.empty[String]), (2L, Seq("hello", "world")))
      .toDF("id", "toks")
      .select(col("id"), simhash64(col("toks")).as("sim"),
        size(minhash64(col("toks"), 8)).as("n_sig"))
      .show()

    // type rejection
    try {
      Seq((1L, Seq(1, 2))).toDF("id", "a")
        .select(simhash64(col("a"))).collect()
      println("PROBE-FAIL: int array accepted")
    } catch {
      case e: Exception =>
        println("typecheck: " + e.getMessage.linesIterator.next())
    }

    // dedup end-to-end on a unicode + duplicate corpus
    val docs = Seq(
      (0L, "héllo wörld this is ä ünïcode document with enough words to shingle"),
      (1L, "héllo wörld this is ä ünïcode document with enough words to shinglé"),
      (2L, "completely unrelated engineering text about distributed query engines")
    ).toDF("doc_id", "text")
    Dedup.minhashPairs(docs, "doc_id", "text", numPerms = 32, bands = 16,
      threshold = 0.5).show()
    spark.stop()
  }
}
