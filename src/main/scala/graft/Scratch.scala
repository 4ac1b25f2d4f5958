package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** WordShingles edge probe (scratch main). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.operators.Dedup

    val df = Seq(
      (1L, ""),                       // empty text
      (2L, "one two"),                // fewer than k words
      (3L, "a b a b a b"),            // duplicate shingles collapse
      (4L, "ünï códe wörds here now") // unicode
    ).toDF("doc_id", "text")
    Dedup.withShingles(df, "text", k = 3).collect()
      .sortBy(_.getLong(0))
      .foreach(r => println(s"[probe] ${r.getLong(0)} -> ${r.getSeq[String](2).map(s => s"<$s>").toList} n=${r.getSeq[String](2).size}"))
    spark.stop()
  }
}
