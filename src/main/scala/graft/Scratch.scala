package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Overlap-semantics probe for MarkerCounts (scratch main). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.functions.SketchFunctions
    val rows = Seq("a a a a", "the the the", " aa a  a ", "")
      .zipWithIndex.map { case (t, i) => (i, t) }
    rows.toDF("i", "t")
      .select(col("i"), col("t"),
        element_at(SketchFunctions.markerCounts(col("t"), Seq(" a ")), 1).as("c"))
      .collect()
      .sortBy(_.getInt(0))
      .foreach(r => println(s"[probe] ${r.getInt(0)} ${"\"" + r.getString(1) + "\""} -> ${r.getInt(2)}"))
    spark.stop()
  }
}
