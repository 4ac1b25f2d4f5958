package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Profiling scratch main (contents change per investigation). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.SketchFunctions
    import spark.implicits._

    val docs = Seq((1L, "the quick brown fox the lazy dog"),
      (2L, "another document with the words")).toDF("doc_id", "text")
    val q = docs.select(
      SketchFunctions.textStats(col("text")).as("st"),
      SketchFunctions.simhash64(split(col("text"), " ")).as("sim"),
      SketchFunctions.minhash64(split(col("text"), " "), 8).as("mh"),
      SketchFunctions.winnow(col("text"), 5, 4).as("wn"),
      SketchFunctions.wordShingles(split(col("text"), " "), 3).as("sh"),
      SketchFunctions.markerCounts(col("text"), Seq(" the ", " dog ")).as("mc"))
      .select(col("st"), col("sim"), col("mh"), col("wn"), col("mc"),
        SketchFunctions.jaccardSorted(
          sort_array(array_distinct(transform(col("sh"), s => xxhash64(s)))),
          sort_array(array_distinct(transform(col("sh"), s => xxhash64(s))))).as("jac"))

    val gen = org.apache.spark.sql.execution.debug.codegenString(
      q.queryExecution.executedPlan)
    val hasFallback = gen.contains("CodegenFallback")
    val stages = "WholeStageCodegen".r.findAllIn(gen).length
    println(s"[scratch] codegen stages=$stages fallback=$hasFallback")
    // force execution so a Janino failure would surface as the
    // fallback-with-warning path
    q.collect().foreach(r => assert(r != null))
    println("[scratch] executed OK; sample=" + q.head())
    spark.stop()
  }
}
