package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Profiling scratch main (contents change per investigation). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    import graft.operators.Similarity
    val q8 = graft.sources.Tables.embeddings(spark, d)
      .select(col("vec_id"),
        graft.functions.SketchFunctions.quantizeInt8Floats(
          col("embedding")).as("qv"))
    q8.write.mode("overwrite").format("noop").save()

    // (a) current operator
    def current() = Similarity.md5PqTopK(q8.filter(col("vec_id") < 50), q8,
      "vec_id", "qv", k = 10, m = 4, ksub = 8)
    t("a current warm1") { current().write.mode("overwrite").format("noop").save() }
    t("a current warm2") { current().write.mode("overwrite").format("noop").save() }

    // (b) how much is the ENCODE alone, materialized once?
    //     time the pure projection over the corpus
    val probe = q8.selectExpr("vec_id", "qv") // stand-in; encode is private
    t("b corpus quantize scan") { probe.write.mode("overwrite").format("noop").save() }
    spark.stop()
  }
}
