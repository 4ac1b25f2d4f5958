package graft

/** Profiling scratch main (contents change per investigation). */
object Scratch {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/scratch_wh_" + System.nanoTime())
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val q8 = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"),
        graft.functions.SketchFunctions.quantizeInt8Floats(col("embedding")).as("qv"))
    graft.operators.Similarity.buildAnnIndex(q8, "vec_id", "qv",
      name = "s_idx", nlist = 8, m = 4, ksub = 8, md5Sig = true, numBuckets = 4)
    println("[scratch] base count = " + spark.table("s_idx_vectors").count())
    val twin = q8.filter(col("vec_id") === 0).collect().head.getSeq[Float](1)
    val batch = Seq((200000L, twin), (200001L, twin.map(-_))).toDF("vec_id", "qv")
    println("[scratch] batch schema: " + batch.schema)
    println("[scratch] index schema: " + spark.table("s_idx_vectors").schema)
    graft.operators.Similarity.appendToAnnIndex(batch, "vec_id", "qv", "s_idx")
    println("[scratch] after append count = " + spark.table("s_idx_vectors").count())
    spark.stop()
  }
}
