package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Profiling scratch main (contents change per investigation).
  * Current: localize d94's 54× sf1 reading — time each sub-plan of
  * lineDedup over the sf1 corpus with the d94 entry's wrap. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup

    val w = 8
    val ws = split(trim(col("text")), "\\s+")
    val nl = ceil(size(ws) / lit(w.toDouble)).cast("int")
    val docs = spark.read.parquet("/root/repo/tmp/sf1/documents.parquet")
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"),
        array_join(transform(sequence(lit(1), nl), i =>
          array_join(slice(ws, (i - 1) * lit(w) + 1, lit(w)), " ")), "\n")
          .as("text"))

    @volatile var maxTaskMs = 0L
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskInfo != null)
          maxTaskMs = math.max(maxTaskMs, e.taskInfo.duration)
    }
    spark.sparkContext.addSparkListener(listener)
    def time(label: String)(mk: () => DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      once(); maxTaskMs = 0L
      val t = once()
      println(f"$label%-34s ${t}%7.2f s   maxTask ${maxTaskMs} ms")
    }

    val lines = docs
      .select(col("doc_id"), posexplode(split(col("text"), "\n", -1)))
      .select(col("doc_id"), (col("pos") + 1).as("pos"),
        Dedup.md5Hash60(trim(lower(col("col")))).as("h"),
        (length(trim(col("col"))) > 0).as("__nb"))
    def pairs() = lines.filter(col("__nb"))
      .groupBy(col("h"), col("doc_id"))
      .agg(min(col("pos")).as("__mnpos"))
      .repartition(col("h"))
    def keeper() = pairs().groupBy(col("h"))
      .agg(count(lit(1)).as("__nd"),
        min(col("doc_id")).as("__mn"),
        min_by(col("__mnpos"), col("doc_id")).as("__kpos"))
      .filter(col("__nd") >= 2)
      .select(col("h").as("__dh"), col("__mn"), col("__kpos"))
    def hits() = pairs()
      .join(keeper().hint("SHUFFLE_HASH"), col("h") === col("__dh"))
      .select(col("doc_id"),
        struct(col("h").as("h"),
          when(col("doc_id") === col("__mn"),
            coalesce(col("__kpos"), col("__mnpos"))).as("k")).as("__e"))
    def rm() = hits().groupBy(col("doc_id"))
      .agg(collect_list(col("__e")).as("__rm"))

    println("[counts] docs=" + docs.count())
    println("[counts] lines=" + lines.count())
    println("[counts] pairs=" + pairs().count())
    println("[counts] keeper=" + keeper().count())
    println("[counts] hits=" + hits().count())
    time("lines")(() => lines)
    time("pairs")(() => pairs())
    time("keeper")(() => keeper())
    time("hits")(() => hits())
    time("rm")(() => rm())
    time("full lineDedup")(() =>
      Dedup.lineDedup(docs, "doc_id", "text", minDocs = 2))
    spark.stop()
  }
}
