package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev profiler (NOT part of the driver contract): runs one registry
  * entry under the Bench session shape and prints a per-Spark-job
  * timeline for the steady-state run — job wall ms, description, and
  * the DRIVER-SIDE GAP since the previous job ended (catalog DDL,
  * lease/FS ops, planning). Usage:
  *   sbt "runMain graft.ProfileOne <sfDir> <name> [name...]"
  */
object ProfileOne {
  final case class JobRec(id: Int, desc: String, t0: Long, var t1: Long = -1L)

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (record) jobs.synchronized {
          val d = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(js.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))))
            .getOrElse("?")
          jobs(js.jobId) = JobRec(js.jobId, d, js.time)
        }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        if (record) jobs.synchronized {
          jobs.get(je.jobId).foreach(_.t1 = je.time)
        }
    })

    // bench-style warm-up so JIT/footers are paid before measurement
    try SparkEntry.queries("b2_agg")(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    catch { case e: Throwable => System.err.println(s"warmup: ${e.getMessage}") }

    args.tail.foreach { name =>
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once() // one-time side effects + JIT
      jobs.clear(); record = true
      val w0 = System.currentTimeMillis()
      val steady = once()
      val w1 = System.currentTimeMillis()
      record = false
      val recs = jobs.synchronized(jobs.values.toSeq.sortBy(_.t0))
      println(f"\n=== $name cold=$cold%.2fs steady=$steady%.2fs (${recs.size} jobs) ===")
      var prevEnd = w0
      var jobMs = 0L
      var gapMs = 0L
      recs.foreach { r =>
        val dur = if (r.t1 > 0) r.t1 - r.t0 else -1
        val gap = r.t0 - prevEnd
        jobMs += math.max(dur, 0)
        gapMs += math.max(gap, 0)
        println(f"  job ${r.id}%4d  gap=${gap}%5d ms  dur=${dur}%6d ms  ${r.desc.take(110)}")
        prevEnd = if (r.t1 > 0) r.t1 else r.t0
      }
      val tail = w1 - prevEnd
      println(f"  [sum] jobs=${jobMs} ms  driver-gaps=${gapMs + math.max(tail, 0)} ms  wall=${w1 - w0} ms")
    }
    spark.stop()
  }
}
