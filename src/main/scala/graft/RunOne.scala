package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: time individual registry queries outside the full
  * Bench loop (`runMain graft.RunOne <sfDir> <name> [name...]`).
  * Repeat a name to separate cold-JIT from steady-state. Not part of
  * the driver contract. */
object RunOne {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: RunOne <sfDir> <queryName|explain:queryName> [more...]")
      return
    }
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { name =>
      val t0 = System.nanoTime()
      try {
        if (name.startsWith("explain:")) {
          val df = SparkEntry.queries(name.stripPrefix("explain:"))(spark, args(0))
          df.count() // materialize so AQE finalizes the plan
          println(s"[runone] === $name  ${(System.nanoTime() - t0) / 1e9}s ===")
          df.explain("formatted")
        } else {
          val n = SparkEntry.queries(name)(spark, args(0)).count()
          println(s"[runone] $name rows=$n  ${(System.nanoTime() - t0) / 1e9}s")
        }
      } catch { case e: Throwable =>
        println(s"[runone] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
