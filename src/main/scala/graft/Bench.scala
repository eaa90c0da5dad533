package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at the given SF.
  *
  * Protocol: TWO untimed warmup passes over the whole suite (codegen
  * compilation + JIT + session caches / once-per-JVM index builds), then
  * THREE timed executions per query reported as their MEDIAN — so
  * round-over-round deltas reflect the PLAN, not first-run JIT or one
  * noisy execution on a shared host. Failures surface as value -1, never
  * as a silently-timed exception. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // the suite generates >100 codegen'd stages; the default cache
      // (spark.sql.codegen.cache.maxEntries=100) evicts and recompiles
      // every stage on every pass, dominating the timed runs
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.Catalog.configureSession(spark)
    spark.sparkContext.setLogLevel("WARN")
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
    // two untimed warmup passes: the first populates session caches and
    // triggers codegen compilation, the second lets the JIT's optimizing
    // compiler reach the generated loops (heavy codegen queries run ~2x
    // faster on their third execution) — timed numbers then reflect the
    // PLAN, not compilation
    (1 to 2).foreach { _ =>
      queries.foreach { case (_, fn) =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
      }
    }
    // deterministic SHARED-CACHE re-warm (r17, VERDICT r16 "what's
    // wrong" #2): the shingle/word-count/LSH-sim/label feature caches
    // are built lazily by whichever query touches them first, so if a
    // cached block is evicted between the warmup and timed passes the
    // ~2 s rebuild lands INSIDE one arbitrary query's timed window
    // (driver r16: split_leakage 2.87 s vs the round record's 0.31 s,
    // same plan). Touching one pinned consumer per shared cache right
    // before timing moves any rebuild outside every timed window —
    // per-query numbers stay attributable to their own plans regardless
    // of execution order. Documented in BENCH_NOTES.md.
    // r19: + span_dedup_apply, the pinned consumer of the new shared
    // span_grams (13-gram) feature cache — same one-consumer-per-cache
    // contract as the eight r17 pins
    Seq("shingle_df_hist", "span_dup_stats", "top_terms", "embed_neardup",
        "dedup_clusters", "bpe_apply", "dedup_jaccard", "split_leakage",
        "span_dedup_apply")
      .foreach { name =>
        SparkEntry.queries.get(name).foreach { fn =>
          try fn(spark, sfDir).count() catch { case _: Throwable => () }
        }
      }
    // timed: median of three consecutive executions per query. Single-shot
    // numbers on a shared host swing ±40% run-to-run (scheduler/IO noise);
    // the median keeps one slow outlier execution from reading as a plan
    // regression while never hiding a real one (a genuinely slower plan is
    // slower in all three)
    def medianOf3(run: () => Unit): Double = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { run(); true } catch { case _: Throwable => false }
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      if (times.contains(-1.0)) -1.0 else times.sorted.apply(1)
    }
    // HOST-BAND CALIBRATION (BASELINE.md "Bench budget"): a fixed
    // pinned query — one lineitem scan + 4-key rollup — timed under the
    // identical protocol before the suite. Its round-over-round ratio
    // measures the shared host's speed band, so "this round's total is
    // +X% but calibration is +X% too" becomes a read, not a guess.
    // NEVER change this query: its value lies in being constant.
    def calibrationRun(): Unit = {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(sum("l_quantity"), avg("l_extendedprice"), count(lit(1)))
        .count()
    }
    (1 to 2).foreach(_ => try calibrationRun() catch { case _: Throwable => () })
    val calibration = medianOf3(() => calibrationRun())
    val results = queries.map { case (name, fn) =>
      name -> medianOf3(() => { fn(spark, sfDir).count(); () })
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failures are reported explicitly so a crashing query can never make
    // the headline total look like a speedup
    val failures = results.count(_._2 < 0)
    val ok = results.map(_._2).filter(_ >= 0)
    val total = ok.sum
    // per-query median across the suite: the number the BASELINE.md
    // bench budget is stated in (the surface grew 13x past r1, so totals
    // track registry size, not plan quality)
    val med = if (ok.isEmpty) -1.0
      else ok.sorted.apply(ok.size / 2)
    val fullLine = s"""{"metric":"total","value":$total,"unit":"sec","failures":$failures,"n_queries":${results.size},"median_sec":$med,"calibration_sec":$calibration,"queries":$qs,"sf":"$sfDir"}"""
    println(fullLine)
    // r19 (VERDICT r18 item 2), ADDITIONS ONLY — the contracted full line
    // above is unchanged and still printed first. With ~373 queries that
    // line is ~25 KB, which outgrew the driver's tail capture in r18 and
    // left PERF_r18 with no bench comparison at all. Two recovery paths:
    //  1. a SHORT summary line (totals/median/calibration/failures — no
    //     per-query map) printed AFTER the full line, so a bounded tail
    //     capture always contains one parseable JSON line;
    //  2. the full JSON written to a stable file path the driver (and the
    //     next round's builder) can read for the per-query comparison.
    try {
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get("benchruns"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("benchruns/last_bench.json"),
        fullLine + "\n")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write benchruns/last_bench.json: ${e.getMessage}")
    }
    println(s"""{"metric":"total","value":$total,"unit":"sec","failures":$failures,"n_queries":${results.size},"median_sec":$med,"calibration_sec":$calibration,"full_results":"benchruns/last_bench.json","sf":"$sfDir"}""")
    spark.stop()
  }
}
