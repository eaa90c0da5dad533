package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer for plan iteration:
  * `runMain graft.Timeit <sfDir> <query> [query ...]` — warms each query
  * once, then times 3 runs (min reported). Not part of the driver
  * contract; Bench remains the canonical benchmark. */
object Timeit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // match Bench's session (default cache of 100 thrashes on this suite)
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "2000"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.Catalog.configureSession(spark)
    spark.sparkContext.setLogLevel("WARN")
    // job/stage/task counters per timed run (guide §1: know where the
    // time goes — a query that is 6 sequential tiny jobs is bounded by
    // scheduling, not data, and that is a different fix)
    val nJobs = new java.util.concurrent.atomic.AtomicLong
    val nStages = new java.util.concurrent.atomic.AtomicLong
    val nTasks = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          nJobs.incrementAndGet()
          nStages.addAndGet(j.stageInfos.size)
          nTasks.addAndGet(j.stageInfos.map(_.numTasks.toLong).sum)
        }
      })
    // optionally run the whole suite between warmup and timing, to
    // reproduce Bench's interleaved execution profile
    val interleave = sys.env.get("SPARK_GRAFT_INTERLEAVE").contains("1")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count()
      if (interleave)
        SparkEntry.queries.values.foreach(f =>
          try f(spark, sfDir).count() catch { case _: Throwable => () })
      // listener events are delivered asynchronously: settle the bus
      // before sampling either endpoint of the delta (r18 ADVICE —
      // listenerBus.waitUntilEmpty is private[spark], so a bounded
      // settle loop: sample until two consecutive reads agree), and
      // derive the divisor from the shared runs constant
      def drained[A](sample: => A): A = {
        var prev = (nJobs.get, nStages.get, nTasks.get)
        var tries = 0
        while (tries < 50) {
          Thread.sleep(20)
          val cur = (nJobs.get, nStages.get, nTasks.get)
          if (cur == prev) tries = 50 else { prev = cur; tries += 1 }
        }
        sample
      }
      val runs = 3
      val (j0, s0, k0) = drained((nJobs.get, nStages.get, nTasks.get))
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val (j, s, k) = drained(
        ((nJobs.get - j0) / runs.toDouble, (nStages.get - s0) / runs.toDouble,
          (nTasks.get - k0) / runs.toDouble))
      println(f"[timeit] $name%-28s min=${times.min}%.3f all=${times.map(t => f"$t%.3f").mkString(",")} jobs=$j%.1f stages=$s%.1f tasks=$k%.0f")
    }
    spark.stop()
  }
}
