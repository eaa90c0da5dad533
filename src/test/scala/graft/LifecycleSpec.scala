package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SeriesOps
import graft.streaming.{Ingest, Maintenance}
import graft.streaming.Maintenance.Tier

/** Full engine lifecycle: streaming ingest → multi-tier maintenance →
  * multi-resolution reconciled read. Exercises every module seam with a
  * store whose history really does live at two resolutions. */
class LifecycleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("ingest -> maintain -> reconciled read round-trips") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft-lc-src").toString
    val sink = Files.createTempDirectory("graft-lc-sink").toString
    val ckpt = Files.createTempDirectory("graft-lc-ckpt").toString

    // 48 hourly points for one metric, unaligned (+17s) timestamps
    val step = 3600L
    val raw: Seq[(String, Long, Option[Double])] =
      (0 until 48).map(h => ("m", h * 3600L + 17L, Some(h.toDouble)))
    raw.toDF("metric", "ts", "value").write.parquet(s"$src/drop1")
    Ingest.stream(spark, src, sink, ckpt, step, availableNow = true)
      .awaitTermination()

    // maintenance at now = 48h with tiers [1h x 12, 1d x 30]:
    // fine band = [36h, 48h); hours 0..35 roll into day buckets
    val meta = Seq(("m", step, "sum", 0.0))
      .toDF("metric", "timeStep", "aggregationMethod", "xFilesFactor")
    val maintained = Maintenance.maintain(
      Ingest.storeView(spark, sink), meta, 48L * 3600L,
      Seq(Tier(3600L, 12L), Tier(86400L, 30L)))

    val bySteps = maintained.groupBy("step").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bySteps === Map(3600L -> 12L, 86400L -> 2L))

    // sum conservation through the rollup (xff = 0, method = sum)
    val total = maintained.agg(sum("value")).head.getDouble(0)
    assert(total === (0 until 48).map(_.toDouble).sum)

    // reconciled read over the FULL range: mixed steps aggregate onto the
    // coarsest (86400); method 'sum' per metadata
    val read = SeriesOps.reconcileToCoarsest(
      maintained.where(col("ts") >= 0L && col("ts") < 48L * 3600L),
      meta, anchor = 0L)
      .orderBy("ts").collect()
      .map(r => (r.getLong(2), r.getDouble(3)))
    assert(read.toSeq === Seq(
      (0L, (0 until 24).map(_.toDouble).sum),       // day 0 (rolled + none)
      (86400L, (24 until 48).map(_.toDouble).sum))) // day 1 (rolled day + fine tail)

    // a read inside the fine band alone sees hourly resolution
    val fineRead = SeriesOps.reconcileToCoarsest(
      maintained.where(col("ts") >= 36L * 3600L && col("ts") < 48L * 3600L),
      meta, anchor = 36L * 3600L)
      .orderBy("ts").collect()
      .map(r => (r.getLong(2), r.getDouble(3)))
    assert(fineRead.toSeq ===
      (36 until 48).map(h => (h * 3600L, h.toDouble)))
  }

  test("stream and batch writers share one store layout (mixed-writer read)") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft-mix-src").toString
    val sink = Files.createTempDirectory("graft-mix-sink").toString
    val ckpt = Files.createTempDirectory("graft-mix-ckpt").toString
    val metaDir = Files.createTempDirectory("graft-mix-meta").toString + "/meta"

    // leg 1: STREAM-ingest two hourly points (writes metric= partitions)
    val raw: Seq[(String, Long, Option[Double])] =
      Seq(("m", 17L, Some(1.0)), ("m", 3600L + 17L, Some(2.0)))
    raw.toDF("metric", "ts", "value").write.parquet(s"$src/drop1")
    Ingest.stream(spark, src, sink, ckpt, availableNow = true)
      .awaitTermination()

    // leg 2: BATCH-append through Engine.store into the SAME directory —
    // before the layout fix this mixed root-level files with metric=
    // partition dirs and the subsequent read failed partition discovery
    val eng = Engine.openStore(spark, sink, metaDir)
    eng.createNode("m", 3600L, "sum", 0.0)
    eng.store(Seq(("m", 2 * 3600L + 17L, Some(3.0)))
      .toDF("metric", "ts", "value"))

    val got = eng.fetchSparse("m", 0L, 3 * 3600L).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got === Set((0L, 1.0), (3600L, 2.0), (7200L, 3.0)))
  }
}
