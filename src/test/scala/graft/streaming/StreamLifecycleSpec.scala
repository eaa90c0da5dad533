package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.Catalog
import graft.operators.SeriesOps

/** The full write→maintain→read loop, end to end: file-source streaming
  * ingest in two drops WITH a restart-from-checkpoint leg, the
  * Maintenance CLI entry point (`main`) over the ingested store, and read
  * parity of the maintained store against the batch path — the streaming
  * pipeline must land byte-identical state to batch compaction. */
class StreamLifecycleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").toString

  private val Dir = "/root/testdata/sf0.01"

  test("stream ingest (2 drops + checkpoint restart) -> Maintenance.main -> read parity") {
    val src = tmp("e2e-src"); val sink = tmp("e2e-sink")
    val ckpt = tmp("e2e-ckpt"); val dest = tmp("e2e-dest")
    val sec = expr("ts div 1000000000")
    val raw = Catalog.events(spark, Dir)
      .select(concat(lit("events."), col("event_type")).as("metric"),
        sec.as("ts"), col("value"))
    val mid = 1705276800L // 2024-01-15: splits the month into two drops

    raw.where(col("ts") < mid).write.parquet(s"$src/drop1")
    Ingest.stream(spark, src, sink, ckpt, availableNow = true)
      .awaitTermination()
    raw.where(col("ts") >= mid).write.parquet(s"$src/drop2")
    // a NEW query instance on the SAME checkpoint: the restart leg
    Ingest.stream(spark, src, sink, ckpt, availableNow = true)
      .awaitTermination()

    // the restart resumed from the checkpoint instead of re-ingesting
    // drop1: the sink holds exactly one compacted append per drop
    val c1 = Ingest.compactBatch(raw.where(col("ts") < mid), 3600L).count()
    val c2 = Ingest.compactBatch(raw.where(col("ts") >= mid), 3600L).count()
    assert(spark.read.parquet(sink).count() === c1 + c2)

    // streamed store == batch compaction of the same events
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    val got = Ingest.storeView(spark, sink)
      .select("metric", "step", "ts", "value").collect().map(key).toSet
    val expect = Catalog.pointsCached(spark, Dir)
      .select("metric", "step", "ts", "value").collect().map(key).toSet
    assert(got === expect)

    // maintenance through the CLI entry point (arg parsing included);
    // the active test session is reused and must survive the call
    val now = Catalog.pointsCached(spark, Dir)
      .agg(max("ts")).head().getLong(0) + 3600L
    Maintenance.main(Array(sink, dest, now.toString))
    assert(!spark.sparkContext.isStopped,
      "Maintenance.main must not stop a session it did not create")

    // CLI result == the batch maintenance model over the batch store
    val meta = Catalog.metricsMeta(spark)
    val model = Maintenance.maintain(Catalog.pointsCached(spark, Dir), meta,
      now, Maintenance.tiersFromMeta(meta))
      .collect().map(key).toSet
    val maintained = spark.read.parquet(dest)
      .select("metric", "step", "ts", "value").collect().map(key).toSet
    assert(maintained === model)

    // read parity: the dense grid off the maintained streamed store equals
    // Engine.fetch over the harness catalog (the read window sits inside
    // the fine retention band, so maintenance must not have touched it)
    def grid(r: org.apache.spark.sql.Row) =
      (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    val viaEngine = graft.Engine.open(spark, Dir)
      .fetch("events.purchase", SeriesOps.From, SeriesOps.Until)
      .collect().map(grid).toSeq
    val viaStream = SeriesOps.densifyGridFrom(spark.read.parquet(dest), meta,
      "events.purchase", SeriesOps.From, SeriesOps.Until)
      .collect().map(grid).toSeq
    assert(viaStream === viaEngine)
  }

  test("Maintenance CLI arg parsing: arity and numeric now are enforced") {
    assert(Maintenance.parseArgs(Array("a", "b", "123")) ===
      Some(("a", "b", 123L)))
    assert(Maintenance.parseArgs(Array("a", "b")) === None)
    assert(Maintenance.parseArgs(Array("a", "b", "not-a-ts")) === None)
    assert(Maintenance.parseArgs(Array()) === None)
  }
}
