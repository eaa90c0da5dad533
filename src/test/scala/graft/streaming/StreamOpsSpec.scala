package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Watermarked windowed aggregation + flatMapGroupsWithState sessions. */
class StreamOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").toString

  test("streaming quality gate == batch score gate on the same docs") {
    import spark.implicits._
    val src = tmp("qsrc")
    // mixed-quality docs across two sources and two hour windows: long
    // clean prose passes the 0.8 gate, short punct-heavy junk fails,
    // null text is rejected (ingest error, not a quality failure)
    val clean = ("lorem ipsum dolor sit amet " * 12).trim
    val junk = "!!! ??? ###"
    val batch1 = Seq(
      (1L, clean, "a", clean.length.toLong, 1000L),
      (2L, junk, "a", junk.length.toLong, 1100L),
      (3L, clean, "b", clean.length.toLong, 4000L),
      (4L, null.asInstanceOf[String], "b", 0L, 4100L))
      .toDF("doc_id", "text", "source", "n_chars", "ts")
    val batch2 = Seq(
      (5L, junk, "b", junk.length.toLong, 4200L),
      (6L, clean, "a", clean.length.toLong, 1200L))
      .toDF("doc_id", "text", "source", "n_chars", "ts")
    val docs = batch1.unionAll(batch2)
    // one data file per micro-batch (maxFilesPerTrigger=1), written with
    // strictly increasing mtimes so the file source replays them in order;
    // BOTH (window, source) groups receive rows in BOTH batches
    batch1.coalesce(1).write.parquet(s"$src/b1")
    Thread.sleep(1000)
    batch2.coalesce(1).write.parquet(s"$src/b2")
    val q = StreamOps.qualityGateQuery(spark, src, "qgate", 0.8,
      sourceOptions = Map("maxFilesPerTrigger" -> "1"))
    q.awaitTermination()
    val sunk = spark.table("qgate").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSeq
    // the shipped default must NOT be Complete — asserted BEHAVIORALLY
    // (no Spark-internal classes): in Update mode each micro-batch
    // re-emits only the groups it updated, and the memory sink
    // accumulates BOTH versions of a twice-updated group; Complete
    // would truncate the sink every batch (exactly one row per group,
    // all groups re-emitted) and Append could never re-emit a
    // still-open window at all. Two rows per group — and the second
    // strictly growing — is the Update signature.
    assert(sunk.groupBy(r => (r._1, r._2)).forall(_._2.size == 2),
      s"every group must be emitted once per updating micro-batch: $sunk")
    // documented reader contract for an Update memory sink: latest row
    // per key — identified here by the strictly-growing doc count
    val got = sunk.groupBy(r => (r._1, r._2)).values
      .map(_.maxBy(_._3)).toSeq.sortBy(r => (r._1, r._2))
    // batch authority: the IDENTICAL score expression and gate; null
    // text is rejected as an ingest error AND counted (n_rejected), so
    // the live gate cannot silently diverge from the batch filter
    val expected = docs
      .withColumn("window_start", (col("ts") - col("ts") % 3600))
      .groupBy("window_start", "source")
      .agg(sum(col("text").isNotNull.cast("long")).as("n"),
        sum(when(col("text").isNotNull,
            (graft.operators.TextOps.docQualityScore >= 0.8).cast("long"))
          .otherwise(0L)).as("p"),
        sum(col("text").isNull.cast("long")).as("rej"))
      .orderBy("window_start", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSeq
    assert(got === expected)
    // the fixture exercises both outcomes and the observable rejection
    assert(got.map(_._3).sum === 5L, "null-text doc must not be counted")
    assert(got.map(_._5).sum === 1L, "null-text doc must be counted rejected")
    assert(got.find(r => r._1 == 3600L && r._2 == "b").exists(_._5 == 1L),
      "the reject must land in its own (window, source) group")
    assert(got.exists(r => r._4 < r._3) && got.exists(r => r._4 > 0))
  }

  test("streaming anomaly gate == batch z-gate against the same baseline") {
    import spark.implicits._
    val src = tmp("asrc")
    // train-offline/apply-live: the baseline trains on a CLEAN prior
    // day; the stream is the next day with one spiked 6h window on
    // metric m (metric n stays stable) — both flag outcomes exercised
    val histRows: Seq[(String, Long, Double)] =
      (0 until 24).map(h => ("m", h * 3600L, 10.0 + (h % 3))) ++
        (0 until 24).map(h => ("n", h * 3600L, 5.0 + (h % 2)))
    val rows: Seq[(String, Long, Double)] =
      (0 until 24).map { h =>
        val v = if (h >= 6 && h < 12) 100.0 else 10.0 + (h % 3)
        ("m", 86400L + h * 3600L, v)
      } ++ (0 until 24).map(h => ("n", 86400L + h * 3600L, 5.0 + (h % 2)))
    val pts = rows.toDF("metric", "ts", "value")
    // split mid-window (hours 0–8 | 9–23): the [6h, 12h) window receives
    // points from BOTH micro-batches for both metrics, so Update mode
    // must re-emit it; batch-2's earliest event (hour 9) stays inside
    // batch-1's 2h watermark (wm after b1 = hour 8 − 2h = hour 6), so
    // nothing is late-dropped. Written with increasing mtimes +
    // maxFilesPerTrigger=1 for a deterministic two-batch replay.
    val isB1 = (r: (String, Long, Double)) => r._2 < 86400L + 9 * 3600L
    rows.filter(isB1).toDF("metric", "ts", "value")
      .coalesce(1).write.parquet(s"$src/b1")
    Thread.sleep(1000)
    rows.filterNot(isB1).toDF("metric", "ts", "value")
      .coalesce(1).write.parquet(s"$src/b2")
    val baseline = StreamOps.anomalyBaseline(
      histRows.toDF("metric", "ts", "value"))
    val q = StreamOps.anomalyGateQuery(spark, src, "agate", baseline,
      21600L, 2.0, sourceOptions = Map("maxFilesPerTrigger" -> "1"))
    q.awaitTermination()
    val sunk = spark.table("agate").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4))).toSeq
    // same bounded-state contract as the quality gate — Update, never
    // Complete — asserted BEHAVIORALLY: only the straddled [6h, 12h)
    // window is emitted twice (second emission with more points); every
    // single-batch window once. Complete would re-emit ALL windows per
    // batch and truncate the sink; Append could not re-emit at all.
    val emits = sunk.groupBy(r => (r._1, r._2)).view.mapValues(_.size).toMap
    Seq("m", "n").foreach { metric =>
      assert(emits((metric, 86400L + 21600L)) === 2,
        "the batch-straddling window must be re-emitted with its update")
    }
    assert(emits.count(_._2 == 2) === 2 && emits.values.forall(_ <= 2))
    // latest row per key = the strictly larger point count
    val got = sunk.groupBy(r => (r._1, r._2)).values
      .map(_.maxBy(_._3)).toSeq.sortBy(r => (r._1, r._2))
    // batch authority: identical window rollup + identical gate
    val expected = pts
      .withColumn("wts", col("ts") - col("ts") % 21600)
      .join(org.apache.spark.sql.functions.broadcast(baseline), "metric")
      .groupBy("metric", "wts")
      .agg(count("value").as("n_points"),
        round(avg("value"), 6).as("w_mean"),
        first("b_mean").as("b_mean"), first("b_sd").as("b_sd"))
      .select(col("metric"), col("wts"), col("n_points"), col("w_mean"),
        (abs(col("w_mean") - col("b_mean")) > lit(2.0) * col("b_sd"))
          .as("anomaly"))
      .orderBy("metric", "wts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4))).toSeq
    assert(got === expected)
    // the spiked window flags, its neighbors and the stable metric don't
    assert(got.filter(_._1 == "m").count(_._5) === 1)
    assert(got.find(r => r._1 == "m" && r._2 == 86400L + 21600L).exists(_._5))
    assert(got.filter(_._1 == "n").forall(!_._5))
  }

  test("watermarked windowed rollup emits per-(metric, window) aggregates") {
    import spark.implicits._
    val src = tmp("wsrc")
    // two days of hourly points for one metric + one for another; method
    // 'sum' with xff 0 reproduces the retired count/sum rollup exactly
    val day = 86400L
    val meta = Seq(("m", 3600L, "sum", 0.0), ("n", 3600L, "sum", 0.0))
      .toDF("metric", "timeStep", "aggregationMethod", "xFilesFactor")
    val rows: Seq[(String, Long, Option[Double])] =
      (0 until 30).map(h => ("m", h * 3600L, Some(1.0))) :+
        (("n", 10 * 3600L, Some(5.0)): (String, Long, Option[Double]))
    rows.toDF("metric", "ts", "value").write.parquet(s"$src/b1")
    StreamOps.windowedRollupQuery(spark, src, "wroll", meta, day, "2 hours",
      org.apache.spark.sql.streaming.OutputMode.Complete())
      .awaitTermination()
    val got = spark.table("wroll").orderBy("metric", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // day-0 window: 24 hourly points of 1.0; day-1 window: hours 24..29
    assert(got.toSeq === Seq(
      ("m", 0L, 24.0, 24L), ("m", day, 6.0, 6L), ("n", 0L, 5.0, 1L)))
    assert(got.forall(_._2 % day == 0))
  }

  test("streaming xff rollup == batch rollupTier on the same points") {
    import spark.implicits._
    val src = tmp("xsrc")
    // two metrics with different methods; metric n's day-1 window is too
    // sparse for xff=0.5 and must be gated out on BOTH paths
    val meta = Seq(("m", 3600L, "sum", 0.0), ("n", 3600L, "last", 0.5))
      .toDF("metric", "timeStep", "aggregationMethod", "xFilesFactor")
    val rows =
      (0 until 48).map(h => ("m", 3600L, h * 3600L, h.toDouble)) ++
      (0 until 24).map(h => ("n", 3600L, h * 3600L, h * 2.0)) ++
      Seq(("n", 3600L, 86400L + 3600L, 99.0)) // 1/24 known on day 1
    rows.toDF("metric", "step", "ts", "value")
      .select("metric", "ts", "value") // ingest input schema
      .write.parquet(s"$src/b1")

    val q = StreamOps.windowedRollupXff(spark, src, meta)
      .writeStream.format("memory").queryName("xffroll")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))
    val streamed = spark.table("xffroll").collect().map(key).toSet
    val batch = graft.operators.SeriesOps.rollupTier(
      rows.toDF("metric", "step", "ts", "value"), meta, 3600L, 86400L)
      .collect().map(key).toSet
    assert(batch.nonEmpty)
    assert(streamed === batch)
    // the sparse day was gated on both sides
    assert(!streamed.exists { case (m, ts, _, _) => m == "n" && ts == 86400L })
  }

  test("streaming exact dedup keeps the first arrival per digest") {
    import spark.implicits._
    val src = tmp("dsrc")
    // three distinct texts; "alpha" arrives three times under different ids
    Seq(
      (1L, "alpha alpha", 1000L),
      (2L, "beta beta", 1100L),
      (3L, "alpha alpha", 1200L),
      (4L, "gamma gamma", 1300L),
      (5L, "alpha alpha", 1400L)
    ).toDF("doc_id", "text", "ts").write.parquet(s"$src/b1")
    StreamOps.dedupExactQuery(spark, src, "ddup").awaitTermination()
    val got = spark.table("ddup").collect()
      .map(r => r.getLong(0)).toSet
    // exactly one survivor per digest; the duplicate copies are dropped
    assert(got.size === 3)
    assert(got.contains(2L) && got.contains(4L))
    assert((got - 2L - 4L).subsetOf(Set(1L, 3L, 5L)))
    // survivors' digests are distinct
    val digests = spark.table("ddup").select("digest").collect()
      .map(_.getString(0))
    assert(digests.distinct.length === digests.length)
  }

  test("admission gate rejects index matches AND within-stream repeats") {
    import spark.implicits._
    val src = tmp("asrc")
    // the "indexed corpus": alpha and beta are already known
    val index = StreamOps.indexDigestsOf(
      Seq((100L, "alpha alpha", 1L), (101L, "beta beta", 2L))
        .toDF("doc_id", "text", "ts"))
    // the arriving stream: one index re-crawl (alpha), one in-stream
    // repeat (delta twice), one null, two genuinely new docs
    Seq(
      (1L, Some("alpha alpha"), 1000L),
      (2L, Some("delta delta"), 1100L),
      (3L, Some("gamma gamma"), 1200L),
      (4L, Some("delta delta"), 1300L),
      (5L, None, 1400L)
    ).toDF("doc_id", "text", "ts").write.parquet(s"$src/b1")
    StreamOps.admissionGateQuery(spark, src, index, "adm").awaitTermination()
    val got = spark.table("adm").collect().map(_.getLong(0)).toSet
    // admitted: gamma, and exactly one delta; alpha (indexed) and the
    // null doc are rejected
    assert(got.contains(3L))
    assert((got & Set(2L, 4L)).size === 1)
    assert(!got.contains(1L) && !got.contains(5L))
    assert(got.size === 2)
  }

  test("live dropDuplicatesWithinWatermark matches the greedy replay chain " +
      "(horizon = 2x delay) under in-order per-file micro-batches") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import spark.implicits._
    // the correspondence the registered stream_dedup_replay face claims:
    // state for an admitted anchor a expires at a + delay, and the
    // watermark when occurrence x arrives (in-order arrivals, watermark
    // caught up) is ~x - delay — so eviction-then-readmission happens
    // iff x > a + 2*delay: the greedy chain with horizon H = 2*delay.
    // Gaps are kept far from the boundary (H = 2000): 500 << H,
    // 3000/4100 >> H, 1300 << H. TWO spacer batches precede each dup:
    // a batch's max event time only becomes the working watermark one
    // batch AFTER the batch that carried it (observed: a single spacer
    // leaves the dup's batch evicting against the watermark of two
    // batches back), so the second spacer gives the first one's time a
    // batch to commit — the verdicts then depend only on event-time
    // gaps, not on micro-batch phase.
    val src = tmp("wmchain")
    val events = Seq(
      (1L, "alpha", 1000L),
      (101L, "sp1a", 1300L), (105L, "sp1b", 1400L),
      (2L, "alpha", 1500L), // gap 500 < H: dropped
      (102L, "sp2a", 3850L), (106L, "sp2b", 3900L),
      (3L, "alpha", 4000L), // 3000 > H: state evicted, re-admitted
      (103L, "sp3a", 5100L), (107L, "sp3b", 5200L),
      (4L, "alpha", 5300L), // gap 1300 from new anchor 4000: dropped
      (104L, "sp4a", 7900L), (108L, "sp4b", 8000L),
      (5L, "alpha", 8100L)) // 4100 > H: re-admitted again
    events.zipWithIndex.foreach { case ((id, text, ts), i) =>
      if (i > 0) Thread.sleep(1000) // strictly increasing mtimes
      Seq((id, text, ts)).toDF("doc_id", "text", "ts")
        .coalesce(1).write.parquet(s"$src/b$i")
    }
    val q = StreamOps.dedupExact(
      spark.readStream.schema("doc_id LONG, text STRING, ts LONG")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")
        .parquet(src), "1000 seconds")
      .select("doc_id")
      .writeStream.format("memory").queryName("wmchain")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val live = spark.table("wmchain").collect().map(_.getLong(0)).toSet
    // the greedy chain (EventOps.streamDedupReplay semantics) at H=2000
    // over the same arrivals: fold each text's occurrences in ts order
    val h = 2000L
    val replay = events.groupBy(_._2).flatMap { case (_, occ) =>
      var last = Long.MinValue / 4
      occ.sortBy(_._3).flatMap { case (id, _, s) =>
        if (s > last + h) { last = s; Some(id) } else None
      }
    }.toSet
    assert(replay === Set(1L, 3L, 5L, 101L, 102L, 103L, 104L,
      105L, 106L, 107L, 108L))
    assert(live === replay)
  }

  test("live windowed xff rollup in Append mode matches the batch replay " +
      "rule on finalized windows (late drop, gate, dispatch)") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import spark.implicits._
    // the correspondence the registered stream_rollup_replay face
    // claims: a point whose WINDOW END has fallen to or below the
    // working watermark is dropped (its window's state was evicted); a
    // finalized window (end <= final watermark) emits iff known /
    // expected >= xff. Windows of 40s, fineStep 10 (expected 4, gate
    // known >= 2), delay 20s. Gaps are kept far from eviction
    // boundaries, and TWO spacer batches precede every
    // watermark-dependent verdict (a batch's max event time becomes the
    // working watermark up to two batches later — the dedup-pin
    // discipline), so verdicts depend only on event-time gaps, not
    // micro-batch phase.
    val src = tmp("wrollpin")
    val meta = Seq(("m", 10L, "sum", 0.5))
      .toDF("metric", "timeStep", "aggregationMethod", "xFilesFactor")
    val batches: Seq[Seq[(String, Long, Double)]] = Seq(
      Seq(("m", 0L, 1.0), ("m", 10L, 2.0), // window [0,40): on time
          ("m", 100L, 16.0)), //  [100,140): lone point -> suppressed
      Seq(("m", 200L, 32.0)), // spacer 1: advances watermark past 40
      Seq(("m", 210L, 64.0)), // spacer 2: gives spacer 1 a commit batch
      Seq(("m", 20L, 4.0), //   LATE: [0,40) end 40 <= wm ~180 -> dropped
          ("m", 220L, 8.0)), // [200,240) still open -> accepted
      Seq(("m", 400L, 0.5)), //  spacer pair: pushes wm past 240 so
      Seq(("m", 410L, 0.25)), // [200,240) finalizes and emits...
      Seq(("m", 420L, 0.125))) // ...with a batch to commit; [400,440)
    //                            never finalizes (final wm < 440)
    batches.zipWithIndex.foreach { case (rows, i) =>
      if (i > 0) Thread.sleep(1000) // strictly increasing mtimes
      rows.toDF("metric", "ts", "value")
        .coalesce(1).write.parquet(s"$src/b$i")
    }
    val q = StreamOps.windowedRollupXffDf(
        spark.readStream.schema(Ingest.inputSchema)
          .option("recursiveFileLookup", "true")
          .option("maxFilesPerTrigger", "1")
          .parquet(src),
        meta, fineStep = 10L, coarseStep = 40L,
        watermarkDelay = "20 seconds")
      .writeStream.format("memory").queryName("wrollpin")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val live = spark.table("wrollpin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    // the replay rule on the same arrivals: (m,20) drops (window end 40
    // <= running-max - 20), [0,40) emits known=2 sum=3.0 (2/4 >= 0.5),
    // [100,140) finalizes suppressed (1/4 < 0.5), [200,240) emits
    // known=3 sum=104.0, [400,440) stays open (never emits in Append)
    assert(live === Set(("m", 0L, 3.0, 2L), ("m", 200L, 104.0, 3L)))
  }

  test("streaming dedup rejects null-text documents instead of collapsing them") {
    import spark.implicits._
    val src = tmp("nsrc")
    // two invalid (null text) docs + two valid distinct docs: nulls must
    // not survive as one bogus "deduped" document
    Seq(
      (1L, Some("alpha alpha"), 1000L),
      (2L, None, 1100L),
      (3L, Some("beta beta"), 1200L),
      (4L, None, 1300L)
    ).toDF("doc_id", "text", "ts").write.parquet(s"$src/b1")
    StreamOps.dedupExactQuery(spark, src, "nddup").awaitTermination()
    val got = spark.table("nddup").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 3L))
  }

  test("flatMapGroupsWithState sessionize closes sessions across batches") {
    import spark.implicits._
    val src = tmp("ssrc")
    // batch 1: user 1 has two events 10 min apart (one session, still open)
    Seq((1L, 1000L, 1L), (1L, 1600L, 2L))
      .toDF("user_id", "ts", "event_id").write.parquet(s"$src/b1")
    StreamOps.sessionizeQuery(spark, src, "sess", gapSeconds = 3600L)
      .awaitTermination()
    assert(spark.table("sess").count() === 0) // nothing closed yet

    // batch 2: a far-future event closes the open session and starts a new
    // one; user 2 appears with a single open session (not emitted)
    Seq((1L, 100000L, 3L), (2L, 500L, 4L))
      .toDF("user_id", "ts", "event_id").write.parquet(s"$src/b2")
    StreamOps.sessionizeQuery(spark, src, "sess2", gapSeconds = 3600L)
      .awaitTermination()
    // NOTE: a fresh query name is required for the memory sink, but the
    // checkpoint-less second query replays all files: the session closure
    // is observed exactly once in its output
    val sessions = spark.table("sess2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(sessions === Set((1L, 1000L, 1600L, 2L)))
  }

  test("foldSessions cross-batch semantics: gap-adjacent late merges, far-late stays separate") {
    import StreamOps.{RawEvent, SessionState}
    // batch 1 leaves an open session [100000, 100600]
    val (s1, closed1) = StreamOps.foldSessions(1L, None,
      Seq(RawEvent(1L, 100000L, 1L), RawEvent(1L, 100600L, 2L)), 3600L)
    assert(closed1.isEmpty && s1 === Some(SessionState(100000L, 100600L, 2L)))
    // batch 2: a gap-adjacent LATE event extends the session backwards
    val (s2, closed2) = StreamOps.foldSessions(1L, s1,
      Seq(RawEvent(1L, 99500L, 3L)), 3600L)
    assert(closed2.isEmpty && s2 === Some(SessionState(99500L, 100600L, 3L)))
    // batch 3: a FAR-late event (more than a gap before the open session's
    // start) is its own closed session — it must NOT be absorbed into a
    // session that starts much later
    val (s3, closed3) = StreamOps.foldSessions(1L, s2,
      Seq(RawEvent(1L, 300000L, 4L), RawEvent(1L, 50L, 5L)), 3600L)
    assert(s3 === Some(SessionState(300000L, 300000L, 1L)))
    assert(closed3.map(s => (s.start_s, s.end_s, s.n_events)).toSet ===
      Set((50L, 50L, 1L), (99500L, 100600L, 3L)))
  }

  test("stateful sessionize agrees with the batch window sessionize") {
    import spark.implicits._
    implicit val s = spark
    // deterministic fixture: 3 users x events with mixed gaps
    val evs = for {
      u <- 1L to 3L
      i <- 0 until 20
    } yield StreamOps.RawEvent(u, i * (if (i % 5 == 0) 4000L else 600L) + u, i)
    val ds = evs.toDS()
    // batch model: same gap rule via sort per user
    val expected = evs.groupBy(_.user_id).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e.ts, e.event_id))
      val sessions = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      var start = -1L; var last = -1L; var n = 0L
      sorted.foreach { e =>
        if (start < 0) { start = e.ts; last = e.ts; n = 1 }
        else if (e.ts - last <= 3600L) { last = e.ts; n += 1 }
        else { sessions += ((u, start, last, n)); start = e.ts; last = e.ts; n = 1 }
      }
      sessions // open session not emitted — matches streaming append mode
    }.toSet
    val got = StreamOps.sessionize(ds, 3600L).collect()
      .map(x => (x.user_id, x.start_s, x.end_s, x.n_events)).toSet
    assert(got === expected)
  }

  test("foldHeavyHitters: exact until full, deterministic eviction, bounds") {
    // capacity 3, items with repeats: exact counts while there's room
    val m1 = StreamOps.foldHeavyHitters(Map.empty,
      Seq(1L, 2L, 1L, 3L, 1L, 2L), capacity = 3)
    assert(m1 === Map(1L -> (3L, 0L), 2L -> (2L, 0L), 3L -> (1L, 0L)))
    // a new item evicts the minimum (3, count 1) and inherits its count
    val m2 = StreamOps.foldHeavyHitters(m1, Seq(4L), capacity = 3)
    assert(!m2.contains(3L) && m2(4L) === (2L, 1L))
    assert(m2.size === 3, "capacity bound")
    // count tie on eviction breaks on item id (4 has count 2 = item 2's;
    // the victim is the SMALLER id, 2)
    val m3 = StreamOps.foldHeavyHitters(m2, Seq(5L), capacity = 3)
    assert(!m3.contains(2L) && m3(5L) === (3L, 2L))
  }

  test("streaming heavy hitters: space-saving bounds hold vs exact counts") {
    import spark.implicits._
    val src = tmp("hhsrc")
    val shards = 2
    val cap = 4
    // skewed fixture: item frequency ~ 1/rank, 12 distinct items so each
    // shard sees ~6 distinct > capacity 4 — eviction is exercised
    val evs = for {
      item <- 0L until 12L
      rep <- 0 until (60 / (item.toInt + 1))
    } yield (item, item * 1000 + rep, item * 100 + rep)
    evs.toDF("user_id", "ts", "event_id").write.parquet(s"$src/b1")
    StreamOps.heavyHittersQuery(spark, src, "hh", shards, cap)
      .awaitTermination()
    // Update-mode memory sink: counts only grow — take max per key
    val got = spark.table("hh").groupBy("shard", "item")
      .agg(max("count").as("count"), max("err").as("err")).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val exact = evs.groupBy(_._1).map { case (k, es) => k -> es.size.toLong }
    val shardTotal = evs.groupBy(_._1 % shards)
      .map { case (s, es) => s -> es.size.toLong }
    // per-shard capacity bound
    got.keys.groupBy(_._1).foreach { case (_, ks) => assert(ks.size <= cap) }
    got.foreach { case ((s, item), (count, err)) =>
      val t = exact(item)
      assert(count >= t, s"item $item: count $count < true $t")
      assert(count - err <= t, s"item $item: count-err ${count - err} > $t")
      assert(s === (item % shards).toInt)
    }
    // guarantee: any item with true freq > shardTotal/capacity is present
    exact.foreach { case (item, t) =>
      val s = (item % shards).toInt
      if (t > shardTotal(s.toLong) / cap)
        assert(got.contains((s, item)), s"guaranteed heavy item $item missing")
    }
  }
}
