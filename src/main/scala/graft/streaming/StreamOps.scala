package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import graft.core.Catalog

/** Streaming analytics over the ingest stream (SURVEY §2.8): watermarked
  * tumbling-window aggregation (the streaming face of the rollup) and
  * stateful sessionization via flatMapGroupsWithState (the custom-state
  * shape for logic windows can't express).
  */
object StreamOps {

  /** The streaming rollup — the live-tier face of
    * [[graft.operators.SeriesOps.rollupTier]]: per (metric, window) over
    * the ingested (aligned, in-batch-compacted) fine points, a
    * stream-static BROADCAST join against the metadata table supplies the
    * per-metric aggregation method and xFilesFactor, the when-chain
    * dispatches over the candidate aggregates, and a window emits only
    * when known/expected >= xff — the same gate, method dispatch, and
    * output shape the batch tier pair produces (parity-pinned in the
    * suite). Late rows beyond the watermark drop HERE (bounded state —
    * O(#open windows × #metrics), shuffled on the same (metric, window)
    * key as the batch rollup); the batch maintenance pass stays the
    * authority that folds them in, so end-to-end nothing is lost
    * (SURVEY §2.8's documented split). This is the ONLY streaming rollup
    * path — an earlier count/sum-only variant was retired as a strict
    * subset (count+sum = method 'sum' with xff 0 plus the emitted
    * `known`), one implementation to keep semantics from drifting. */
  def windowedRollupXff(spark: SparkSession, srcDir: String, meta: DataFrame,
                        fineStep: Long = 3600,
                        coarseStep: Long = 86400,
                        watermarkDelay: String = "2 hours"): DataFrame =
    windowedRollupXffDf(
      spark.readStream
        .schema(Ingest.inputSchema)
        .option("recursiveFileLookup", "true")
        .parquet(srcDir),
      meta, fineStep, coarseStep, watermarkDelay)

  /** [[windowedRollupXff]] over an explicit streaming points DataFrame —
    * the [[dedupExact]] convention, so the suite can drive the operator
    * under controlled per-file micro-batches (the
    * `stream_rollup_replay` live-correspondence pin). */
  def windowedRollupXffDf(points: DataFrame, meta: DataFrame,
                          fineStep: Long, coarseStep: Long,
                          watermarkDelay: String): DataFrame = {
    require(coarseStep % fineStep == 0,
      s"coarse step $coarseStep must be a multiple of fine step $fineStep")
    val expected = (coarseStep / fineStep).toDouble
    val dispatch =
      when(col("method") === "average", col("v_avg"))
        .when(col("method") === "sum", col("v_sum"))
        .when(col("method") === "min", col("v_min"))
        .when(col("method") === "max", col("v_max"))
        .otherwise(col("v_last"))
    points
      .where(col("value").isNotNull)
      .join(broadcast(meta.select("metric", "aggregationMethod", "xFilesFactor")),
        "metric")
      .withColumn("event_time", timestamp_seconds(col("ts")))
      .withWatermark("event_time", watermarkDelay)
      .groupBy(col("metric"),
        window(col("event_time"), s"$coarseStep seconds"))
      .agg(count("value").as("known"),
        first("aggregationMethod").as("method"),
        first("xFilesFactor").as("xff"),
        round(avg("value"), 6).as("v_avg"),
        round(sum("value"), 6).as("v_sum"),
        min("value").as("v_min"),
        max("value").as("v_max"),
        max_by(col("value"), col("ts")).as("v_last"))
      .where(col("known") / expected >= col("xff"))
      .select(col("metric"),
        unix_timestamp(col("window.start")).as("ts"),
        dispatch.as("value"),
        col("known"))
  }

  /** Start the windowed xff rollup into an in-memory sink. Production
    * uses Append (a window emits exactly once, when the watermark passes
    * it); tests use Complete because append emission lags the watermark
    * by one micro-batch, which a single AvailableNow pass never
    * observes. */
  def windowedRollupQuery(spark: SparkSession, srcDir: String,
                          sinkTable: String, meta: DataFrame,
                          coarseStep: Long = 86400,
                          watermarkDelay: String = "2 hours",
                          mode: OutputMode = OutputMode.Append()): StreamingQuery =
    windowedRollupXff(spark, srcDir, meta, coarseStep = coarseStep,
        watermarkDelay = watermarkDelay)
      .writeStream
      .format("memory")
      .queryName(sinkTable)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()

  // ——————————————————— streaming exact dedup ——————————————————————————————

  /** Streaming exact dedup for a document ingest pipeline: ONE survivor
    * per content digest, later copies dropped. Which copy survives within
    * a micro-batch is partition-order-dependent (Spark's
    * dropDuplicatesWithinWatermark gives no ordering guarantee) — the
    * batch `dedup_exact` remains the deterministic authority for keeper
    * IDENTITY (min doc_id); this stage's contract is survivor UNIQUENESS.
    * State carries only the sha2 hex digest (64 chars, never the
    * document) and is watermark-pruned, so memory is bounded; copies that
    * straddle a watermark horizon are caught by the periodic batch dedup
    * pass, the same authority split the ingest path documents for late
    * data.
    *
    * Null-text documents are REJECTED (filtered out) before hashing: a
    * null text has a null sha2 digest, and dropDuplicatesWithinWatermark
    * treats nulls as equal, which would silently collapse every invalid
    * document to one survivor — an invalid input should never masquerade
    * as a deduped document.
    *
    * Input schema: (doc_id LONG, text STRING, ts LONG epoch-seconds). */
  def dedupExact(docs: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    docs
      .where(col("text").isNotNull)
      .withColumn("digest", sha2(col("text"), 256))
      .withColumn("event_time", timestamp_seconds(col("ts")))
      .withWatermark("event_time", watermarkDelay)
      .dropDuplicatesWithinWatermark("digest")

  /** Run the streaming dedup over a file-source stream into a memory
    * sink. */
  def dedupExactQuery(spark: SparkSession, srcDir: String, sinkTable: String,
                      watermarkDelay: String = "2 hours"): StreamingQuery =
    dedupExact(
      spark.readStream
        .schema("doc_id LONG, text STRING, ts LONG")
        .option("recursiveFileLookup", "true")
        .parquet(srcDir),
      watermarkDelay)
      .select("doc_id", "digest", "ts")
      .writeStream
      .format("memory")
      .queryName(sinkTable)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming ADMISSION gate — the live form of the batch
    * `dedup_incremental` contract at the exact-dedup level: an arriving
    * document is admitted iff its normalized-text digest matches neither
    * the INDEXED corpus (a batch-built static digest table, the
    * train-offline/apply-live split [[anomalyGate]] uses) nor an
    * earlier arrival inside the watermark. The index side is a
    * stream-STATIC left-anti join (no state — Spark broadcasts or
    * re-scans the static side per micro-batch); the within-stream side
    * is the [[dedupExact]] watermark-bounded state. Near-dup (minhash)
    * admission stays a per-batch BATCH job against the persisted bucket
    * index (`dedup_incremental`) — banded LSH state across an unbounded
    * stream has no watermark-safe eviction story, and the honest
    * streaming contract is the exact level.
    *
    * Null-text documents are rejected before hashing (the
    * [[dedupExact]] argument). Input schema: (doc_id LONG, text STRING,
    * ts LONG epoch-seconds); `indexDigests` carries `digest`. */
  def admissionGate(docs: DataFrame, indexDigests: DataFrame,
                    watermarkDelay: String = "2 hours"): DataFrame =
    docs
      .where(col("text").isNotNull)
      .withColumn("digest", sha2(col("text"), 256))
      .join(indexDigests.select("digest"), Seq("digest"), "left_anti")
      .withColumn("event_time", timestamp_seconds(col("ts")))
      .withWatermark("event_time", watermarkDelay)
      .dropDuplicatesWithinWatermark("digest")

  /** The batch-side digest table [[admissionGate]] joins against: one
    * distinct sha2 per indexed document (in production, maintained by
    * the ingest index like every feature table). */
  def indexDigestsOf(docs: DataFrame): DataFrame =
    docs.where(col("text").isNotNull)
      .select(sha2(col("text"), 256).as("digest")).distinct()

  /** Run the streaming admission gate over a file-source stream into a
    * memory sink. */
  def admissionGateQuery(spark: SparkSession, srcDir: String,
                         indexDigests: DataFrame, sinkTable: String,
                         watermarkDelay: String = "2 hours")
      : StreamingQuery =
    admissionGate(
      spark.readStream
        .schema("doc_id LONG, text STRING, ts LONG")
        .option("recursiveFileLookup", "true")
        .parquet(srcDir),
      indexDigests, watermarkDelay)
      .select("doc_id", "digest", "ts")
      .writeStream
      .format("memory")
      .queryName(sinkTable)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()

  // ——————————————————— stateful sessionization ———————————————————————————

  final case class RawEvent(user_id: Long, ts: Long, event_id: Long)
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class Session(user_id: Long, start_s: Long, end_s: Long,
                           n_events: Long, closed: Boolean)

  /** Custom-state sessionization with flatMapGroupsWithState: per user,
    * events extend the open session while gaps <= gapSeconds; a larger gap
    * CLOSES the session (emitted downstream) and opens a new one. The open
    * session survives in GroupState across micro-batches — logic a window
    * function cannot express incrementally.
    *
    * State is O(#active users); the shuffle key is user_id (same skew
    * considerations as the batch sessionize). */
  /** Pure per-group fold: apply one micro-batch of a user's events to the
    * open-session state; returns (new state, sessions closed this batch).
    * Unit-testable without a streaming query. */
  def foldSessions(uid: Long, prior: Option[SessionState],
                   events: Seq[RawEvent], gapSeconds: Long)
      : (Option[SessionState], Seq[Session]) = {
    // micro-batch arrival order is not time order: sort within batch
    val sorted = events.sortBy(e => (e.ts, e.event_id))
    var cur = prior
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      cur match {
        // within [start-gap, last+gap]: extends the open session (a LATE
        // cross-batch event may precede the open session's start — it
        // merges only if it is actually gap-adjacent)
        case Some(s) if e.ts >= s.start - gapSeconds &&
                        e.ts <= s.last + gapSeconds =>
          cur = Some(s.copy(start = math.min(s.start, e.ts),
            last = math.max(s.last, e.ts), n = s.n + 1))
        // older than the open session by more than a gap: a separate
        // already-over session — emit it closed immediately
        case Some(s) if e.ts < s.start - gapSeconds =>
          closed += Session(uid, e.ts, e.ts, 1, closed = true)
        // newer by more than a gap: close current, open a new one
        case Some(s) =>
          closed += Session(uid, s.start, s.last, s.n, closed = true)
          cur = Some(SessionState(e.ts, e.ts, 1))
        case None =>
          cur = Some(SessionState(e.ts, e.ts, 1))
      }
    }
    (cur, closed.result())
  }

  def sessionize(events: Dataset[RawEvent], gapSeconds: Long)
                (implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, it, state: GroupState[SessionState]) =>
          val (cur, closed) =
            foldSessions(uid, state.getOption, it.toSeq, gapSeconds)
          cur.foreach(state.update)
          closed.iterator
      }
  }

  // ————————————————— streaming quality gate ———————————————————————————

  /** Watermarked per-(window, source) QUALITY-GATE observability for a
    * live document ingest: how many docs arrived and how many clear the
    * quality threshold, per hour per source — the pass-rate curve an
    * operator watches to catch a source going bad MID-CRAWL, before the
    * nightly batch `quality_apply` filters it. Uses the IDENTICAL
    * [[TextOps.docQualityScore]] expression as the batch
    * score/histogram/apply faces, so the live gate and the batch filter
    * can never disagree on what passes. Null-text records are rejected
    * as ingest errors AND COUNTED (`n_rejected` per window/source —
    * r14): an invalid record is not a quality failure, but a gate that
    * silently dropped it would hide exactly the live-vs-batch
    * divergence this op exists to measure. `n_docs`/`n_pass` cover
    * valid documents only, so the pass-rate semantics are unchanged.
    *
    * Scale: stateless scoring + a watermarked (window, source) rollup —
    * state is O(open windows × sources), watermark-pruned (which
    * requires a non-Complete output mode — see [[qualityGateQuery]]);
    * nothing per-document is retained.
    *
    * Input schema: (doc_id LONG, text STRING, source STRING,
    * n_chars LONG, ts LONG epoch-seconds). */
  def qualityGate(docs: DataFrame, threshold: Double = 0.8,
                  watermarkDelay: String = "2 hours"): DataFrame =
    docs
      .withColumn("event_time", timestamp_seconds(col("ts")))
      .withWatermark("event_time", watermarkDelay)
      .groupBy(window(col("event_time"), "1 hour").as("w"), col("source"))
      .agg(sum(col("text").isNotNull.cast("long")).as("n_docs"),
        sum(when(col("text").isNotNull,
            (graft.operators.TextOps.docQualityScore >= threshold)
              .cast("long"))
          .otherwise(0L)).as("n_pass"),
        sum(col("text").isNull.cast("long")).as("n_rejected"))
      .select(unix_timestamp(col("w.start")).as("window_start"),
        col("source"), col("n_docs"), col("n_pass"), col("n_rejected"))

  /** Run the streaming quality gate over a file-source stream into a
    * memory sink. Defaults to `OutputMode.Update()` (r14): in Complete
    * mode Spark ignores the watermark and retains every (window,
    * source) group forever, which breaks the gate's "state O(open
    * windows × sources), watermark-pruned" contract on any long-running
    * ingest — Update emits only changed groups and lets the watermark
    * evict closed windows. (A memory-sink Update table accumulates one
    * row per group PER UPDATING BATCH; readers take the latest row per
    * key. Pass Complete explicitly only for bounded runs.) */
  def qualityGateQuery(spark: SparkSession, srcDir: String,
                       sinkTable: String, threshold: Double = 0.8,
                       outputMode: OutputMode = OutputMode.Update(),
                       sourceOptions: Map[String, String] = Map.empty)
      : StreamingQuery =
    qualityGate(
      spark.readStream
        .schema("doc_id LONG, text STRING, source STRING, n_chars LONG, ts LONG")
        .option("recursiveFileLookup", "true")
        .options(sourceOptions)
        .parquet(srcDir),
      threshold)
      .writeStream
      .format("memory")
      .queryName(sinkTable)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()

  // ——————————————————— streaming anomaly gate —————————————————————————————

  /** Per-metric BASELINE (mean, population σ) trained BATCH-side from
    * the store's points — the train-offline/apply-live split a
    * production anomaly detector runs ([[anomalyGate]] applies it to
    * the live stream). Moments are exact integer MILLI-unit sums (the
    * `series_stdev` defense — squared sums must stay exact in a long)
    * closed by one fixed IEEE sequence; population σ (the
    * `series_bands` contract). O(#metrics) output — broadcastable by
    * construction. */
  def anomalyBaseline(points: DataFrame): DataFrame =
    points.where(col("value").isNotNull)
      .withColumn("km", floor(col("value") * lit(1e3) + lit(0.5)).cast("long"))
      .groupBy("metric")
      .agg(count(lit(1)).as("n"), sum("km").as("s1"),
        sum(col("km") * col("km")).as("s2"))
      .select(col("metric"),
        (col("s1").cast("double") / col("n") / lit(1e3)).as("b_mean"),
        (sqrt((col("n") * col("s2") - col("s1") * col("s1")).cast("double"))
          / col("n") / lit(1e3)).as("b_sd"))

  /** Streaming ANOMALY GATE — the live face of `series_bands` /
    * `series_zscore`: per (metric, tumbling window) the window mean of
    * the ingested points compares against the batch-trained
    * [[anomalyBaseline]] (a stream-static BROADCAST join — the
    * baseline is O(#metrics) metadata), and windows whose mean escapes
    * `nSigma` baseline deviations flag `anomaly` — "is this metric
    * behaving, live".
    *
    * Scale: stateless scoring + one watermarked (metric, window)
    * rollup — state is O(open windows × metrics), watermark-pruned
    * (non-Complete output mode required, the [[qualityGateQuery]]
    * contract); nothing per-point is retained, and the baseline join
    * never shuffles the stream. Input schema: the ingest tier's
    * (metric STRING, ts LONG epoch-seconds, value DOUBLE). */
  def anomalyGate(points: DataFrame, baseline: DataFrame,
                  windowSeconds: Long = 21600, nSigma: Double = 2.0,
                  watermarkDelay: String = "2 hours"): DataFrame =
    points
      .where(col("value").isNotNull)
      .join(broadcast(baseline), "metric")
      .withColumn("event_time", timestamp_seconds(col("ts")))
      .withWatermark("event_time", watermarkDelay)
      .groupBy(col("metric"),
        window(col("event_time"), s"$windowSeconds seconds").as("w"))
      .agg(count("value").as("n_points"),
        round(avg("value"), 6).as("w_mean"),
        first("b_mean").as("b_mean"), first("b_sd").as("b_sd"))
      .select(col("metric"), unix_timestamp(col("w.start")).as("ts"),
        col("n_points"), col("w_mean"),
        (abs(col("w_mean") - col("b_mean")) > lit(nSigma) * col("b_sd"))
          .as("anomaly"))

  /** Run the streaming anomaly gate over a file-source point stream
    * into a memory sink. Defaults to `OutputMode.Update()` — the same
    * watermark-eviction contract (and the same latest-row-per-key
    * reader note) as [[qualityGateQuery]]. */
  def anomalyGateQuery(spark: SparkSession, srcDir: String,
                       sinkTable: String, baseline: DataFrame,
                       windowSeconds: Long = 21600, nSigma: Double = 2.0,
                       outputMode: OutputMode = OutputMode.Update(),
                       sourceOptions: Map[String, String] = Map.empty)
      : StreamingQuery =
    anomalyGate(
      spark.readStream
        .schema("metric STRING, ts LONG, value DOUBLE")
        .option("recursiveFileLookup", "true")
        .options(sourceOptions)
        .parquet(srcDir),
      baseline, windowSeconds, nSigma)
      .writeStream
      .format("memory")
      .queryName(sinkTable)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Run the stateful sessionize over a file-source stream of raw events
    * into a memory sink. */
  def sessionizeQuery(spark: SparkSession, srcDir: String, sinkTable: String,
                      gapSeconds: Long = 3600): StreamingQuery = {
    import spark.implicits._
    implicit val s: SparkSession = spark
    val src = spark.readStream
      .schema("user_id LONG, ts LONG, event_id LONG")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
      .as[RawEvent]
    sessionize(src, gapSeconds)
      .writeStream
      .format("memory")
      .queryName(sinkTable)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
  }

  // ————————————————— streaming heavy hitters (space-saving) ———————————————

  /** One item observation routed to its shard (the deterministic hash
    * route `item % #shards`, so EVERY occurrence of an item lands on the
    * same shard and the union of shard summaries IS the global summary —
    * no cross-shard double counting, no merge step). */
  final case class HHObs(shard: Int, item: Long)

  /** A shard's live summary row: `count ≥ true count` always, and
    * `count − err ≤ true count` (err is the count inherited from the
    * evicted minimum at admission) — the space-saving guarantees. */
  final case class HHSummary(shard: Int, item: Long, count: Long, err: Long)

  /** Per-shard space-saving state: item → (count, err), ≤ capacity
    * entries. */
  final case class HHCounters(items: Map[Long, (Long, Long)])

  /** Pure per-shard fold: apply one micro-batch of observations to a
    * space-saving summary (Metwally, Agrawal & El Abbadi, "Efficient
    * computation of frequent and top-k elements in data streams",
    * ICDT 2005). Present item: count+1. Absent with room: admit at
    * (1, 0). Absent and full: evict the minimum-count entry (count
    * tiebreak on item id — deterministic) and admit at
    * (min+1, err=min). Unit-testable without a streaming query, the
    * [[foldSessions]] discipline. */
  def foldHeavyHitters(prior: Map[Long, (Long, Long)], items: Seq[Long],
                       capacity: Int): Map[Long, (Long, Long)] = {
    var m = prior
    items.foreach { it =>
      m.get(it) match {
        case Some((c, e)) => m = m.updated(it, (c + 1, e))
        case None if m.size < capacity => m = m.updated(it, (1L, 0L))
        case None =>
          val (victim, (minC, _)) = m.minBy { case (k, (c, _)) => (c, k) }
          m = (m - victim).updated(it, (minC + 1, minC))
      }
    }
    m
  }

  /** Streaming heavy hitters over an unbounded item stream — the "which
    * users/keys dominate the firehose RIGHT NOW" read that an exact
    * groupBy can't answer online (its state is O(#distinct items);
    * a 100 TB stream has billions). Each shard holds a space-saving
    * summary of fixed `capacity` in [[GroupState]]; any item whose true
    * frequency exceeds shardStream/capacity is GUARANTEED present in its
    * shard's summary, and every reported count brackets the truth as
    * [count − err, count]. State is O(#shards × capacity) — constants,
    * not data-sized; the shuffle key is the shard route. Update mode:
    * each micro-batch re-emits the changed shard's current summary
    * (O(capacity) rows), so readers take the max count per (shard, item)
    * — counts only grow. */
  def heavyHitters(items: Dataset[HHObs], capacity: Int)
                  (implicit spark: SparkSession): Dataset[HHSummary] = {
    import spark.implicits._
    items
      .groupByKey(_.shard)
      .flatMapGroupsWithState[HHCounters, HHSummary](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (shard, it, state: GroupState[HHCounters]) =>
          val m = foldHeavyHitters(
            state.getOption.map(_.items).getOrElse(Map.empty),
            it.map(_.item).toSeq, capacity)
          state.update(HHCounters(m))
          m.iterator.map { case (k, (c, e)) => HHSummary(shard, k, c, e) }
      }
  }

  /** Run the streaming heavy-hitter summary over a file-source event
    * stream (item = user_id) into a memory sink. */
  def heavyHittersQuery(spark: SparkSession, srcDir: String,
                        sinkTable: String, shards: Int = 4,
                        capacity: Int = 16): StreamingQuery = {
    import spark.implicits._
    implicit val s: SparkSession = spark
    val src = spark.readStream
      .schema("user_id LONG, ts LONG, event_id LONG")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
      .select(pmod(col("user_id"), lit(shards)).cast("int").as("shard"),
        col("user_id").as("item"))
      .as[HHObs]
    heavyHitters(src, capacity)
      .writeStream
      .format("memory")
      .queryName(sinkTable)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
