package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Catalog

/** Event-stream analysis operators over the raw `events` table (SURVEY
  * §2.9): sessionization (ranking + analytic windows — the §2.5 gap) and
  * JSON property extraction. */
object EventOps {

  /** Gap-based sessionization: per user, ordered by (ts, event_id), a new
    * session starts when the gap to the previous event exceeds
    * `gapSeconds`. Emits one row per session with its extent.
    *
    * Scale: one shuffle on user_id + an in-partition sort — the canonical
    * sessionize plan. Skewed users are the known risk; the mitigation at
    * 100 TB is [[sessionizePreBucketed]] (pre-bucket by (user, day), then
    * stitch boundary sessions), parity-pinned against this form. */
  def sessionize(spark: SparkSession, dir: String,
                 gapSeconds: Long = 3600): DataFrame =
    sessionizeDf(eventsSec(spark, dir), gapSeconds)

  /** Raw events as the (user_id, s, event_id) sessionize input. */
  private def eventsSec(spark: SparkSession, dir: String): DataFrame = {
    val sec = expr("ts div 1000000000")
    Catalog.events(spark, dir)
      .select(col("user_id"), sec.as("s"), col("event_id"))
  }

  /** [[sessionize]] over an explicit (user_id, s, event_id) DataFrame. */
  def sessionizeDf(e: DataFrame, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("s", "event_id")
    e.withColumn("prev_s", lag("s", 1).over(w))
      .withColumn("new_session",
        when(col("prev_s").isNull || col("s") - col("prev_s") > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
           min("s").as("start_s"),
           max("s").as("end_s"))
      .orderBy("user_id", "session_id")
  }

  /** Skew-safe sessionization — the 100 TB plan for power users whose
    * event history dwarfs everyone else's: stage 1 sessionizes within
    * (user, time-bucket) partitions, so the window sort key is
    * (user, bucket) and a whale user's events spread across as many
    * partitions as they span buckets; stage 2 stitches PARTIAL SESSIONS
    * (already collapsed to one row each — orders of magnitude smaller than
    * events) across bucket boundaries with the same gap rule.
    *
    * Equivalence argument (parity-pinned on a skewed fixture): partial
    * sessions are disjoint intervals in time order, so the only event
    * pairs stage 1 cannot see are (last event of one partial, first of
    * the next) — exactly the pairs stage 2's start-vs-previous-end gap
    * check applies the rule to. Chain merging is transitive along
    * consecutive pairs, so a session spanning an empty bucket (gap >
    * bucket width) also stitches. */
  def sessionizePreBucketed(spark: SparkSession, dir: String,
                            gapSeconds: Long = 3600,
                            bucketSeconds: Long = 86400): DataFrame =
    sessionizePreBucketedDf(eventsSec(spark, dir), gapSeconds, bucketSeconds)

  /** [[sessionizePreBucketed]] over an explicit (user_id, s, event_id)
    * DataFrame. */
  def sessionizePreBucketedDf(e: DataFrame, gapSeconds: Long,
                              bucketSeconds: Long = 86400): DataFrame = {
    require(bucketSeconds > 0, s"bucket must be positive: $bucketSeconds")
    // stage 1: sessionize within (user, bucket) — the skew-diffusing pass
    val wb = Window.partitionBy("user_id", "bucket").orderBy("s", "event_id")
    val partials = e
      .withColumn("bucket", col("s") - pmod(col("s"), lit(bucketSeconds)))
      .withColumn("prev_s", lag("s", 1).over(wb))
      .withColumn("new_partial",
        when(col("prev_s").isNull || col("s") - col("prev_s") > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("pid",
        sum("new_partial").over(wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "bucket", "pid")
      .agg(count(lit(1)).as("n_events"),
           min("s").as("start_s"),
           max("s").as("end_s"))
    // stage 2: stitch partials per user. Partials are disjoint and ordered,
    // so lag(end_s) IS the latest end seen and the adjacency check is the
    // event-gap rule at bucket boundaries.
    val ws = Window.partitionBy("user_id").orderBy("start_s")
    partials
      .withColumn("prev_end", lag("end_s", 1).over(ws))
      .withColumn("new_chain",
        when(col("prev_end").isNull ||
          col("start_s") - col("prev_end") > gapSeconds, 1L).otherwise(0L))
      .withColumn("session_id",
        sum("new_chain").over(ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(sum("n_events").as("n_events"),
           min("start_s").as("start_s"),
           max("end_s").as("end_s"))
      .orderBy("user_id", "session_id")
  }

  /** Ordered funnel analysis: how many users progressed through the
    * event-type stages IN TEMPORAL ORDER (each stage's event at or after
    * the previous stage's first occurrence). Classic product-analytics
    * shape; exercises chained conditional min-aggregation.
    *
    * Stage ordering compares the RAW nanosecond timestamps, so a repeated
    * stage advances on a strictly-later event even when two occurrences
    * fall within the same second (the source ts has ns resolution; a
    * seconds truncation here would merge them).
    *
    * Scale: one aggregation per stage, all shuffling on user_id with
    * map-side partial min — the per-stage tables are O(#users) and shrink
    * monotonically down the funnel. */
  def funnel(spark: SparkSession, dir: String,
             stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    val acc = firstReach(spark, dir, stages)
    val counts = acc.agg(
      stages.indices.map(i => count(col(s"t$i")).as(s"c$i")).head,
      stages.indices.map(i => count(col(s"t$i")).as(s"c$i")).tail: _*)
    val rows = stages.zipWithIndex.map { case (stage, i) =>
      struct(lit(i.toLong).as("stage_idx"), lit(stage).as("stage"),
        col(s"c$i").as("users"))
    }
    counts.select(explode(array(rows: _*)).as("r"))
      .select(col("r.stage_idx"), col("r.stage"), col("r.users"))
      .orderBy("stage_idx")
  }

  /** Per-user first-reach times t0..tn for the ordered funnel `stages` —
    * the accumulation [[funnel]] counts and [[funnelTimeToConvert]]
    * differences, factored so the two reads can never disagree on what
    * "reaching stage k" means. One left-joined column per stage; each
    * stage cascade executes once.
    *
    * Scale: one aggregation per stage, all shuffling on user_id with
    * map-side partial min — per-stage tables are O(#users) and shrink
    * monotonically down the funnel. */
  private def firstReach(spark: SparkSession, dir: String,
                         stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val e = Catalog.events(spark, dir)
      .select(col("user_id"), col("ts").as("s"), col("event_type"))
    val first = e.where(col("event_type") === stages.head)
      .groupBy("user_id").agg(min("s").as("t0"))
    stages.tail.zipWithIndex.foldLeft(first) {
      case (prev, (stage, i)) =>
        // a repeated stage name must match a STRICTLY later event, or the
        // event that reached stage k would also satisfy stage k+1
        val cmp = if (stage == stages(i)) col("s") > col("pt")
                  else col("s") >= col("pt")
        val rk = e.where(col("event_type") === stage)
          .join(prev.select(col("user_id"), col(s"t$i").as("pt")), "user_id")
          .where(cmp)
          .groupBy("user_id").agg(min("s").as(s"t${i + 1}"))
        prev.join(rk, Seq("user_id"), "left")
    }
  }

  /** Funnel CONVERSION LATENCY: for each consecutive stage pair, how many
    * users converted and the mean first-reach-to-first-reach delay — the
    * "where does the funnel stall" read next to [[funnel]]'s "where does
    * it leak". Shares [[firstReach]], so a user counts here exactly when
    * `funnel` counts them at the later stage.
    *
    * Parity: per-user deltas are exact integer MICROSECONDS (the raw ns
    * timestamp differences are ns-exact longs; `div 1000` keeps the
    * per-pair sum far from Long range at any user count) summed
    * order-independently; one closing division per pair (the engine's
    * standard decimal-half defense). Scale: the stage cascade is
    * [[firstReach]]'s; the closing aggregate collapses O(#users) rows to
    * #stages−1. */
  def funnelTimeToConvert(spark: SparkSession, dir: String,
                          stages: Seq[String] =
                            Seq("view", "click", "purchase")): DataFrame = {
    require(stages.length >= 2, "need at least two stages to convert")
    val acc = firstReach(spark, dir, stages)
    val pairAggs = stages.indices.tail.flatMap { i =>
      // exact integer microseconds (ns-long difference, integer div)
      val dUs = expr(s"(t$i - t${i - 1}) div 1000")
      Seq(count(col(s"t$i")).as(s"n$i"), sum(dUs).as(s"d$i"))
    }
    val counts = acc.agg(pairAggs.head, pairAggs.tail: _*)
    val rows = stages.indices.tail.map { i =>
      struct(lit(i.toLong - 1).as("stage_idx"),
        lit(s"${stages(i - 1)}->${stages(i)}").as("stage_pair"),
        col(s"n$i").as("n_converted"),
        q6(col(s"d$i") / (col(s"n$i") * lit(1e6))).as("avg_seconds"))
    }
    counts.select(explode(array(rows: _*)).as("r"))
      .select(col("r.stage_idx"), col("r.stage_pair"),
        col("r.n_converted"), col("r.avg_seconds"))
      .orderBy("stage_idx")
  }

  /** USER-BASE overlap between event types: |users doing both| and the
    * Jaccard of the two types' lifetime user sets — the audience-overlap
    * read ("are purchasers a subset of clickers") that complements
    * [[eventCoOccurrence]]'s same-day affinity with a lifetime view.
    *
    * Scale: events collapse FIRST to distinct (user, type) cells —
    * map-side combinable, O(users·types) — and the pair join keys on
    * user with ≤ #types rows per side, so pair fan-out is bounded by
    * the type vocabulary squared, never event volume. Counts are exact
    * integers; one closing division. */
  def eventUserOverlap(spark: SparkSession, dir: String): DataFrame = {
    val cells = Catalog.events(spark, dir)
      .select(col("user_id"), col("event_type")).distinct()
    val sizes = cells.groupBy("event_type").agg(count(lit(1)).as("n"))
    val pairs = cells.as("a")
      .join(cells.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(sizes.select(col("event_type").as("type_a"),
        col("n").as("na"))), "type_a")
      .join(broadcast(sizes.select(col("event_type").as("type_b"),
        col("n").as("nb"))), "type_b")
      .select(col("type_a"), col("type_b"), col("n_both"),
        q6(col("n_both").cast("double")
          / (col("na") + col("nb") - col("n_both"))).as("jaccard"))
      .orderBy("type_a", "type_b")
  }

  /** Inter-arrival-time quantiles per event type: the p50/p90/p99 of the
    * gaps between a user's CONSECUTIVE events of the same type — the
    * "how often does a user come back and do X" cadence read (feeds
    * session-gap tuning and retention models).
    *
    * Scale: the lag window partitions on (user, type) — per-user
    * streams, never a global per-type sort, so the whale axis is a
    * single user's single-type history (the same bound the sessionize
    * plan accepts). Quantiles run through the shared SORT-BASED
    * machinery (`TextOps.exactQuantilesOf` — rank window spills; never
    * Spark's value-buffering `percentile`). */
  def eventIntervals(spark: SparkSession, dir: String,
                     ps: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    val sec = expr("ts div 1000000000")
    val e = Catalog.events(spark, dir)
      .select(col("user_id"), col("event_type"), sec.as("s"), col("event_id"))
    val w = Window.partitionBy("user_id", "event_type").orderBy("s", "event_id")
    val gaps = e
      .withColumn("gap_s", col("s") - lag("s", 1).over(w))
      .where(col("gap_s").isNotNull)
      .select("event_type", "gap_s")
    TextOps.exactQuantilesOf(gaps, "event_type", "gap_s", ps)
  }

  /** Session SHAPE distribution: sessions bucketed by event count
    * (capped at `capBucket`, the classic long-tail histogram fold), with
    * per-bucket session count and mean duration — the engagement-depth
    * read over [[sessionize]]'s output ("how long do k-event visits
    * last").
    *
    * Parity: durations are exact integer seconds summed
    * order-independently; one closing division per bucket. Scale: the
    * sessionize window is the registered skew-aware story; this rollup
    * collapses its O(#sessions) output to ≤ `capBucket` rows map-side. */
  def sessionStats(spark: SparkSession, dir: String,
                   gapSeconds: Long = 3600,
                   capBucket: Int = 10): DataFrame =
    sessionize(spark, dir, gapSeconds)
      .select(
        least(col("n_events"), lit(capBucket.toLong)).as("bucket"),
        (col("end_s") - col("start_s")).as("dur_s"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_sessions"),
        sum("dur_s").as("total_seconds"),
        q6(sum("dur_s") / count(lit(1)).cast("double"))
          .as("avg_seconds"))
      .orderBy("bucket")

  /** Per-origin-type TRANSITION ENTROPY: how predictable is the next
    * event given the current one — the Markov-chain observability read
    * over [[transitions]]'s counts (H = ln n − Σ c·ln c / n, one `ln`
    * per DISTINCT destination). A from-type with entropy near 0 funnels
    * into one destination; near ln(#types) its successors are uniform.
    *
    * Parity: per-from-type scores are INTEGER micro-nats (the engine's
    * standard decimal-half defense, see `doc_entropy`); the count inputs
    * are exact. Scale: the transition table is O(#types²) — metadata
    * regardless of event volume — and the window pass producing it is
    * [[transitions]]'s one user-keyed shuffle. */
  def markovEntropy(spark: SparkSession, dir: String): DataFrame =
    transitions(spark, dir)
      .groupBy("from_type")
      .agg(sum("n").as("n_transitions"),
        count(lit(1)).as("n_to_types"),
        floor((log(sum("n")) - sum(col("n") * log(col("n"))) / sum("n"))
          * 1e6 + 0.5).cast("long").as("entropy_unats"))
      .select(col("from_type"), col("n_transitions"), col("n_to_types"),
        q6(col("entropy_unats") / lit(1e6)).as("entropy"))
      .orderBy("from_type")

  /** Event-type transition counts: per user, consecutive event pairs in
    * (ts, event_id) order — the first-order Markov view of behavior.
    * One window pass + one groupBy. */
  def transitions(spark: SparkSession, dir: String): DataFrame = {
    val sec = expr("ts div 1000000000")
    val e = Catalog.events(spark, dir)
      .select(col("user_id"), sec.as("s"), col("event_id"), col("event_type"))
    val w = Window.partitionBy("user_id").orderBy("s", "event_id")
    e.withColumn("prev_type", lag("event_type", 1).over(w))
      .where(col("prev_type").isNotNull)
      .groupBy(col("prev_type").as("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("from_type", "to_type")
  }

  /** Daily + rolling-window active users (DAU / WAU): one row per
    * observed epoch day with its distinct-user count and the distinct
    * users over the trailing `window` days — the other classic
    * product-analytics rollup next to [[cohortRetention]].
    *
    * The rolling distinct is computed EXACTLY by fanning each distinct
    * (day, user) row out to the `window` window-end days it contributes
    * to, then de-duplicating per (end-day, user) — a distinct count is
    * not decomposable over a sliding window (yesterday's WAU set can't
    * be updated, only re-counted), so the choice at scale is this
    * bounded linear fan-out (window × |distinct (day, user)| rows, two
    * map-side-combinable distincts, no per-day re-scan) or an
    * approximate HLL sketch union; this op is the exact path. Only
    * observed days are emitted (inner join with the DAU side). */
  def activeUsers(spark: SparkSession, dir: String,
                  window: Int = 7): DataFrame = {
    val du = Catalog.events(spark, dir)
      .select(expr("(ts div 1000000000) div 86400").as("day"),
        col("user_id"))
      .distinct()
    val dau = du.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = du
      .select(explode(sequence(col("day"), col("day") + (window - 1)))
        .as("day"), col("user_id"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as(s"wau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"))
      .orderBy("day")
  }

  /** Cohort retention — the classic product-analytics matrix: users are
    * cohorted by the week of their FIRST event, and each cell counts how
    * many of a cohort's users were active `week_offset` weeks later.
    *
    * Scale: distinct (user, week) activity first (map-side combinable),
    * one per-user min for the cohort assignment, one join keyed on
    * user_id, one final groupBy on the (cohort, offset) pair — no window
    * functions, no per-user sort. */
  def cohortRetention(spark: SparkSession, dir: String,
                      bucketSeconds: Long = 604800L): DataFrame = {
    require(bucketSeconds > 0, s"bucket must be positive: $bucketSeconds")
    val sec = expr("ts div 1000000000")
    val weeks = Catalog.events(spark, dir)
      .select(col("user_id"),
        (sec - pmod(sec, lit(bucketSeconds))).as("w"))
      .distinct()
    val cohorts = weeks.groupBy("user_id").agg(min("w").as("cohort_w"))
    weeks.join(cohorts, "user_id")
      .groupBy(col("cohort_w"),
        ((col("w") - col("cohort_w")) / lit(bucketSeconds)).cast("long")
          .as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_w", "week_offset")
  }

  /** Volume-anomaly detection: per (event_type, UTC day) event counts
    * z-scored against that type's own daily distribution, flagging
    * |z| ≥ `zThresh` — the "did signups crater / errors spike today"
    * read over the raw stream. Days with zero events of a type carry no
    * row (the stats are over OBSERVED days; a truly silent day is a
    * different alert — absence, not anomaly).
    *
    * Scale: the ONLY event-cardinality work is the map-side-combinable
    * rollup to O(#types × #days) daily cells; the stats window partitions
    * by type over that metadata-sized cell table, so everything after the
    * first shuffle is negligible at any corpus size. Parity: mean and
    * variance come from EXACT integer window sums (n, Σc, Σc² — counts,
    * so no float summation anywhere), then one fixed sequence of IEEE
    * ops both engines replicate bit-for-bit; the builtin `stddev` is
    * deliberately avoided (its incremental accumulation is
    * order-dependent). Degenerate groups (n ≤ 1 or zero variance) yield
    * null z. */
  def eventAnomaly(spark: SparkSession, dir: String,
                   zThresh: Double = 2.0): DataFrame = {
    val day = expr("ts div 1000000000 div 86400")
    val daily = Catalog.events(spark, dir)
      .groupBy(col("event_type"), day.as("day"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy("event_type")
    daily
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s1", sum("n_events").over(w))
      .withColumn("s2", sum(col("n_events") * col("n_events")).over(w))
      .withColumn("varr",
        (col("s2") - col("s1") * col("s1") * lit(1.0) / col("n"))
          / (col("n") - lit(1L)))
      .withColumn("z",
        when(col("n") > 1 && col("varr") > 0,
          (col("n_events") - col("s1") * lit(1.0) / col("n"))
            / sqrt(col("varr"))))
      .select(col("event_type"), col("day"), col("n_events"), col("z"),
        (abs(col("z")) >= lit(zThresh)).as("is_anomaly"))
      .orderBy("event_type", "day")
  }

  // ————————————————————————————— as-of join ————————————————————————————————

  /** The quote-struct type carried through the as-of windows. */
  private val AsofStruct = "struct<asof_ts:bigint,asof_value:double>"

  /** As-of join of raw events against the hourly series store: each event
    * is tagged with its own metric's most recent rollup value at-or-before
    * the event's second — the canonical "what did the gauge read when this
    * happened" enrichment, and the classic operator Spark's join types
    * don't express (an inequality join would explode; SparkSQL has no ASOF
    * JOIN).
    *
    * Spark-first shape: quotes and requests UNION into one stream keyed by
    * metric, ordered by (ts, quote-first at ties — `e.ts >= q.ts` is
    * inclusive), and a running `last(quote, ignoreNulls)` window hands
    * every request the latest quote — ONE shuffle on the join key, no
    * inequality-join pair explosion, no driver participation. Values are
    * COPIED, never computed, so cross-engine parity is trivial against the
    * oracle's native ASOF LEFT JOIN.
    *
    * Scale: the partition key is the metric alone, so a whale metric
    * lands on one partition — the known risk, mitigated by
    * [[asofValueBucketed]] (same contract, (metric, day) partitioning),
    * parity-pinned and separately registered. */
  def asofValue(spark: SparkSession, dir: String): DataFrame =
    asofValueFrom(storeQuotes(spark, dir), eventRequests(spark, dir))

  /** [[asofValue]] over explicit `quotes` (metric, ts, value) and
    * `requests` (metric, ts, event_id, event_type) tables. */
  def asofValueFrom(quotes: DataFrame, requests: DataFrame): DataFrame = {
    val w = Window.partitionBy("metric")
      .orderBy(col("ts").asc, col("is_quote").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    asofUnion(quotes, requests)
      .withColumn("asof", last("q", ignoreNulls = true).over(w))
      .where(col("is_quote") === 0)
      .select(col("event_id"), col("event_type"), col("ts"),
        col("asof.asof_ts").as("asof_ts"),
        col("asof.asof_value").as("asof_value"))
      .orderBy("event_id")
  }

  /** The store's hourly rollup as the as-of quote side. */
  private def storeQuotes(spark: SparkSession, dir: String): DataFrame =
    Catalog.pointsCached(spark, dir).select("metric", "ts", "value")

  /** Raw events as the as-of request side, keyed to their own metric. */
  private def eventRequests(spark: SparkSession, dir: String): DataFrame =
    Catalog.events(spark, dir)
      .select(concat(lit("events."), col("event_type")).as("metric"),
        expr("ts div 1000000000").as("ts"),
        col("event_id"), col("event_type"))

  /** The tagged quote ∪ request stream both as-of forms window over:
    * quotes carry their (ts, value) as a struct, requests carry their
    * event identity; `is_quote` breaks ties quote-first. */
  private def asofUnion(quotes: DataFrame, requests: DataFrame): DataFrame =
    quotes
      .select(col("metric"), col("ts"), lit(1).as("is_quote"),
        struct(col("ts").as("asof_ts"), col("value").as("asof_value")).as("q"),
        lit(null).cast("long").as("event_id"),
        lit(null).cast("string").as("event_type"))
      .unionByName(requests
        .select(col("metric"), col("ts"), lit(0).as("is_quote"),
          lit(null).cast(AsofStruct).as("q"),
          col("event_id"), col("event_type")))

  /** [[asofValue]] with the 100 TB partitioning: the window runs within
    * (metric, UTC day) — a whale metric's requests spread over as many
    * partitions as days — and a request whose day holds no earlier quote
    * falls back to its day's OPENING value, carried forward on the
    * O(#metrics × #days) day-spine table (per-day last quotes + a
    * day-level carry-forward window over yesterday-and-earlier — frame
    * ends at -1 so a day never sees its own quotes in the opening).
    * Equivalence: the latest quote at-or-before a request is either
    * in-day (the in-partition window finds it) or strictly earlier (the
    * opening carries exactly the last quote of the latest earlier day
    * with data); `coalesce(in_day, opening)` picks the former when both
    * exist, matching the global scan order. Parity with [[asofValue]] is
    * suite-pinned and both register against the identical oracle. */
  def asofValueBucketed(spark: SparkSession, dir: String): DataFrame =
    asofValueBucketedFrom(storeQuotes(spark, dir), eventRequests(spark, dir))

  /** [[asofValueBucketed]] over explicit quote/request tables (same
    * shapes as [[asofValueFrom]]). */
  def asofValueBucketedFrom(quotes: DataFrame,
                            requests: DataFrame): DataFrame = {
    val unioned = asofUnion(quotes, requests)
      .withColumn("day", col("ts") - pmod(col("ts"), lit(86400L)))
    // O(#metrics × #days): each day's closing quote, then the opening
    // value per spine day = the carry-forward of strictly-earlier closes
    val closes = unioned.where(col("is_quote") === 1)
      .groupBy("metric", "day").agg(max_by(col("q"), col("ts")).as("day_close"))
    val spine = unioned.select("metric", "day").distinct()
    val wDays = Window.partitionBy("metric").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, -1)
    val opening = spine.join(closes, Seq("metric", "day"), "left")
      .withColumn("opening", last("day_close", ignoreNulls = true).over(wDays))
      .select("metric", "day", "opening")
    val wInDay = Window.partitionBy("metric", "day")
      .orderBy(col("ts").asc, col("is_quote").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn("in_day", last("q", ignoreNulls = true).over(wInDay))
      .where(col("is_quote") === 0)
      .join(opening, Seq("metric", "day"), "left")
      .withColumn("asof", coalesce(col("in_day"), col("opening")))
      .select(col("event_id"), col("event_type"), col("ts"),
        col("asof.asof_ts").as("asof_ts"),
        col("asof.asof_value").as("asof_value"))
      .orderBy("event_id")
  }

  /** Per-type heavy hitters: the top `k` users by event count within each
    * event type — the "who is hammering this endpoint" skew-observability
    * read (and the table a salting decision reads before picking keys).
    *
    * Scale: one map-side-combinable rollup to O(#users × #types) counts,
    * then the rank-filter window partitioned by type over that already-
    * aggregated table — the group-wise top-k shape every such read in the
    * engine uses (`top_terms_by_lang`). Counts are exact integers; ties
    * break on user_id so ranks never depend on float or scan order. */
  def heavyHitters(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    Catalog.events(spark, dir)
      .groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("n_events"))
      // cast: Spark's row_number is INT, DuckDB's BIGINT — the driver
      // compares schemas
      .withColumn("rnk", row_number().over(
        Window.partitionBy("event_type")
          .orderBy(desc("n_events"), col("user_id"))).cast("long"))
      .where(col("rnk") <= k)
      .select("event_type", "rnk", "user_id", "n_events")
      .orderBy("event_type", "rnk")

  /** JSON property extraction from the `props` column (`{"k": 87}`-shaped),
    * aggregated per event type. `get_json_object` is codegen'd; no UDF. */
  def jsonProps(spark: SparkSession, dir: String): DataFrame =
    Catalog.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count("k").as("n"),
           q6(avg("k")).as("avg_k"),
           min("k").as("min_k"),
           max("k").as("max_k"))
      .orderBy("event_type")

  /** TIME-WINDOWED ordered funnel (the ClickHouse `windowFunnel`
    * semantic): like [[funnel]]'s first-reach cascade, but a later stage
    * only counts if it lands within `windowSeconds` of the user's
    * FIRST-stage time — "viewed, then clicked and purchased within a
    * day", the conversion-deadline read [[funnel]]'s unbounded cascade
    * cannot express.
    *
    * Scale: identical plan shape to [[funnel]] — one user-keyed
    * first-reach table per stage (each stage cascade executes once),
    * joins keyed on user_id (a user's events bound each group), final
    * single-row aggregate unpivoted without re-execution. Parity: times
    * are copied integers, the deadline is integer arithmetic. */
  def funnelWindowed(spark: SparkSession, dir: String,
                     stages: Seq[String] = Seq("view", "click", "purchase"),
                     windowSeconds: Long = 86400L): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val wNanos = windowSeconds * 1000000000L
    val e = Catalog.events(spark, dir)
      .select(col("user_id"), col("ts").as("s"), col("event_type"))
    val first = e.where(col("event_type") === stages.head)
      .groupBy("user_id").agg(min("s").as("t0"))
    val acc = stages.tail.zipWithIndex.foldLeft(first) {
      case (prev, (stage, i)) =>
        val cmp = if (stage == stages(i)) col("s") > col("pt")
                  else col("s") >= col("pt")
        val rk = e.where(col("event_type") === stage)
          .join(prev.select(col("user_id"), col(s"t$i").as("pt"),
            col("t0").as("w0")), "user_id")
          .where(cmp && col("s") <= col("w0") + wNanos)
          .groupBy("user_id").agg(min("s").as(s"t${i + 1}"))
        prev.join(rk, Seq("user_id"), "left")
    }
    val counts = acc.agg(
      stages.indices.map(i => count(col(s"t$i")).as(s"c$i")).head,
      stages.indices.map(i => count(col(s"t$i")).as(s"c$i")).tail: _*)
    val rows = stages.zipWithIndex.map { case (stage, i) =>
      struct(lit(i.toLong).as("stage_idx"), lit(stage).as("stage"),
        col(s"c$i").as("users"))
    }
    counts.select(explode(array(rows: _*)).as("r"))
      .select(col("r.stage_idx"), col("r.stage"), col("r.users"))
      .orderBy("stage_idx")
  }

  /** Events-per-user SKEW histogram — the whale-user observability read
    * that justifies (or retires) the pre-bucketed sessionize/as-of
    * plans: per-user event counts rolled into power-of-two buckets with
    * each bucket's population and extremes. An operator reads the top
    * bucket's `max_events` against the per-partition row budget before
    * choosing the skew-safe plan.
    *
    * Scale: one map-side-combinable groupBy(user) to O(#users), then an
    * O(log max) histogram rollup. Parity: the bucket is
    * `len(bin(n)) − 1` = ⌊log2 n⌋ computed on the INTEGER's binary
    * string — never floating log2, whose value at power-of-two
    * boundaries differs between a ln-ratio and a native log2
    * implementation. */
  def userActivityHist(spark: SparkSession, dir: String): DataFrame =
    Catalog.events(spark, dir)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .withColumn("bucket", (length(bin(col("n"))) - 1).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_users"),
           min("n").as("min_events"), max("n").as("max_events"))
      .orderBy("bucket")

  /** RFM SEGMENTATION — the product-analytics staple: every user scored
    * by Recency (last activity), Frequency (event count), and Monetary
    * (purchase value mass), each quartiled, rolled to the segment-cell
    * population matrix (the "champions / at-risk / hibernating" grid a
    * lifecycle campaign reads).
    *
    * Scale: events collapse FIRST to the O(#users) per-user summary
    * (map-side combinable); the three `ntile` windows run over THAT
    * table — a spillable global sort of user summaries, never event
    * data (the same sort-spills-never-buffers contract as the quantile
    * core; a per-dimension threshold+broadcast form would trade one
    * sort for another). Parity: recency/frequency are exact integers,
    * monetary sums INTEGER MICRO-UNITS, and every ntile orders on
    * (value, user_id) — a total order, so both engines assign identical
    * quartiles. */
  def eventsRfm(spark: SparkSession, dir: String,
                buckets: Int = 4): DataFrame = {
    val sec = expr("ts div 1000000000")
    val per = Catalog.events(spark, dir)
      .select(col("user_id"), sec.as("s"), col("event_type"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("vm"))
      .groupBy("user_id")
      .agg(max("s").as("recency_s"),
           count(lit(1)).as("frequency"),
           sum(when(col("event_type") === "purchase", col("vm"))
             .otherwise(0L)).as("monetary_micro"))
    def quart(c: String) = ntile(buckets).over(
      Window.orderBy(col(c), col("user_id"))).cast("long")
    per
      .withColumn("r_q", quart("recency_s"))
      .withColumn("f_q", quart("frequency"))
      .withColumn("m_q", quart("monetary_micro"))
      .groupBy("r_q", "f_q", "m_q")
      .agg(count(lit(1)).as("n_users"),
           (sum("monetary_micro").cast("double") / lit(1e6))
             .as("segment_value"))
      .orderBy("r_q", "f_q", "m_q")
  }

  /** Event-type CO-OCCURRENCE matrix — for every unordered type pair,
    * how many (user, day) activity cells saw BOTH types, with each
    * type's own cell count and the resulting Jaccard affinity: the
    * "which behaviors travel together" read a funnel/bundling analysis
    * starts from (the session-free, day-bucketed complement of
    * [[transitions]]' ordered adjacency).
    *
    * Scale: events collapse FIRST to distinct (user, day, type) cells —
    * map-side combinable, O(users × days × types) ≪ events — and the
    * self-join keys on (user_id, day): each group is ≤ #types rows, so
    * the pair explosion is O(types²) per cell, bounded by the fixed
    * type vocabulary, never by event volume; the final rollup is
    * O(types²) rows. Parity: counts are exact integers; Jaccard is one
    * division of exact integers. */
  def eventCoOccurrence(spark: SparkSession, dir: String): DataFrame = {
    val day = expr("ts div 1000000000 div 86400")
    val cells = Catalog.events(spark, dir)
      .select(col("user_id"), day.as("day"), col("event_type"))
      .distinct()
    val perType = cells.groupBy("event_type")
      .agg(count(lit(1)).as("n_cells"))
    val pairs = cells.as("a")
      .join(cells.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.day") === col("b.day") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
               col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(perType.select(col("event_type").as("type_a"),
        col("n_cells").as("n_a"))), "type_a")
      .join(broadcast(perType.select(col("event_type").as("type_b"),
        col("n_cells").as("n_b"))), "type_b")
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_both"),
        q6(col("n_both") * lit(1.0) /
          (col("n_a") + col("n_b") - col("n_both"))).as("jaccard"))
      .orderBy("type_a", "type_b")
  }

  /** PageRank centrality over the event-type TRANSITION graph (damping
    * 0.85, `iters` fixed power iterations): which states anchor user
    * journeys — the graph view of [[transitions]]' Markov matrix, and the
    * standard importance read over any behavioral state graph.
    *
    * Scale shape: the DISTRIBUTED work is the edge-count aggregation
    * ([[transitions]] — one window pass + one map-side-combinable
    * groupBy over the full stream). The graph itself is event-TYPE keyed
    * — O(types²) edges, metadata-cardinality by construction (the same
    * contract as probe-cell literals and retention-config collects) — so
    * the power iteration runs on collected longs, never on a
    * per-event relation; at any corpus size the collect is bounded by
    * the type vocabulary, not the data.
    *
    * Parity: pure integer arithmetic end to end — rank mass in 1e-9
    * units, per-edge contribution `(p_u · c_uv) div d_u` (floor division;
    * p ≤ 1e9 and counts ≤ ~1e9 keep the product inside a long), damped
    * update `base + (85 · Σ) div 100` — so the unrolled-CTE oracle
    * reproduces every iteration bit-for-bit; dangling-state mass decays
    * (identically in both engines) rather than redistributing. */
  def eventPagerank(spark: SparkSession, dir: String,
                    iters: Int = 15): DataFrame = {
    val Scale = 1000000000L
    val edges = transitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nodes = Catalog.events(spark, dir).select("event_type").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val n = nodes.length.toLong
    val outDeg = edges.groupBy(_._1).map { case (u, es) =>
      u -> es.map(_._3).sum }
    val base = (15L * Scale / 100) / n
    var p = nodes.map(_ -> Scale / n).toMap
    for (_ <- 1 to iters) {
      val in = scala.collection.mutable.Map(nodes.map(_ -> 0L): _*)
      for ((u, v, c) <- edges) in(v) += (p(u) * c) / outDeg(u)
      p = nodes.map(v => v -> (base + 85L * in(v) / 100)).toMap
    }
    import spark.implicits._
    nodes.map(v => (v, p(v))).toDF("event_type", "praw")
      .select(col("event_type"),
        q6(col("praw") / lit(1e9)).as("pr"))
      .orderBy("event_type")
  }

  /** Last-touch attribution: every purchase credited to the user's most
    * recent PRIOR `touches`-type event within `windowSec` (else `none`),
    * rolled up to purchases and revenue per channel — the marketing
    * read behind "which touchpoint drives conversions".
    *
    * Scale: ONE shuffle on user_id + one in-partition sort, with the
    * last touch carried by a running `last(..., ignoreNulls)` window —
    * O(n) per user, vs the naive per-purchase as-of join whose
    * purchase×touch fan-out is quadratic for whale users (the oracle
    * runs that naive form; the engine never does). The rollup is a
    * |channels|-key map-side-combinable aggregate. Parity: the prior
    * order is the total (s, event_id) order in both engines; revenue
    * sums exact micro-units (the standard decimal-half defense); a
    * latest-touch outside the window implies every older touch is too,
    * so filtering after argmax equals filtering before it. */
  def eventAttribution(spark: SparkSession, dir: String,
                       touches: Seq[String] = Seq("view", "click"),
                       windowSec: Long = 86400L): DataFrame = {
    val e = Catalog.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000000000").as("s"), col("value"))
    val w = Window.partitionBy("user_id").orderBy("s", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    e.withColumn("touch",
        last(when(col("event_type").isInCollection(touches),
          struct(col("s"), col("event_id"), col("event_type"))),
          ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .withColumn("channel",
        when(col("touch").isNotNull
          && col("s") - col("touch.s") <= windowSec,
          col("touch.event_type")).otherwise(lit("none")))
      .withColumn("vm", floor(col("value") * lit(1e6) + lit(0.5)).cast("long"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_purchases"),
        q6(sum("vm") / lit(1e6)).as("sum_value"))
      .orderBy("channel")
  }

  /** Top-k SESSION PATHS: the most common ordered event-type sequences
    * (first `maxSteps` events of each gap-delimited session, joined with
    * '>') — the sequence-mining read behind "what do users actually do",
    * the generalization of [[funnelStages]]' fixed funnel to discovered
    * paths.
    *
    * Determinism: steps are ordered by (s, event_id) — unique — and the
    * path string is assembled from an array_sort'ed (step, type) struct
    * list, so the aggregation never depends on row arrival order. Scale:
    * the per-user session windows are the [[sessionize]] shape; under
    * whale-user skew the [[sessionizePreBucketed]] (user, day) stage-1
    * substitutes for the session-id window unchanged (its output is
    * parity-pinned against the plain form). Paths are ≤ maxSteps tokens,
    * and the final count is a map-side-combinable groupBy on the bounded
    * path string + TakeOrdered(k). */
  def eventPathTopk(spark: SparkSession, dir: String,
                    gapSeconds: Long = 3600, maxSteps: Int = 8,
                    k: Int = 20): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("s", "event_id")
    val marked = Catalog.events(spark, dir)
      .select(col("user_id"), expr("ts div 1000000000").as("s"),
        col("event_id"), col("event_type"))
      .withColumn("new_session",
        when(lag("s", 1).over(w).isNull ||
          col("s") - lag("s", 1).over(w) > gapSeconds, 1).otherwise(0))
      .withColumn("session_id", sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("step", row_number().over(Window
        .partitionBy("user_id", "session_id").orderBy("s", "event_id")))
      .where(col("step") <= maxSteps)
    marked
      .groupBy("user_id", "session_id")
      .agg(concat_ws(">", transform(
        array_sort(collect_list(struct(col("step"), col("event_type")))),
        x => x("event_type"))).as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("path"))
      .limit(k)
  }

  /** EVENT-MIX DRIFT per day: KL divergence of each day's event-type mix
    * from the whole-corpus mix — "did today's traffic composition
    * actually change, or just its volume" (the event-side analog of
    * [[graft.operators.TextOps.sourceKl]], same integer micro-nat
    * contract: counts exact, sub-2^53 integer products inside one ln,
    * the day score rounded to integer micro-nats).
    *
    * Scale: one (day, type) map-side-combinable rollup (O(days × types)
    * rows), O(types) broadcast overall mix, O(1)-row grand total. */
  def eventMixDrift(spark: SparkSession, dir: String): DataFrame = {
    val dt = Catalog.events(spark, dir)
      .select(expr("(ts div 1000000000) div 86400").as("day"),
        col("event_type"))
      .groupBy("day", "event_type").agg(count(lit(1)).as("cd"))
    val overall = dt.groupBy("event_type").agg(sum("cd").as("cf"))
    val dayTot = dt.groupBy("day").agg(sum("cd").as("nd"))
    val grand = overall.agg(sum("cf").as("nn"))
    dt.join(broadcast(overall), "event_type")
      .join(dayTot, "day")
      .crossJoin(broadcast(grand))
      .groupBy("day")
      .agg(first("nd").as("n_events"),
        floor(sum(col("cd") * log((col("cd") * col("nn")).cast("double")
            / (col("nd") * col("cf")).cast("double")))
          / first("nd") * 1e6 + 0.5).cast("long").as("klu"))
      .select(col("day"), col("n_events"),
        q6(col("klu") / lit(1e6)).as("kl"))
      .orderBy("day")
  }

  /** Hour-of-day SEASONALITY profile per event type: the 24-slot daily
    * rhythm (count and within-type share) that [[SeriesOps
    * .seriesSeasonalDecompose]] extracts from one metric's grid, read
    * directly off the raw event stream for every type at once.
    *
    * Scale: one scan, one map-side-combinable (type, hour) count — 24 ×
    * |types| output rows; the share join is an O(|types|) broadcast. */
  def eventSeasonality(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Catalog.events(spark, dir)
      .select(col("event_type"),
        expr("pmod((ts div 1000000000) div 3600, 24)").as("hour"))
      .groupBy("event_type", "hour")
      .agg(count(lit(1)).as("n"))
    val totals = hourly.groupBy("event_type").agg(sum("n").as("tot"))
    hourly.join(broadcast(totals), "event_type")
      .select(col("event_type"), col("hour"), col("n"),
        q6(col("n") / col("tot")).as("share"))
      .orderBy("event_type", "hour")
  }

  /** Per-user lifetime-value DECILES: users ranked by exact micro-unit
    * purchase total, split into `buckets` ntile segments, each reported
    * with its population, value mass, and [min, max] span — the "which
    * decile carries the revenue" read.
    *
    * Parity: monetary totals stay integer micro-units until the closing
    * division; the ntile frame orders by (total, user_id) so bucket
    * boundaries are deterministic cross-engine (the [[eventsRfm]]
    * contract). Scale: one user-keyed aggregation, then one global
    * sort-based ntile window over O(#users) narrow rows — the same
    * documented spill-safe single-sort shape as RFM. */
  def userValueDeciles(spark: SparkSession, dir: String,
                       buckets: Int = 10): DataFrame = {
    val per = Catalog.events(spark, dir)
      .select(col("user_id"),
        // null-valued purchases contribute 0 (not NULL) so tvm is never
        // null and the ntile ordering can't hit engine-specific NULL
        // placement
        when(col("event_type") === "purchase" && col("value").isNotNull,
          floor(col("value") * lit(1e6) + lit(0.5)).cast("long"))
          .otherwise(0L).as("vm"))
      .groupBy("user_id")
      .agg(sum("vm").as("tvm"))
    per
      .withColumn("decile", ntile(buckets)
        .over(Window.orderBy(col("tvm"), col("user_id"))).cast("long"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_users"),
        q6(sum("tvm") / lit(1e6)).as("sum_value"),
        q6(min("tvm") / lit(1e6)).as("min_value"),
        q6(max("tvm") / lit(1e6)).as("max_value"))
      .orderBy("decile")
  }

  /** SPACE-SAVING GUARANTEE AUDIT — the batch, oracle-checked face of
    * the streaming heavy-hitter summary (Metwally, Agrawal & El Abbadi,
    * ICDT 2005; `StreamOps.heavyHitters`): the IDENTICAL pure fold
    * (`StreamOps.foldHeavyHitters`) replayed over the event stream in
    * deterministic per-shard arrival order (sorted (ts, event_id) — the
    * micro-batch order the streaming op would see), then every item the
    * THEOREM says must be summarized — true shard frequency strictly
    * above shardTotal / capacity — is checked against the summary:
    * `in_summary` (the presence guarantee) and `bracket_ok`
    * (count − err ≤ true ≤ count). The DuckDB oracle recomputes the
    * exact counts and the threshold set and pins both booleans to TRUE:
    * a space-saving implementation that ever under-summarizes or emits
    * a bad bracket hash-mismatches. Both checks are arrival-order
    * INVARIANTS, so the face is deterministic even where sort ties are
    * not.
    *
    * Scale: one shard-keyed shuffle + in-partition sort (exactly the
    * streaming op's state layout — shard entirely within one
    * partition), a map-side-combinable exact rollup, O(#shards)
    * broadcast totals, and an O(shards × capacity) broadcast summary
    * join. Unlike the exact rollup (O(#distinct) state), the audited
    * summary itself is constant-size — which is the claim being
    * audited. */
  def eventHeavyHittersApprox(spark: SparkSession, dir: String,
                              shards: Int = 4,
                              capacity: Int = 16): DataFrame = {
    import spark.implicits._
    // deterministic SKEW synthesis (the PII-injection trick): the
    // fixture's users are near-uniform, which would leave the
    // above-threshold set empty (a vacuous audit) — so every 5th user's
    // observations replicate 10×, giving each shard both real heavy
    // hitters (~9.5% share > 1/capacity) and an evicted tail (distinct
    // per shard > capacity). The oracle replays the same weights.
    val weighted = Catalog.events(spark, dir)
      .where(col("user_id").isNotNull)
      .select(pmod(col("user_id"), lit(shards)).cast("int").as("shard"),
        col("user_id").as("item"), col("ts"), col("event_id"),
        when(col("user_id") % 5 === 0, lit(10)).otherwise(lit(1)).as("k"))
    val summaries = weighted
      .select(col("shard"), col("item"), col("ts"), col("event_id"),
        explode(sequence(lit(1), col("k"))).as("rep"))
      .repartition(shards, col("shard"))
      .sortWithinPartitions("shard", "ts", "event_id", "rep")
      .select("shard", "item")
      .as[(Int, Long)]
      .mapPartitions { it =>
        // contiguous shard runs fold sequentially — the batch replay of
        // the streaming GroupState; a partition may hold several whole
        // shards (hash routing), never a fragment of one
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Int, Long, Long, Long)]
        var cur = Int.MinValue
        var m = Map.empty[Long, (Long, Long)]
        def flush(): Unit = if (cur != Int.MinValue)
          m.foreach { case (k, (c, e)) => out += ((cur, k, c, e)) }
        it.foreach { case (sh, item) =>
          if (sh != cur) { flush(); cur = sh; m = Map.empty }
          m = graft.streaming.StreamOps.foldHeavyHitters(
            m, Seq(item), capacity)
        }
        flush()
        out.iterator
      }
      .toDF("shard", "item", "appx", "err")
    val exact = weighted.groupBy("shard", "item")
      .agg(sum("k").as("exact_cnt"))
    val totals = weighted.groupBy("shard").agg(sum("k").as("n"))
    exact
      .join(broadcast(totals), "shard")
      .where(col("exact_cnt") * capacity > col("n"))
      .join(broadcast(summaries), Seq("shard", "item"), "left")
      .select(col("shard"), col("item"), col("exact_cnt"),
        col("appx").isNotNull.as("in_summary"),
        (col("appx").isNotNull && col("appx") - col("err") <= col("exact_cnt")
          && col("exact_cnt") <= col("appx")).as("bracket_ok"))
      .orderBy("shard", "item")
  }

  /** LINEAR-COUNTING distinct-user sketch audit (Whang et al. 1990) —
    * the third classic fixed-memory sketch next to the count-min
    * frequency audit (`sketch_cms_topk`) and the space-saving heavy
    * hitters: per event type, an `m`-slot bitmap over the md5 slot of
    * each user, emitted as (occupied slots, exact distinct users) so
    * the estimator's sufficient statistic is oracle-checked as exact
    * integers — the estimate itself, −m·ln(1 − n_set/m), is one libm
    * call the CONSUMER applies (cross-engine ln rounding is exactly
    * the half-boundary class the house convention forbids in
    * hash-compared columns; the spec checks estimate quality
    * driver-side instead).
    *
    * At `m` = 256 the cross-SF sweep exercises BOTH regimes of the
    * registered face: injective at sf0.001 (15 distinct users) and
    * colliding at the driver's sf0.01 (121 occupied slots for 150
    * users); the spec additionally drives a tiny m=8 bitmap for the
    * hard-collision path (the `sketch_cms_topk` width-16 pattern).
    * Scale: the production form keeps m bits per
    * group merged map-side; this formulation's `countDistinct(pos)`
    * shuffles ≤ m values per group regardless of corpus size, and the
    * exact side is the audit's contract, not the sketch's cost. The
    * slot hash is the oracle-reproducible md5 hex-slice decode. */
  def sketchLinearCount(spark: SparkSession, dir: String,
                        m: Int = 256): DataFrame =
    Catalog.events(spark, dir)
      .select(col("event_type"),
        col("user_id"),
        (conv(substring(md5(col("user_id").cast("string")), 1, 10), 16, 10)
          .cast("long") % m).as("pos"))
      .groupBy("event_type")
      .agg(countDistinct("pos").as("n_set"),
        countDistinct("user_id").as("exact_users"))
      .select(col("event_type"), lit(m.toLong).as("m_slots"),
        col("n_set"), col("exact_users"))
      .orderBy("event_type")

  /** HYPERLOGLOG distinct-user sketch audit (Flajolet et al. 2007) over
    * the rolling WAU window — the at-scale alternative [[activeUsers]]'
    * own scaladoc names for the sliding distinct: unlike the exact
    * (day, user) fan-out, an HLL union is ELEMENTWISE REGISTER MAX, so
    * the trailing-`window` sketch per day merges `window` fixed-size
    * daily sketches (O(days × m) fanned rows, m = 2^p registers)
    * instead of fanning every distinct user — the whole reason the
    * sketch exists.
    *
    * Emitted per (observed day, occupied register): the window-merged
    * register maximum as an EXACT INTEGER next to the day's exact
    * rolling distinct count — the estimator's sufficient statistic is
    * hash-oracled (the [[sketchLinearCount]] discipline) while the
    * `α_m·m²/Σ2^(−M_j)` estimate and its bias correction stay the
    * consumer's libm calls (cross-engine pow/ln rounding is the
    * half-boundary class the house convention bans from compared
    * columns; the spec checks estimate quality driver-side, counting
    * the `m − |rows|` unoccupied registers as zeros).
    *
    * Register index = 2 md5 hex digits of the user id mod m; rank =
    * leading-zero count of the NEXT 12 hex digits (48 hash bits) + 1,
    * decoded via pure string/integer ops (regexp `^0*` length + one
    * nibble CASE — never floating log2, whose rounding at powers of
    * two is engine-specific). Both collision regimes ride the cross-SF
    * sweep: at sf0.001 (15 users) registers hold ≤2 users, at sf0.01
    * (150 users) the per-register max genuinely folds multiple ranks.
    *
    * Scale: one distinct (day, user) rollup (map-side combinable), a
    * per-row hash decode, a (day, reg) max rollup — O(days × m) rows —
    * then the register fan-out is SKETCH-sized, never user-sized; the
    * exact side (the audit's contract, not the sketch's cost) reuses
    * [[activeUsers]]' bounded fan-out. */
  /** The HLL (register, rank) decode of `user_id` — one md5: register
    * index = first 2 hex digits mod m, rank = leading-zero count of the
    * NEXT 12 hex digits (48 bits) + 1 via pure string/integer ops
    * (regexp `^0*` length + one nibble CASE — never floating log2).
    * Shared by [[sketchHllUsers]] and [[sketchHllSetops]] so the hash
    * family cannot drift between the windowed and set-algebra faces. */
  private def hllRegRank(m: Long): (Column, Column) = {
    val hx = md5(col("user_id").cast("string"))
    val field = substring(hx, 3, 12)
    val lz = length(regexp_extract(field, "^0*", 0))
    val nzv = conv(field.substr(lz + lit(1), lit(1)), 16, 10).cast("int")
    val extra = when(nzv >= 8, 0).when(nzv >= 4, 1)
      .when(nzv >= 2, 2).otherwise(3)
    val rank = when(lz === 12, lit(49))
      .otherwise(lz * 4 + extra + 1).cast("long")
    ((conv(substring(hx, 1, 2), 16, 10).cast("long") % m), rank)
  }

  def sketchHllUsers(spark: SparkSession, dir: String, p: Int = 6,
                     window: Int = 7): DataFrame = {
    require(p >= 4 && p <= 8, s"register exponent p must be in [4,8]: $p")
    val m = 1L << p
    val du = Catalog.events(spark, dir)
      .select(expr("(ts div 1000000000) div 86400").as("day"),
        col("user_id"))
      .distinct()
    val (reg, rank) = hllRegRank(m)
    val daily = du
      .select(col("day"), reg.as("reg"), rank.as("rank"))
      .groupBy("day", "reg").agg(max("rank").as("rmax"))
    // sketch union over the trailing window: register-wise max of the
    // daily sketches — the O(days × m) fan-out, never O(days × users)
    val merged = daily
      .select(explode(sequence(col("day"), col("day") + (window - 1)))
        .as("day"), col("reg"), col("rmax"))
      .groupBy("day", "reg").agg(max("rmax").as("rank_max"))
    // exact trailing distinct (the audit column) + observed-day gate —
    // the activeUsers fan-out contract verbatim
    val wauExact = du
      .select(explode(sequence(col("day"), col("day") + (window - 1)))
        .as("day"), col("user_id"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("wau_exact"))
    val observed = du.select("day").distinct()
    merged
      .join(observed, "day")
      .join(wauExact, "day")
      .select(col("day"), lit(m).as("m_regs"), col("reg"),
        col("rank_max"), col("wau_exact"))
      .orderBy("day", "reg")
  }

  /** HLL SET-OPERATION audit — the register-algebra twin of
    * [[sketchKmvSetops]]'s theta face: per unordered event-type pair
    * (a < b), the two per-type register vectors and their UNION sketch
    * (elementwise register MAX — a lossless HLL merge, the property
    * the register family exists for: shard sketches combine into
    * exactly the sketch of the combined stream, which is why 1000
    * executors can each keep m registers and still answer a global
    * distinct). Intersections have NO register form — the consumer
    * estimates them by inclusion–exclusion over the three register
    * estimates — so the exact intersection (and union, and both
    * per-type distincts) ride alongside as the audit's contract.
    *
    * Emitted per (type_a, type_b, occupied register): the three exact
    * integer register maxima (0 = empty on that side) next to the
    * pair's four exact cardinalities; the `α_m·m²/Σ2^(−M_j)` estimates
    * stay the consumer's libm calls (the [[sketchHllUsers]]
    * discipline — the spec checks inclusion–exclusion quality
    * driver-side). Hash decode is the shared [[hllRegRank]] — the same
    * family as the windowed face, oracle-replayed digit for digit.
    *
    * Scale: per-type registers are an O(types × m) rollup off the
    * distinct (type, user) table (map-side combinable); the pair fan
    * is O(pairs × m) SKETCH rows — never user-shaped; only the exact
    * intersection (the audit contract, not the sketch's cost) joins
    * the distinct-membership table with itself, keyed on user. */
  def sketchHllSetops(spark: SparkSession, dir: String,
                      p: Int = 6): DataFrame = {
    require(p >= 4 && p <= 8, s"register exponent p must be in [4,8]: $p")
    val m = 1L << p
    val du = Catalog.events(spark, dir)
      .where(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id"))
      .distinct()
    val (reg, rank) = hllRegRank(m)
    val regs = du.select(col("event_type"), reg.as("reg"), rank.as("rank"))
      .groupBy("event_type", "reg").agg(max("rank").as("rmax"))
    val cnts = du.groupBy("event_type").agg(count(lit(1)).as("n"))
    val pairs = cnts.as("a").join(cnts.as("b"),
        col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
    val inter = du.as("x").join(du.as("y"),
        col("x.user_id") === col("y.user_id") &&
          col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("type_a"),
        col("y.event_type").as("type_b"))
      .agg(count(lit(1)).as("inter_exact"))
    // LEFT join + coalesce 0: a disjoint pair stays in the audit (the
    // r17-ADVICE sketch_ams_join contract)
    val exact = pairs.join(inter, Seq("type_a", "type_b"), "left")
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        coalesce(col("inter_exact"), lit(0L)).as("inter_exact"))
      .withColumn("union_exact",
        col("n_a") + col("n_b") - col("inter_exact"))
    val ra = pairs.select("type_a", "type_b")
      .join(regs.withColumnRenamed("event_type", "type_a")
        .withColumnRenamed("rmax", "rank_a"), Seq("type_a"))
    val rb = pairs.select("type_a", "type_b")
      .join(regs.withColumnRenamed("event_type", "type_b")
        .withColumnRenamed("rmax", "rank_b"), Seq("type_b"))
    ra.join(rb, Seq("type_a", "type_b", "reg"), "full")
      .select(col("type_a"), col("type_b"), col("reg"),
        coalesce(col("rank_a"), lit(0L)).as("rank_a"),
        coalesce(col("rank_b"), lit(0L)).as("rank_b"))
      .withColumn("rank_union", greatest(col("rank_a"), col("rank_b")))
      .join(exact, Seq("type_a", "type_b"))
      .select(col("type_a"), col("type_b"), lit(m).as("m_regs"),
        col("reg"), col("rank_a"), col("rank_b"), col("rank_union"),
        col("n_a"), col("n_b"), col("inter_exact"), col("union_exact"))
      .orderBy("type_a", "type_b", "reg")
  }

  /** DGIM SLIDING-WINDOW counting sketch audit (Datar, Gionis, Indyk &
    * Motwani 2002) — the classic TIME-WINDOWED counter completing the
    * sketch family (frequency: CMS/count-sketch/space-saving; distinct:
    * bitmap/register/order-statistic; quantile: sample/KLL; window:
    * THIS): per event type, O(log N) exponentially-sized buckets over
    * the arrival stream answer "how many events in the last W?" without
    * storing the window — the structure a 100 TB rolling-rate monitor
    * keeps per key where buffering a window is impossible.
    *
    * DGIM's maintenance is DETERMINISTIC (merge the two oldest
    * same-size buckets when a third appears), so the end-of-stream
    * state is a pure function of the arrival sequence — and with
    * every arrival a 1, a CLOSED FORM of N alone: sizes newest→oldest
    * are d_j buckets of 2^j with digits d_j ∈ {1,2}, the unique such
    * representation (N − (2^(m+1)−1) in binary, offset by all-ones) —
    * so the state is computed RELATIONALLY, no sequential fold: digit
    * table from integer shifts (the max level via a 41-row broadcast
    * join, never floating log2 — engine-specific rounding at powers of
    * two is the banned class), bucket boundaries one running-sum
    * window, each bucket's newest-element timestamp one reverse-rank
    * join. Every emitted number is an exact integer.
    *
    * The window query is the audit: buckets whose newest timestamp
    * falls in the trailing `windowDays` contribute their full size
    * except the OLDEST such bucket (the only one that can straddle the
    * boundary — buckets partition the stream contiguously in time)
    * contributes half — `est = Σ size − oldest div 2` — next to the
    * exact windowed count; the DGIM guarantee |est − exact| ≤
    * oldest/2 (hence ≤ 50% relative) is spec-pinned. Scale: per-key
    * state is O(log N) rows; the rank window partitions by type; at
    * 100 TB the production form maintains buckets incrementally
    * per shard and merges by the same digit arithmetic. */
  def sketchDgimWindow(spark: SparkSession, dir: String,
                       windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"window must be positive: $windowDays")
    val wNs = windowDays.toLong * 86400L * 1000000000L
    val ev = Catalog.events(spark, dir)
      .select(col("event_type"), col("ts"), col("event_id"))
    val now = ev.agg(max("ts").as("now_ts"))
    val n = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
    // max populated level m = largest j with 2^(j+1)-1 <= N — a 41-row
    // broadcast join on integer shifts
    val js = spark.range(0, 41).select(col("id").cast("int").as("j"))
    val mTab = n.crossJoin(broadcast(js))
      .where(expr("shiftleft(1L, j + 1) - 1") <= col("n"))
      .groupBy("event_type").agg(max("j").as("m"))
    val buckets = n.join(mTab, "event_type")
      .withColumn("r", col("n") - expr("shiftleft(1L, m + 1) - 1"))
      .select(col("event_type"), col("n"), col("r"),
        explode(sequence(lit(0), col("m"))).as("j"))
      .withColumn("d", expr("1 + (shiftright(r, j) % 2)"))
      .withColumn("size", expr("shiftleft(1L, j)"))
      .select(col("event_type"), col("n"), col("j"), col("size"),
        explode(sequence(lit(1), col("d"))).as("c"))
    val wOrd = Window.partitionBy("event_type").orderBy("j", "c")
    val ob = buckets
      .withColumn("b_idx", row_number().over(wOrd).cast("long"))
      .withColumn("cum", sum("size").over(wOrd))
      .withColumn("rn", col("cum") - col("size") + 1)
    // each bucket's newest element: reverse-rank rn over (ts, event_id)
    val rk = ev.withColumn("rn", row_number().over(
        Window.partitionBy("event_type")
          .orderBy(col("ts").desc, col("event_id").desc)).cast("long"))
      .select(col("event_type"), col("rn"), col("ts").as("bucket_ts"))
    val bt = ob.join(rk, Seq("event_type", "rn"))
      .crossJoin(broadcast(now))
      .withColumn("window_start", col("now_ts") - wNs)
      .withColumn("in_window",
        (col("bucket_ts") > col("window_start")).cast("long"))
    val ag = bt.groupBy("event_type")
      .agg(expr("sum(CASE WHEN in_window = 1 THEN size ELSE 0 END) - " +
        "(max(CASE WHEN in_window = 1 THEN size ELSE 0 END) div 2)")
        .as("dgim_est"))
    val ex = ev.crossJoin(broadcast(now))
      .where(col("ts") > col("now_ts") - wNs)
      .groupBy("event_type").agg(count(lit(1)).as("exact_window"))
    bt.join(ag, "event_type").join(ex, "event_type")
      .select(col("event_type"), col("b_idx"), col("size"),
        col("bucket_ts"), col("in_window"), col("n").as("n_total"),
        col("window_start"), col("exact_window"), col("dgim_est"))
      .orderBy("event_type", "b_idx")
  }

  // ——————————————— streaming batch-replay audits (§2.8) ————————————————

  /** The earliest-anchored greedy admission chain shared by
    * [[streamDedupReplay]] and [[streamAdmissionReplay]]: per key, the
    * (s, event_id)-sorted occurrence list folded left — an occurrence is
    * ADMITTED iff it lands strictly more than `horizonSec` after the
    * last admitted one (the first always is), every other occurrence is
    * a duplicate. This is the continuous-watermark limit of
    * `dropDuplicatesWithinWatermark` state (graft.streaming.StreamOps
    * .dedupExact): state for an admitted anchor is evicted exactly
    * `horizon` after its event time, and a re-arrival past eviction is
    * re-admitted — the same fixed point the micro-batched operator
    * approaches as batches shrink. The chain is inherently sequential
    * per key, so the TIME bound is O(per-key occurrence history) — the
    * [[sessionize]] window-sort bound, with the same whale-key
    * taxonomy — but the fold itself accumulates only the ANCHOR list
    * (one admitted event time per > horizon jump, so ≤ span/horizon + 1
    * entries regardless of how many occurrences a whale key packs into
    * the span); verdicts are then a per-occurrence `transform` against
    * that bounded list ([[admissionVerdicts]]). The earlier form
    * array_appended every occurrence's verdict inside the fold —
    * O(history²) array copying per whale key (the r17-ADVICE finding).
    *
    * The init anchor `-2·horizon − 10` keeps `acc.last + horizon`
    * strictly below any epoch-seconds value, so the first occurrence
    * always admits without a sentinel branch (and never overflows —
    * unlike a Long.MinValue anchor, which `+ horizon` would wrap). */
  private def anchorFold(horizonSec: Long) = expr(
    s"""aggregate(
       |  occ,
       |  named_struct(
       |    'last', CAST(${-2 * horizonSec - 10} AS BIGINT),
       |    'anch', CAST(array() AS ARRAY<BIGINT>)),
       |  (acc, x) -> IF(x.s > acc.last + $horizonSec,
       |    named_struct('last', x.s,
       |      'anch', array_append(acc.anch, x.s)),
       |    acc),
       |  acc -> acc.anch)""".stripMargin)

  /** Per-occurrence verdicts against the [[anchorFold]] anchor list:
    * an occurrence is the admitted one iff its event time IS an anchor
    * and it is the FIRST occurrence of that time in the sorted list
    * (admission is only ever possible at the head of an equal-`s` run —
    * after the head either advanced the anchor to `s` or was itself
    * inside the horizon, every later same-`s` occurrence fails the
    * strict `>` test). Anchors strictly increase by more than the
    * horizon, so anchor values are distinct and `array_contains` is
    * unambiguous; the scan is O(history × anchors) with the anchor list
    * span-bounded, never history-bounded. */
  private def admissionVerdicts = expr(
    """transform(
      |  occ,
      |  (x, i) -> named_struct(
      |    's', x.s, 'event_id', x.event_id,
      |    'admitted', array_contains(anch, x.s)
      |      AND (i = 0 OR occ[i - 1].s <> x.s)))""".stripMargin)

  /** WATERMARK-DEDUP BATCH REPLAY — the oracle-checked face of the
    * streaming exact-dedup state machine (graft.streaming.StreamOps
    * .dedupExact, `dropDuplicatesWithinWatermark`), replayed over the
    * event stream with key (user_id, event_type) and REAL event times:
    * the alert-dedup / notification-throttle pattern (emit at most one
    * event per key per `horizonSec`-anchored window, re-admit once the
    * anchor's watermark state would have been evicted). Every event is
    * emitted with its verdict, so the whole admission chain — drops
    * inside the horizon AND re-admissions past it, both branches live
    * at both SFs with the fixture's ~13 occurrences/key over ~30 days —
    * is hash-compared against a recursive-CTE oracle that re-derives
    * the greedy chain jump by jump. The claimed correspondence to the
    * LIVE operator is itself pinned: StreamOpsSpec drives a real
    * `dropDuplicatesWithinWatermark` query (delay = horizon/2, per-file
    * micro-batches, watermark given a batch to commit) and asserts its
    * admitted set equals this chain's.
    *
    * Scale: one shuffle on the dedup key + an in-partition sort into
    * the per-key fold ([[admissionFold]]) — the [[sessionize]] plan
    * shape with the same O(per-key history) bound; the streaming form
    * keeps O(live keys) state instead, which is the operator this
    * audits. */
  def streamDedupReplay(spark: SparkSession, dir: String,
                        horizonSec: Long = 172800): DataFrame =
    streamDedupReplayDf(
      Catalog.events(spark, dir)
        .where(col("user_id").isNotNull)
        .select(col("user_id"), col("event_type"),
          expr("ts div 1000000000").as("s"), col("event_id")),
      horizonSec)

  /** [[streamDedupReplay]] over an explicit (user_id, event_type, s,
    * event_id) DataFrame — the [[sessionizeDf]] convention, so the
    * property spec can drive the chain on arbitrary inputs. */
  def streamDedupReplayDf(e: DataFrame, horizonSec: Long): DataFrame = {
    require(horizonSec > 0, s"horizon must be positive: $horizonSec")
    e.groupBy("user_id", "event_type")
      .agg(sort_array(collect_list(struct(col("s"), col("event_id"))))
        .as("occ"))
      .withColumn("anch", anchorFold(horizonSec))
      .select(col("user_id"), col("event_type"),
        explode(admissionVerdicts).as("r"))
      .select(col("user_id"), col("event_type"), col("r.s").as("s"),
        col("r.event_id").as("event_id"), col("r.admitted").as("admitted"))
      .orderBy("user_id", "event_type", "s", "event_id")
  }

  /** STREAMING-ADMISSION BATCH REPLAY — the oracle-checked face of the
    * admission gate (graft.streaming.StreamOps.admissionGate): arrivals
    * are admitted iff their key matches neither the INDEXED history (a
    * batch-built static key table — the stream-static anti-join side)
    * nor an earlier admitted arrival inside the watermark horizon (the
    * [[streamDedupReplay]] chain). The index is the keys observed in
    * the first `indexDays` of the stream (day 0 = the stream's first
    * event day, derived in-query); everything after is the arriving
    * traffic, each event emitted with both verdicts (`in_index`, and
    * the final `admitted` = fresh key AND chain-admitted) so the
    * anti-join branch and both chain branches are all hash-compared.
    *
    * `indexDays` defaults to 3: with the fixture's ~13 occurrences/key
    * over ~30 days, ~(9/10)^13 ≈ 25% of keys never appear that early —
    * both index branches stay populated at every SF (a 20-day index
    * would swallow every key and turn the face vacuous).
    *
    * Scale: the index side reduces to distinct keys before an equi
    * anti-join (broadcast-able at production key cardinality, exactly
    * how the streaming gate plans its static side); the chain side is
    * [[streamDedupReplay]]'s bound. The one-row day-0 aggregate is a
    * broadcast, never a driver collect. */
  def streamAdmissionReplay(spark: SparkSession, dir: String,
                            horizonSec: Long = 172800,
                            indexDays: Int = 3): DataFrame = {
    require(indexDays > 0, s"indexDays must be positive: $indexDays")
    val e = Catalog.events(spark, dir)
      .where(col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"),
        expr("ts div 1000000000").as("s"), col("event_id"))
      .withColumn("day", expr("s div 86400"))
    val day0 = e.agg(min("day").as("day0"))
    val withCut = e.crossJoin(broadcast(day0))
    val index = withCut.where(col("day") < col("day0") + indexDays)
      .select("user_id", "event_type").distinct()
    val stream = withCut.where(col("day") >= col("day0") + indexDays)
    val chained = stream
      .groupBy("user_id", "event_type")
      .agg(sort_array(collect_list(struct(col("s"), col("event_id"))))
        .as("occ"))
      .withColumn("anch", anchorFold(horizonSec))
      .select(col("user_id"), col("event_type"),
        explode(admissionVerdicts).as("r"))
      .select(col("user_id"), col("event_type"), col("r.s").as("s"),
        col("r.event_id").as("event_id"),
        col("r.admitted").as("chain_ok"))
    chained
      .join(index.withColumn("in_index", lit(true)),
        Seq("user_id", "event_type"), "left")
      .select(col("user_id"), col("event_type"), col("s"), col("event_id"),
        coalesce(col("in_index"), lit(false)).as("in_index"),
        (coalesce(col("in_index"), lit(false)) === false && col("chain_ok"))
          .as("admitted"))
      .orderBy("user_id", "event_type", "s", "event_id")
  }

  /** WATERMARK-LATENESS AUDIT — how many events a given watermark delay
    * would drop, under an arrival process with BOUNDED DISORDER: the
    * question every `withWatermark` delay choice answers (graft
    * .streaming.StreamOps ingest/sessionize faces). The fixture's
    * events arrive in perfect event-time order (zero lateness — a
    * vacuous audit), so arrival order is synthesized deterministically
    * as `s + jitter` with jitter = md5(event_id) mod 2·disorder −
    * disorder (the PII-injection discipline: the oracle replays the
    * same displacement); the replay then walks arrivals in (arrival,
    * event_id) order, maintains the running max event time (the
    * watermark authority), and flags an event LATE iff its event time
    * has fallen more than `delaySec` behind it. Emitted per event:
    * both times, the lateness magnitude (0 when on time), and the
    * verdict — the on-time and late branches are both live at both SFs
    * (disorder ±2 d vs delay 1 d).
    *
    * Scale: the replay is one global ordered scan (a single watermark
    * authority is SEQUENTIAL by definition — the streaming engine pays
    * the same serialization at its driver); the face carries the house
    * O(render-window) single-window taxonomy, and the production form
    * shards the running max per ingest partition exactly as Spark's
    * per-partition watermark tracking does before the global min. */
  def streamLateEvents(spark: SparkSession, dir: String,
                       disorderSec: Long = 172800,
                       delaySec: Long = 86400): DataFrame = {
    require(disorderSec > 0 && delaySec > 0,
      s"disorder/delay must be positive: $disorderSec, $delaySec")
    val jitter =
      conv(substring(md5(col("event_id").cast("string")), 1, 10), 16, 10)
        .cast("long") % (2 * disorderSec) - disorderSec
    val w = Window.orderBy("arr", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Catalog.events(spark, dir)
      .select(col("event_id"), expr("ts div 1000000000").as("s"))
      .withColumn("arr", col("s") + jitter)
      .withColumn("late_by",
        greatest(lit(0L), coalesce(max("s").over(w) - delaySec - col("s"),
          lit(0L))))
      .select(col("event_id"), col("s"), col("arr"), col("late_by"),
        (col("late_by") > 0).as("late"))
      .orderBy("arr", "event_id")
  }

  /** TOKEN-BUCKET RATE-LIMIT REPLAY — the second stateful streaming
    * machine in the replay-audit family (after the fixed-horizon
    * [[streamDedupReplay]] chain): per key (user_id, event_type), a
    * bucket holding up to `burstTokens` admits a burst, drains one
    * token per admission, and refills continuously at one token per
    * `refillSec` — the standard throttling state a streaming gate
    * (mapGroupsWithState) would keep per key. All arithmetic is EXACT
    * MILLI-TOKEN integers (refill = Δs·1000 div refillSec — floor
    * division, identical in both engines), so the post-decision
    * balance is hash-compared next to the verdict for every event.
    * The uniform fold starts from a full bucket with a sentinel
    * last-arrival of −1 (the first refill saturates at the cap, so no
    * first-row branch exists to drift).
    *
    * Scale: the [[streamDedupReplay]] plan — one key shuffle, one
    * in-partition sort into the per-key builtin-`aggregate` fold,
    * O(per-key history) memory; the live form keeps two longs per key.
    * The oracle is a LINEAR recursive CTE (rn → rn+1), the simplest
    * shape in the replay family. */
  def streamRateLimitReplay(spark: SparkSession, dir: String,
                            burstTokens: Int = 2,
                            refillSec: Long = 86400): DataFrame = {
    require(burstTokens >= 1 && refillSec > 0,
      s"bad bucket params: $burstTokens, $refillSec")
    val cap = burstTokens * 1000L
    val fold = expr(
      s"""aggregate(
         |  occ,
         |  named_struct(
         |    'last', CAST(-1 AS BIGINT), 'tok', CAST($cap AS BIGINT),
         |    'out', CAST(array() AS ARRAY<STRUCT<
         |      s: BIGINT, event_id: BIGINT, tok: BIGINT,
         |      admitted: BOOLEAN>>)),
         |  (acc, x) -> named_struct(
         |    'last', x.s,
         |    'tok', IF(least($cap, acc.tok + ((x.s - acc.last) * 1000)
         |                 div $refillSec) >= 1000,
         |              least($cap, acc.tok + ((x.s - acc.last) * 1000)
         |                 div $refillSec) - 1000,
         |              least($cap, acc.tok + ((x.s - acc.last) * 1000)
         |                 div $refillSec)),
         |    'out', array_append(acc.out, named_struct(
         |      's', x.s, 'event_id', x.event_id,
         |      'tok', IF(least($cap, acc.tok + ((x.s - acc.last) * 1000)
         |                   div $refillSec) >= 1000,
         |                least($cap, acc.tok + ((x.s - acc.last) * 1000)
         |                   div $refillSec) - 1000,
         |                least($cap, acc.tok + ((x.s - acc.last) * 1000)
         |                   div $refillSec)),
         |      'admitted', least($cap, acc.tok + ((x.s - acc.last) * 1000)
         |                     div $refillSec) >= 1000))),
         |  acc -> acc.out)""".stripMargin)
    Catalog.events(spark, dir)
      .where(col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"),
        expr("ts div 1000000000").as("s"), col("event_id"))
      .groupBy("user_id", "event_type")
      .agg(sort_array(collect_list(struct(col("s"), col("event_id"))))
        .as("occ"))
      .select(col("user_id"), col("event_type"), explode(fold).as("r"))
      .select(col("user_id"), col("event_type"), col("r.s").as("s"),
        col("r.event_id").as("event_id"),
        col("r.tok").as("tokens_milli"),
        col("r.admitted").as("admitted"))
      .orderBy("user_id", "event_type", "s", "event_id")
  }

  /** PROVISIONED-AT-MEAN BACKLOG REPLAY — consumer-lag observability
    * for a windowed streaming pipeline: per event type, arrivals are
    * bucketed into tumbling `windowSec` windows over the stream's
    * GLOBAL window grid (gap windows count — an idle window is when
    * the consumer catches up), capacity = ⌈type total / #windows⌉ (the
    * classic utilization-1 provisioning: mean throughput exactly
    * covers mean load, so every burst leaves a backlog the quiet
    * windows must drain), and the Lindley recursion
    * `backlog = max(0, prev + arrivals − capacity)` rolls window by
    * window. Everything is exact integers; both regimes (backlogged
    * and drained windows) are live at both SFs.
    *
    * The recursion is evaluated through its CLOSED FORM (r18 — the r17
    * array_append fold copied the accumulator per grid step, O(grid²)
    * per type, the ADVICE finding): with the running net
    * S_t = Σ_{j≤t} (arrivals_j − capacity), the Lindley solution is
    * `backlog_t = S_t − min(0, min_{j≤t} S_j)` — two running window
    * passes over the per-type grid, exact integers, no per-type array
    * materialization at all.
    *
    * Scale: the windows run over the WINDOW GRID (O(#windows) per type,
    * one type-keyed shuffle + in-partition sort —
    * render-window-bounded, never event-bounded); arrivals reduce
    * map-side; bounds and capacities are one-row/O(#types) broadcast
    * aggregates, never driver collects. */
  def streamBacklogReplay(spark: SparkSession, dir: String,
                          windowSec: Long = 21600): DataFrame = {
    require(windowSec > 0, s"window must be positive: $windowSec")
    val base = Catalog.events(spark, dir)
      .where(col("user_id").isNotNull)
      .select(col("event_type"),
        expr(s"(ts div 1000000000) div $windowSec").as("w"))
    val bounds = base.agg(min("w").as("w0"), max("w").as("w1"))
    val grid = base.select("event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("w0"), col("w1"))).as("w"))
    val arrivals = base.groupBy("event_type", "w")
      .agg(count(lit(1)).as("arrivals"))
    val cap = base.groupBy("event_type")
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        expr("(n + (w1 - w0)) div (w1 - w0 + 1)").as("capacity"))
    val run = Window.partitionBy("event_type").orderBy("w")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(arrivals, Seq("event_type", "w"), "left")
      .select(col("event_type"), col("w"),
        coalesce(col("arrivals"), lit(0L)).as("arrivals"))
      .join(cap, "event_type")
      .withColumn("net_sum",
        sum(col("arrivals") - col("capacity")).over(run))
      .select(col("event_type"),
        (col("w") * windowSec).as("window_start"),
        col("arrivals"), col("capacity"),
        (col("net_sum") -
          least(lit(0L), min("net_sum").over(run))).as("backlog"))
      .orderBy("event_type", "window_start")
  }

  /** WATERMARKED-ROLLUP BATCH REPLAY — the oracle-checked face of the
    * LAST stateful §2.8 machine without one (r17-VERDICT item 4):
    * graft.streaming.StreamOps.windowedRollupXff's tumbling-window
    * emission replayed over the points store with a synthesized
    * bounded-disorder arrival process (the [[streamLateEvents]]
    * discipline — the fixture's points are event-time-ordered, so
    * arrival = ts + md5-jitter in ±`disorderSec`, replayed identically
    * by the oracle). The walk maintains the running max event time over
    * strictly-preceding arrivals (the single watermark authority);
    * an arriving point whose WINDOW END has fallen to or below
    * `watermark = running_max − delaySec` is DROPPED (its window's
    * state was evicted — Spark's late-row rule for windowed
    * aggregation, taken in the continuous limit); survivors aggregate
    * per (metric, window) with the batch tier's exact contract (known
    * count, per-metric method dispatch, q6 display quantization), and
    * the xFilesFactor gate splits finalized windows into EMITTED
    * (value carried) and SUPPRESSED (verdict row, null value — the
    * audit view; the live operator emits only gated rows). A window
    * whose every point arrived late never materializes state and emits
    * nothing, exactly as the streaming operator.
    *
    * All four regimes are live at BOTH SFs at the registered
    * configuration (12 h windows, expected = 12 fine points): emitted
    * and suppressed windows (sparse sf0.001 days mostly fail xff 0.5
    * while their denser halves pass; day-sized windows would leave
    * sf0.001 all-suppressed), on-time and late-dropped points
    * (disorder 12 h vs delay 6 h — only a window's tail points can
    * drop, and only under adversarial jitter alignment). The
    * correspondence to the LIVE windowed operator is
    * suite-pinned: StreamOpsSpec drives a real watermarked Append-mode
    * query over per-file micro-batches and asserts its emissions equal
    * this replay's (gaps kept far from the eviction boundary, the
    * dedup-pin discipline).
    *
    * Scale: the replay is one global ordered scan (the
    * [[streamLateEvents]] single-watermark-authority serialization —
    * O(render-window), sharded per ingest partition in the production
    * form) + one (metric, window) rollup on the batch tier's own
    * shuffle key; the metadata join is an O(#metrics) broadcast. */
  def streamRollupReplay(spark: SparkSession, dir: String,
                         fineStep: Long = 3600, coarseStep: Long = 86400,
                         disorderSec: Long = 43200,
                         delaySec: Long = 21600): DataFrame = {
    require(coarseStep % fineStep == 0,
      s"coarse step $coarseStep must be a multiple of fine step $fineStep")
    require(disorderSec > 0 && delaySec > 0,
      s"disorder/delay must be positive: $disorderSec, $delaySec")
    val expected = (coarseStep / fineStep).toDouble
    val meta = Catalog.metricsMeta(spark)
      .select(col("metric"), col("aggregationMethod").as("method"),
        col("xFilesFactor").as("xff"))
    val jitter =
      conv(substring(md5(concat_ws(":", col("metric"), col("ts"))), 1, 10),
        16, 10).cast("long") % (2 * disorderSec) - disorderSec
    val wPrev = Window.orderBy("arr", "metric", "ts")
      .rowsBetween(Window.unboundedPreceding, -1)
    val walked = Catalog.pointsCached(spark, dir)
      .where(col("step") === fineStep)
      .select(col("metric"), col("ts"), col("value"))
      .withColumn("arr", col("ts") + jitter)
      .withColumn("wm", max("ts").over(wPrev) - delaySec)
      .withColumn("w", col("ts") - pmod(col("ts"), lit(coarseStep)))
      .withColumn("dropped",
        col("wm").isNotNull && col("w") + coarseStep <= col("wm"))
    // survivor-masked columns: every aggregate below ignores nulls, so
    // the rollup sees exactly the non-late points (max_by skips null
    // ordering keys — the Spark/DuckDB arg_max contract)
    val sv = when(!col("dropped"), col("value"))
    val sts = when(!col("dropped"), col("ts"))
    val dispatch =
      when(col("method") === "average", col("v_avg"))
        .when(col("method") === "sum", col("v_sum"))
        .when(col("method") === "min", col("v_min"))
        .when(col("method") === "max", col("v_max"))
        .otherwise(col("v_last"))
    walked.join(broadcast(meta), "metric")
      .groupBy("metric", "w")
      .agg(first("method").as("method"), first("xff").as("xff"),
        sum(when(col("dropped"), 1L).otherwise(0L)).as("n_late_dropped"),
        count(sv).as("known"),
        q6(avg(sv)).as("v_avg"), q6(sum(sv)).as("v_sum"),
        min(sv).as("v_min"), max(sv).as("v_max"),
        max_by(sv, sts).as("v_last"))
      .where(col("known") >= 1) // an all-late window never held state
      .withColumn("emitted", col("known") / expected >= col("xff"))
      .select(col("metric"), col("w").as("window_start"),
        col("n_late_dropped"), col("known"), col("emitted"),
        when(col("emitted"), dispatch).as("value"))
      .orderBy("metric", "window_start")
  }

  // ————————————————————— KMV / theta distinct sketches —————————————————————

  /** The shared AMS sign-sketch rows behind [[sketchAmsF2]] and
    * [[sketchAmsJoin]]: per (event_type, sketch row j), the signed
    * frequency sum S_j = Σ_u sign_j(u)·count(u) with sign_j(u) =
    * 1 − 2·(md5 hex digit j mod 2) ∈ {−1, +1} — one exact integer per
    * cell, merged map-side (a SUM), O(#types × rows) memory regardless
    * of stream size: the fixed-memory claim the audits check. */
  private def amsRows(spark: SparkSession, dir: String,
                      rows: Int): (DataFrame, DataFrame) = {
    val c = Catalog.events(spark, dir)
      .where(col("user_id").isNotNull)
      .groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("cnt"))
    val s = c
      .select(col("event_type"), col("user_id"), col("cnt"),
        explode(sequence(lit(1), lit(rows))).as("j"))
      .withColumn("sgn",
        lit(1) - lit(2) *
          (conv(expr("substring(md5(cast(user_id as string)), j, 1)"),
            16, 10).cast("long") % 2))
      .groupBy("event_type", "j")
      .agg(sum(col("sgn") * col("cnt")).as("s_j"))
    (c, s)
  }

  /** AMS / TUG-OF-WAR second-moment sketch audit (Alon, Matias &
    * Szegedy 1996) — the FREQUENCY-MOMENT member of the sketch family,
    * and the one query optimizers use for self-join size estimation:
    * F2 = Σ count² is exactly E[S_j²] over ±1-signed frequency sums,
    * so a constant number of signed counters replaces the full
    * frequency vector. Per event type, every sketch row's signed sum
    * is emitted as an EXACT INTEGER next to the exact F2 (= the type's
    * self-join size on user_id); the mean-of-squares estimate stays
    * the consumer's arithmetic, spec-checked driver-side within factor
    * 3 at both SFs. Signs come from md5 hex-digit parity (digit j), so
    * the oracle replays the identical family.
    *
    * Scale: the sketch is a map-side-combinable SUM over O(#types ×
    * rows) cells — fixed memory, the claim being audited; the exact F2
    * side is the audit's contract, not the sketch's cost. */
  def sketchAmsF2(spark: SparkSession, dir: String,
                  rows: Int = 8): DataFrame = {
    require(rows >= 1 && rows <= 16, s"rows must fit one md5: $rows")
    val (c, s) = amsRows(spark, dir, rows)
    val f2 = c.groupBy("event_type")
      .agg(sum(col("cnt") * col("cnt")).as("f2_exact"))
    s.join(f2, "event_type")
      .select(col("event_type"), col("j").cast("long").as("j"),
        col("s_j"), col("f2_exact"))
      .orderBy("event_type", "j")
  }

  /** AMS JOIN-SIZE sketch audit — the inner-product extension of
    * [[sketchAmsF2]] (Alon et al. 1999): for frequency vectors a, b
    * over the same key domain, E[S_j(a)·S_j(b)] = Σ_u a_u·b_u — the
    * JOIN SIZE on user_id between two event types, estimated from two
    * constant-size sketches without touching either frequency vector:
    * the query-optimizer cardinality-estimation use case. Per
    * unordered type pair and sketch row, the per-row product is
    * emitted as an exact integer next to the exact join size; the
    * mean-of-products estimate stays consumer-side (factor-3
    * spec-checked at both SFs).
    *
    * Scale: the pair join runs over the SKETCH CELLS (O(#types ×
    * rows)), never the frequency vectors; only the exact audit column
    * pays the user-keyed self-join, and that cost is the audit's. */
  def sketchAmsJoin(spark: SparkSession, dir: String,
                    rows: Int = 8): DataFrame = {
    require(rows >= 1 && rows <= 16, s"rows must fit one md5: $rows")
    val (c, s) = amsRows(spark, dir, rows)
    val dots = s.as("a").join(s.as("b"),
        col("a.j") === col("b.j") &&
          col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"), col("a.j").as("j"),
        (col("a.s_j") * col("b.s_j")).as("dot_j"))
    val exact = c.as("x").join(c.as("y"),
        col("x.user_id") === col("y.user_id") &&
          col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("type_a"),
        col("y.event_type").as("type_b"))
      .agg(sum(col("x.cnt") * col("y.cnt")).as("join_exact"))
    // LEFT join (r18, the ADVICE fix): a type pair with zero shared
    // users has no exact row, but its sketch product is still an audited
    // statistic — the estimator must be seen near zero, not dropped
    dots.join(exact, Seq("type_a", "type_b"), "left")
      .select(col("type_a"), col("type_b"), col("j").cast("long").as("j"),
        col("dot_j"), coalesce(col("join_exact"), lit(0L)).as("join_exact"))
      .orderBy("type_a", "type_b", "j")
  }

  /** The shared bottom-k hash sample behind [[sketchKmvDistinct]] and
    * [[sketchKmvSetops]]: per group, the `k` smallest 40-bit md5 hashes
    * of the DISTINCT members, ranked (h, user_id) for determinism. The
    * per-type groups ride next to a `__all__` group so the union sketch
    * is audited from the same pass. */
  private def kmvBottomK(spark: SparkSession, dir: String,
                         k: Int): DataFrame = {
    val base = Catalog.events(spark, dir)
      .where(col("user_id").isNotNull)
    val u = base.select(col("event_type"), col("user_id")).distinct()
      .unionAll(base.select(lit("__all__").as("event_type"),
        col("user_id")).distinct())
    val h = conv(substring(md5(col("user_id").cast("string")), 1, 10), 16, 10)
      .cast("long")
    u.select(col("event_type"), col("user_id"), h.as("h"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("event_type").orderBy("h", "user_id")))
      .where(col("rnk") <= k)
  }

  /** KMV (k-minimum-values / bottom-k theta) DISTINCT sketch audit
    * (Bar-Yossef et al. 2002; the theta-sketch sample of Dasgupta et
    * al.) — the ORDER-STATISTIC distinct counter next to the bitmap
    * ([[sketchLinearCount]]) and register ([[sketchHllUsers]]) ones,
    * and the only one whose sketches support SET ALGEBRA
    * ([[sketchKmvSetops]]): per event type (plus the `__all__` union
    * group, audited from the same pass — a KMV union is just bottom-k
    * of the concatenated samples), the k smallest 40-bit md5 hashes of
    * the distinct users, every sample member emitted as an EXACT
    * INTEGER next to the group's exact distinct count. The estimator
    * `(k−1) / (kth_min / 2^40)` stays the consumer's division (the
    * [[sketchLinearCount]] discipline); the spec checks estimate
    * quality driver-side at a production k.
    *
    * k defaults to 8 so the sample SATURATES at both SFs (15 distinct
    * users per type at sf0.001) — an unsaturated KMV degenerates to the
    * exact set and audits nothing.
    *
    * Scale: one distinct rollup, a per-row hash, and a per-group top-k
    * window over ≤ |distinct| rows — at 100 TB the production form
    * keeps k values per group merged map-side (the mergeable-summary
    * contract this audits); the exact side is the audit's contract,
    * not the sketch's cost. */
  def sketchKmvDistinct(spark: SparkSession, dir: String,
                        k: Int = 8): DataFrame = {
    require(k >= 2, s"k must be at least 2: $k")
    val exact = Catalog.events(spark, dir)
      .where(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id")).distinct()
    val exactAll = exact.select(lit("__all__").as("event_type"),
      col("user_id")).distinct()
      .unionAll(exact)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("exact_users"))
    kmvBottomK(spark, dir, k)
      .join(exactAll, "event_type")
      .select(col("event_type"), col("rnk").cast("long").as("rnk"),
        col("h").as("h_min"), col("exact_users"))
      .orderBy("event_type", "rnk")
  }

  /** KMV / theta-sketch SET-OPERATION audit — the property that makes
    * the bottom-k family the production choice for distinct set algebra
    * (Dasgupta et al., "Theta sketch framework"): for every unordered
    * event-type pair, the intersection estimate's sufficient statistic.
    * θ = min(kth-min A, kth-min B) (the coarser sketch's inclusion
    * threshold, EXCLUSIVE — each sketch's retained sample is its k−1
    * hashes strictly below its own kth-min), and `n_common` = distinct
    * hashes below θ present in BOTH samples; the estimate
    * `n_common / (θ / 2^40)` stays the consumer's division. The exact
    * intersection cardinality rides alongside as the audit contract.
    * Every number is an exact integer from the same md5 decode as
    * [[sketchKmvDistinct]], so the whole statistic is hash-compared.
    *
    * Scale: the pair join runs over the SKETCHES (≤ k rows per group —
    * the whole point: set algebra over fixed-size summaries, never over
    * the underlying sets); only the exact audit column touches the
    * distinct member table, and that cost is the audit's, not the
    * sketch's. */
  def sketchKmvSetops(spark: SparkSession, dir: String,
                      k: Int = 8): DataFrame = {
    require(k >= 2, s"k must be at least 2: $k")
    val bk = kmvBottomK(spark, dir, k)
      .where(col("event_type") =!= "__all__")
    val kth = bk.groupBy("event_type").agg(max("h").as("kth"))
    val pairs = kth.as("a").join(kth.as("b"),
        col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"),
        least(col("a.kth"), col("b.kth")).as("theta"))
    // distinct (r18, the ADVICE fix): a 40-bit hash collision WITHIN one
    // sample would otherwise count with join multiplicity — the sketch
    // semantics count distinct hash VALUES below theta, once each
    val common = bk.as("x").join(bk.as("y"),
        col("x.h") === col("y.h") &&
          col("x.event_type") < col("y.event_type"))
      .select(col("x.event_type").as("type_a"),
        col("y.event_type").as("type_b"), col("x.h").as("h"))
      .distinct()
    val exact = Catalog.events(spark, dir)
      .where(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id")).distinct()
    val exactCommon = exact.as("x").join(exact.as("y"),
        col("x.user_id") === col("y.user_id") &&
          col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("type_a"),
        col("y.event_type").as("type_b"))
      .agg(count(lit(1)).as("exact_common"))
    pairs
      .join(common, Seq("type_a", "type_b"), "left")
      .groupBy("type_a", "type_b")
      .agg(max("theta").as("theta"),
        count(when(col("h") < col("theta"), 1)).as("n_common"))
      .join(exactCommon, Seq("type_a", "type_b"), "left")
      .select(col("type_a"), col("type_b"), col("theta"), col("n_common"),
        coalesce(col("exact_common"), lit(0L)).as("exact_common"))
      .orderBy("type_a", "type_b")
  }
}
