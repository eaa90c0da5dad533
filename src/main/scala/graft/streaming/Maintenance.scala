package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Catalog
import graft.operators.SeriesOps

/** Maintenance pass — the engine's `bin/ceres-maintenance` with the rollup
  * plugin (`plugins/maintenance/rollup.py` `node_found`/`do_rollup`) and the
  * defrag plugin (small-file compaction).
  *
  * Tier bands are computed from `metrics_meta.retentions` exactly as the
  * reference's `node_found`: anchored at "now", finest tier first —
  * `archiveEnd = t - t%precision; archiveStart = archiveEnd -
  * precision*points; t = archiveStart` — so tier k covers
  * [start_k, end_k) with end_k = start_{k-1}. Fine data older than its band
  * ("overflow") is rolled into the next coarser tier (xff-gated, per-metric
  * method), and data older than the last tier's band start is expired.
  *
  * Everything is a declarative transform over the points dataset; the only
  * driver-side materialization is the O(#tiers) retention config itself
  * (metadata, not data).
  */
object Maintenance {

  final case class Tier(precision: Long, points: Long)

  /** Now-anchored archive bands, finest first: (tier, start, end). */
  def bands(now: Long, tiers: Seq[Tier]): Seq[(Tier, Long, Long)] = {
    require(tiers.nonEmpty, "at least one retention tier required")
    var t = now
    tiers.map { tier =>
      val end = t - java.lang.Math.floorMod(t, tier.precision)
      val start = end - tier.precision * tier.points
      t = start
      (tier, start, end)
    }
  }

  /** One full maintenance pass over a points dataset: per adjacent tier
    * pair, roll the fine tier's overflow into the coarse tier (sequentially,
    * so cascades feed forward like the reference's in-order plugin pass),
    * then expire everything older than the last tier's band. Returns the
    * maintained dataset (schema: metric, step, ts, value).
    *
    * Each tier's result is `localCheckpoint`ed: the next tier consumes
    * `current` TWICE (the keep-filter and the overflow feeding the
    * rollup), so left unmaterialized the points subtree doubles per tier
    * — a T-tier ladder would scan the source 2^T times at scale. With
    * the per-tier materialization the source is scanned exactly twice
    * (tier 0's two consumers) and every later tier reads the previous
    * tier's blocks — the shape a maintenance pass that rewrites the
    * store wants anyway, and bounded by the store size per tier. */
  def maintain(points: DataFrame, meta: DataFrame, now: Long,
               tiers: Seq[Tier]): DataFrame = {
    val bs = bands(now, tiers)
    var current = points.select("metric", "step", "ts", "value")
    for (i <- 0 until tiers.length - 1) {
      val (tier, start, _) = bs(i)
      val coarse = tiers(i + 1)
      val overflow = current
        .where(col("step") === tier.precision && col("ts") < start)
      val rolled = SeriesOps
        .rollupTier(overflow, meta, tier.precision, coarse.precision)
        .select(col("metric"), lit(coarse.precision).as("step"),
          col("ts"), col("value"))
      current = current
        .where(!(col("step") === tier.precision && col("ts") < start))
        .unionByName(rolled)
        .localCheckpoint(true)
    }
    val (lastTier, lastStart, _) = bs.last
    current.where(!(col("step") === lastTier.precision && col("ts") < lastStart))
  }

  /** The catalog's distinct retention ladders, with the metrics carrying
    * each: (canonical-json key, tiers finest-first). The collect is
    * O(#distinct configs) — metadata, never data (a catalog with millions
    * of metrics still has a handful of retention policies). */
  def retentionConfigs(meta: DataFrame): Seq[(String, Seq[Tier])] =
    meta.select(to_json(col("retentions")).as("cfg"), col("retentions"))
      .groupBy("cfg").agg(first("retentions").as("retentions"))
      .collect()
      .map { row =>
        val tiers = row.getSeq[org.apache.spark.sql.Row](1)
          .map(r => Tier(r.getLong(0), r.getLong(1)))
          .sortBy(_.precision).toIndexedSeq
        (row.getString(0), tiers: Seq[Tier])
      }.toIndexedSeq

  /** The catalog's single retention ladder — for callers that NEED one
    * global config (e.g. deriving the harness's rollup tier pair).
    * Throws on a heterogeneous catalog rather than silently collapsing
    * the ladders into one wrong band set; per-node maintenance goes
    * through [[maintainPerNode]], which never assumes homogeneity
    * (the reference's `rollup.py node_found` is per-node). */
  def tiersFromMeta(meta: DataFrame): Seq[Tier] = {
    val configs = retentionConfigs(meta)
    require(configs.size == 1,
      s"catalog has ${configs.size} distinct retention configs; " +
        "tiersFromMeta needs a homogeneous catalog — use maintainPerNode")
    configs.head._2
  }

  /** Full maintenance with PER-NODE retention configs — the reference's
    * `rollup.py node_found` reads EACH node's own
    * `metadata['retentions']` and builds that node's archive bands.
    * Metrics are grouped by their retention ladder (O(#configs)
    * metadata); each group is maintained with its own bands via a
    * left-semi join against the group's metric set (meta is small — the
    * planner broadcasts it), and the groups union back together.
    * Metrics with an EMPTY retentions list have no archive bands and
    * pass through unmaintained (the reference skips nodes without
    * retention metadata). */
  def maintainPerNode(points: DataFrame, meta: DataFrame,
                      now: Long): DataFrame = {
    val base = points.select("metric", "step", "ts", "value")
    val grouped = retentionConfigs(meta).map { case (cfgJson, tiers) =>
      val metrics = meta
        .where(to_json(col("retentions")) === cfgJson)
        .select("metric")
      val group = base.join(metrics, Seq("metric"), "left_semi")
      if (tiers.isEmpty) group else maintain(group, meta, now, tiers)
    }
    // points for metrics absent from the catalog have no retention
    // metadata: pass through unmaintained, never silently dropped
    val unknown = base.join(meta.select("metric"), Seq("metric"), "left_anti")
    (grouped :+ unknown).reduce(_ unionByName _)
  }

  /** Metric hash buckets in the compacted store layout. At 100 TB metric
    * cardinality is unbounded, so the layout partitions on a BOUNDED hash
    * bucket of the metric (not the metric itself — millions of tiny
    * directories kill any file listing) × UTC date. A (metric, time-range)
    * read then prunes to one bucket × the overlapping dates before any
    * I/O — the Spark analog of ceres' newest-first slice scan early-exit
    * (ceres.py ≈L478–520: only slices overlapping the request are
    * opened). */
  val MetricBuckets = 16

  /** Driver-side metric → bucket, evaluated through the same Catalyst
    * `XxHash64` (seed 42) the executors' `xxhash64` runs — the reader's
    * literal bucket predicate is bit-identical to the writer's column. */
  def metricBucket(metric: String): Long = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    import org.apache.spark.sql.types.StringType
    val h = new XxHash64(Seq(Literal.create(metric, StringType)))
      .eval(InternalRow.empty).asInstanceOf[Long]
    java.lang.Math.floorMod(h, MetricBuckets.toLong)
  }

  /** Defrag analog (`plugins/maintenance/defrag.py`): physically compact a
    * points store — resolve cross-batch duplicates (max-value tie-break)
    * and rewrite PARTITIONED BY (metric bucket, UTC date), one well-sized
    * file per live partition (the repartition keys each (pb, pd) to one
    * task). Writes to `destDir`; an atomic swap at the catalog layer
    * replaces in-place rewrite. */
  def compactStore(spark: SparkSession, srcDir: String, destDir: String): Unit =
    Ingest.storeView(spark, srcDir)
      .withColumn("pb", pmod(xxhash64(col("metric")), lit(MetricBuckets.toLong)))
      .withColumn("pd", to_date(timestamp_seconds(col("ts"))))
      .repartition(col("pb"), col("pd"))
      .write.mode("overwrite").partitionBy("pb", "pd").parquet(destDir)

  /** Partition-pruned read of a [[compactStore]] layout: the bucket
    * equality and date-range predicates bind to the PARTITION columns, so
    * the scan lists and opens only `1/MetricBuckets` of the directories ×
    * the dates overlapping [from, until) — `PartitionFilters` in the plan,
    * pinned by PlanSpec. Row-level metric/ts predicates re-apply on top
    * (pushed to parquet row groups). Output schema = the points schema, so
    * this composes directly with `SeriesOps.fetchRangeFrom`. */
  def prunedRead(spark: SparkSession, storeDir: String, metric: String,
                 from: Long, until: Long): DataFrame =
    spark.read.parquet(storeDir)
      .where(col("pb") === metricBucket(metric) &&
        col("pd") >= to_date(timestamp_seconds(lit(from))) &&
        col("pd") <= to_date(timestamp_seconds(lit(until - 1))) &&
        col("metric") === metric && col("ts") >= from && col("ts") < until)
      .select("metric", "step", "ts", "value")

  /** CLI argument parsing, separated so the contract is testable without
    * a JVM exit: requires (srcDir, destDir, numeric nowEpochSec). */
  private[streaming] def parseArgs(args: Array[String]): Option[(String, String, Long)] =
    if (args.length < 3) None
    else scala.util.Try(args(2).toLong).toOption
      .map(now => (args(0), args(1), now))

  /** One maintenance pass over an ingested store directory: roll + expire
    * against the catalog's retention config, rewrite to `destDir`. */
  def run(spark: SparkSession, srcDir: String, destDir: String,
          now: Long): Unit = {
    val meta = Catalog.metricsMeta(spark)
    val pts = Ingest.storeView(spark, srcDir)
    maintainPerNode(pts, meta, now)
      .write.mode("overwrite").parquet(destDir)
  }

  /** Maintenance driver (the `bin/ceres-maintenance` entry point). Reuses
    * an already-active session when one exists (and then leaves it
    * running — embedding callers own their session's lifecycle); a
    * standalone invocation builds and stops its own. */
  def main(args: Array[String]): Unit = parseArgs(args) match {
    case None =>
      System.err.println(
        "usage: graft.streaming.Maintenance <srcDir> <destDir> <nowEpochSec>")
      sys.exit(2)
    case Some((srcDir, destDir, now)) =>
      val preexisting = SparkSession.getActiveSession
        .orElse(SparkSession.getDefaultSession)
      val spark = SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
        .config("spark.sql.shuffle.partitions",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      Catalog.configureSession(spark)
      try run(spark, srcDir, destDir, now)
      finally if (preexisting.isEmpty) spark.stop()
  }
}
