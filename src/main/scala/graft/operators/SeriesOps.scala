package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Catalog, Kernel}

/** The reference's full operator surface (SURVEY.md §2.1–§2.7), re-expressed
  * as declarative DataFrame plans so Catalyst gets predicate pushdown, column
  * pruning and map-side partial aggregation for free.
  *
  * Scale notes (100 TB): every operator here is a single scan + at most one
  * shuffle (groupBy on (metric, ts-bucket)) or one broadcast join against the
  * O(#metrics) metadata table. Time predicates reach the parquet scan
  * (min/max row-group pruning); nothing collects to the driver.
  */
object SeriesOps {

  import Catalog.Step

  /** Fixed query window used by the oracle-checked range queries:
    * [2024-01-05 00:00, 2024-01-12 00:00) UTC, step-aligned. */
  val From = 1704412800L
  val Until = 1705017600L

  /** `CeresTree.walk` (ceres.py ≈L125): enumerate all nodes. */
  def walkTree(spark: SparkSession, dir: String): DataFrame =
    Catalog.points(spark, dir).select("metric").distinct().orderBy("metric")

  /** `CeresTree.find` (ceres.py ≈L210): glob-pattern node resolution.
    * `*`/`?` match within one path segment (never across `.`). */
  def findGlob(spark: SparkSession, dir: String, glob: String): DataFrame =
    walkTree(spark, dir)
      .where(col("metric").rlike(Kernel.globToRegex(glob)))
      .orderBy("metric")

  /** `CeresTree.hasNode` (ceres.py ≈L165): existence test. */
  def hasNode(spark: SparkSession, dir: String, metric: String): DataFrame =
    Catalog.points(spark, dir)
      .where(col("metric") === metric)
      .agg((count(lit(1)) > 0).as("has_node"))

  /** `CeresNode.slice_info` / `readSlices` (ceres.py ≈L375, ≈L430): physical
    * extent per node — (start, end, step, point count). */
  def sliceInfo(spark: SparkSession, dir: String): DataFrame =
    Catalog.points(spark, dir)
      .groupBy("metric")
      .agg(lit(Step).as("step"),
           min("ts").as("start_ts"),
           (max("ts") + Step).as("end_ts"),
           count(lit(1)).as("npoints"))
      .orderBy("metric")

  /** `CeresNode.hasDataForInterval` (ceres.py ≈L455): overlap predicate
    * `(from < latestData) && (until > earliestData)`. */
  def hasDataInterval(spark: SparkSession, dir: String, metric: String,
                      from: Long, until: Long): DataFrame =
    Catalog.points(spark, dir)
      .where(col("metric") === metric)
      .agg(((min("ts") < until) && (max("ts") + Step > from)).as("has_data"))

  /** `CeresNode.read` (ceres.py ≈L470): THE core read — time-range scan of
    * one series. Bounds are floor-aligned (`from -= from%step`;
    * `until = until - until%step + step`). Returns sparse (ts, value) rows;
    * densification is a separate composable op. */
  def fetchRange(spark: SparkSession, dir: String, metric: String,
                 from: Long, until: Long): DataFrame = {
    val f = Kernel.align(from, Step)
    val u = Kernel.alignUntil(until - 1, Step) // already-aligned until stays put
    Catalog.points(spark, dir)
      .where(col("metric") === metric && col("ts") >= f && col("ts") < u)
      .select("ts", "value")
      .orderBy("ts")
  }

  /** Result densification (ceres.py CeresNode.read padding + TimeSeriesData
    * ≈L840): one row per grid point in [from, until), null where no data.
    * The grid side is `spark.range` (distributed, no driver materialization);
    * at scale the join is a broadcast of the (small) grid or, for huge
    * ranges, a shuffle on ts — either way a single join, no window. */
  def densifyGrid(spark: SparkSession, dir: String, metric: String,
                  from: Long, until: Long): DataFrame = {
    val f = Kernel.align(from, Step)
    val u = Kernel.alignUntil(until - 1, Step)
    val grid = spark.range(f, u, Step).toDF("ts")
    val pts = Catalog.points(spark, dir)
      .where(col("metric") === metric && col("ts") >= f && col("ts") < u)
      .select("ts", "value")
    grid.join(pts, Seq("ts"), "left").orderBy("ts")
  }

  /** The five aggregation methods over a series range (ceres.py `aggregate`
    * ≈L930–950). All skip nulls; `last` = value at max ts (ceres: last
    * non-None in time order). Rounded to 6 dp where re-association could
    * drift across engines. */
  def aggRange(spark: SparkSession, dir: String, method: String): DataFrame = {
    val base = Catalog.points(spark, dir)
      .where(col("ts") >= From && col("ts") < Until)
      .groupBy("metric")
    val agged = method match {
      case "average" => base.agg(round(avg("value"), 6).as("agg_value"))
      case "sum"     => base.agg(round(sum("value"), 6).as("agg_value"))
      case "min"     => base.agg(min("value").as("agg_value"))
      case "max"     => base.agg(max("value").as("agg_value"))
      case "last"    => base.agg(max_by(col("value"), col("ts")).as("agg_value"))
      case m => throw new IllegalArgumentException(s"Unknown aggregation method: $m")
    }
    agged.orderBy("metric")
  }

  /** `aggregateSeries` (ceres.py ≈L955): fixed-factor downsample. On the
    * dense aligned grid, positional chunks of factor = new/old are exactly
    * tumbling time buckets — a plain groupBy, fully map-side combinable. */
  def aggregateSeriesDf(spark: SparkSession, dir: String, metric: String,
                        method: String, newStep: Long): DataFrame = {
    val bucket = (col("ts") - pmod(col("ts"), lit(newStep))).as("ts")
    val base = Catalog.points(spark, dir)
      .where(col("metric") === metric && col("ts") >= From && col("ts") < Until)
      .groupBy(bucket)
    val agged = method match {
      case "average" => base.agg(round(avg("value"), 6).as("value"))
      case "sum"     => base.agg(round(sum("value"), 6).as("value"))
      case "min"     => base.agg(min("value").as("value"))
      case "max"     => base.agg(max("value").as("value"))
      case "last"    => base.agg(max_by(col("value"), col("ts")).as("value"))
      case m => throw new IllegalArgumentException(s"Unknown aggregation method: $m")
    }
    agged.orderBy("ts")
  }

  /** `TimeSeriesData.merge` (ceres.py ≈L870–888): point-wise coalesce with
    * self-precedence on the primary series' dense grid. */
  def mergeSeries(spark: SparkSession, dir: String, primary: String,
                  secondary: String, from: Long, until: Long): DataFrame = {
    val f = Kernel.align(from, Step)
    val u = Kernel.alignUntil(until - 1, Step)
    val pts = Catalog.points(spark, dir)
      .where(col("ts") >= f && col("ts") < u)
    val a = pts.where(col("metric") === primary).select(col("ts"), col("value").as("va"))
    val b = pts.where(col("metric") === secondary).select(col("ts"), col("value").as("vb"))
    spark.range(f, u, Step).toDF("ts")
      .join(a, Seq("ts"), "left")
      .join(b, Seq("ts"), "left")
      .select(col("ts"), coalesce(col("va"), col("vb")).as("value"))
      .orderBy("ts")
  }

  /** `CeresNode.compact` (ceres.py ≈L605–650) surfaced as a query: the
    * ingest-normalization result — align, drop nulls, last-wins per
    * (metric, aligned ts) by ingest order. This IS the canonical points
    * table; exposed so the oracle pins its semantics. */
  def compactDedup(spark: SparkSession, dir: String): DataFrame =
    Catalog.points(spark, dir).orderBy("metric", "ts")

  /** Multi-tier xFilesFactor rollup (plugins/maintenance/rollup.py
    * `node_found`/`do_rollup`): hourly → daily, per-metric aggregation
    * method dispatched from metadata, window emitted only when
    * known/expected >= xFilesFactor.
    *
    * Denominator: expected grid points per coarse window
    * (= coarseStep/fineStep = 24). The reference divides by fine datapoints
    * *observed* in NaN-padded slices, which equals the expected count within
    * a covered run; on our null-free compacted points the observed count
    * would make the gate vacuous, so expected-count is the faithful reading.
    *
    * Scale: one broadcast join (meta is O(#metrics)) + one shuffle on
    * (metric, day) with map-side partial aggregation. Method dispatch is a
    * codegen'd when-chain, not a per-method union of scans. */
  def xffRollup(spark: SparkSession, dir: String, coarseStep: Long): DataFrame = {
    val expected = (coarseStep / Step).toDouble
    val meta = Catalog.metricsMeta(spark)
      .select("metric", "aggregationMethod", "xFilesFactor")
    Catalog.points(spark, dir)
      .join(broadcast(meta), "metric")
      .withColumn("w", col("ts") - pmod(col("ts"), lit(coarseStep)))
      .groupBy("metric", "w")
      .agg(
        count("value").as("known"),
        first("aggregationMethod").as("method"),
        first("xFilesFactor").as("xff"),
        round(avg("value"), 6).as("v_avg"),
        round(sum("value"), 6).as("v_sum"),
        min("value").as("v_min"),
        max("value").as("v_max"),
        max_by(col("value"), col("ts")).as("v_last"))
      .where(col("known") / expected >= col("xff"))
      .select(col("metric"), col("w").as("ts"),
        when(col("method") === "average", col("v_avg"))
          .when(col("method") === "sum", col("v_sum"))
          .when(col("method") === "min", col("v_min"))
          .when(col("method") === "max", col("v_max"))
          .otherwise(col("v_last")).as("value"),
        col("known"))
      .orderBy("metric", "ts")
  }

  /** Retention expiry (`CeresSlice.deleteBefore` ≈L795, rollup.py's final
    * tier): rows surviving a cutoff. Side-effect-free summary form for the
    * oracle; the maintenance job (graft.streaming.Maintenance) applies it as
    * a partition-pruned rewrite. */
  def retentionDelete(spark: SparkSession, dir: String, cutoff: Long): DataFrame =
    Catalog.points(spark, dir)
      .where(col("ts") >= cutoff)
      .groupBy("metric")
      .agg(count(lit(1)).as("surviving"), min("ts").as("min_ts"))
      .orderBy("metric")
}
