package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The engine's catalog: maps the driver's parquet tables into the ceres
  * data model (SURVEY.md §1, FIXTURES.md §C).
  *
  * Reference mapping: a CeresTree (metric hierarchy root) becomes a parquet
  * dataset root; a CeresNode (one named series) becomes the set of rows with
  * a given `metric`; slice files become parquet row-groups with explicit
  * timestamps (`ceres.py` CeresSlice ≈L655; we trade implicit byte-offset
  * addressing for parquet min/max stats + predicate pushdown).
  *
  * At 100 TB the `points` dataset would be written partitioned by
  * (metric-bucket, day(ts)) so both metric predicates and time-range scans
  * prune partitions; `metrics_meta` stays small and broadcastable.
  */
object Catalog {

  /** Grid step for the events-derived series (seconds). */
  val Step = 3600L

  /** Read a raw driver table. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet carries nanosecond-precision timestamps, which Spark's
    * parquet reader rejects by default; read them as LONG nanoseconds and
    * derive epoch seconds with exact integer arithmetic (`ts div 1e9`),
    * matching the DuckDB oracle's `epoch_ns(ts) // 1000000000`. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
  }

  /** The canonical compacted points table: one row per (metric, aligned ts).
    *
    * Ceres stores exactly one float64 per grid cell per series; duplicate
    * writes to the same aligned timestamp are last-wins (`ceres.py`
    * CeresNode.compact ≈L605–650, write ≈L545). Ingest order here is
    * `event_id` (the events table's insertion order), so last-wins =
    * max_by(value, event_id) within each (metric, aligned_ts) group —
    * a single map-side-combinable aggregation, no window needed.
    *
    * Schema: metric STRING, ts LONG (epoch sec, aligned), value DOUBLE.
    */
  def points(spark: SparkSession, dir: String): DataFrame = {
    val sec = expr("ts div 1000000000")
    events(spark, dir)
      .select(
        concat(lit("events."), col("event_type")).as("metric"),
        (sec - pmod(sec, lit(Step))).as("ts"),
        col("value"), col("event_id"))
      .where(col("value").isNotNull)
      .groupBy("metric", "ts")
      .agg(max_by(col("value"), col("event_id")).as("value"))
  }

  /** Per-metric metadata (the `.ceres-node` JSON of the reference —
    * `ceres.py` CeresNode.readMetadata ≈L380). Inline and broadcastable:
    * at any scale this table is O(#metrics), never O(#points). */
  def metricsMeta(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("events.click", Step, "average", 0.5),
      ("events.error", Step, "max", 0.5),
      ("events.purchase", Step, "sum", 0.5),
      ("events.signup", Step, "last", 0.5),
      ("events.view", Step, "average", 0.5)
    ).toDF("metric", "timeStep", "aggregationMethod", "xFilesFactor")
      .withColumn("retentions",
        array(struct(lit(3600L).as("precision"), lit(720L).as("points")),
              struct(lit(86400L).as("precision"), lit(365L).as("points"))))
  }

  def documents(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")

  def embeddings(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings")
}
