package graft.core

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

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
  * prune partitions, and maintained materialized by the ingest job
  * (graft.streaming.Ingest) + maintenance (graft.streaming.Maintenance);
  * `metrics_meta` stays small and broadcastable. In this harness the
  * compacted view is derived from `events` on first use and persisted for
  * the session (the small-scale analog of that materialization).
  */
object Catalog {

  /** Grid step for the events-derived series (seconds). */
  val Step = 3600L

  /** Read a raw driver table. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** One-time session configuration, called by every entry point that
    * builds a session (Verify/Bench/Timeit/Maintenance mains, Engine.open,
    * the test base): events.parquet carries nanosecond-precision
    * timestamps, which Spark's parquet reader rejects unless
    * `nanosAsLong` is on. Set HERE, once at session build — not inside a
    * reader, where a global conf mutation on every call would be a side
    * effect hiding in a query path. */
  def configureSession(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // let AQE re-plan (coalesce tiny shuffles) INSIDE cached plans too —
    // off by default, which runs every shuffle under a persisted feature
    // table or iterative label table at full static width
    spark.conf.set(
      "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    // the store layout's `pd` partition dates and the pruned reader's
    // date literals both derive from to_date(timestamp_seconds(ts)) in
    // the SESSION timezone: pin it, or a writer and reader in different
    // zones disagree on date boundaries and a pruned read silently
    // misses boundary partitions
    spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  /** events.parquet with `ts` normalized to LONG NANOSECONDS, whatever
    * the generator wrote. The driver has produced this column as both
    * int64 nanoseconds (read as LONG via `nanosAsLong`, see
    * [[configureSession]]) and parquet `timestamp[us]` (read as
    * TIMESTAMP_NTZ); every downstream consumer derives epoch seconds by
    * exact integer arithmetic (`ts div 1e9`), matching the DuckDB
    * oracle's `epoch_ns(ts) // 1000000000` — which is schema-agnostic on
    * the DuckDB side, so normalizing HERE keeps both engines identical
    * without touching any oracle SQL. The NTZ→TIMESTAMP cast is safe
    * because [[configureSession]] pins the session timezone to UTC. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw
      case _ => raw.withColumn(
        "ts", expr("unix_micros(cast(ts as timestamp)) * 1000L"))
    }
  }

  /** The canonical compacted points table: one row per (metric, step,
    * aligned ts).
    *
    * Ceres stores exactly one float64 per grid cell per series; duplicate
    * writes to the same aligned timestamp resolve by the compact tuple sort
    * (`ceres.py` CeresNode.compact ≈L605–650 sorts (ts, value) pairs and
    * overwrites duplicates in order), so the MAX value survives —
    * `max(value)` per group, a single map-side-combinable aggregation.
    * [[Kernel.compact]] and the DuckDB oracle pin the same semantics.
    *
    * Schema: metric STRING, step LONG, ts LONG (epoch sec, aligned),
    * value DOUBLE. `step` makes the store multi-resolution-ready: rollup
    * output lands at coarser steps and the read path reconciles
    * (SeriesOps.fetchRange).
    */
  def points(spark: SparkSession, dir: String): DataFrame = {
    val sec = expr("ts div 1000000000")
    events(spark, dir)
      .select(
        concat(lit("events."), col("event_type")).as("metric"),
        (sec - pmod(sec, lit(Step))).as("ts"),
        col("value"))
      .where(col("value").isNotNull)
      .groupBy("metric", "ts")
      .agg(max("value").as("value"))
      .select(col("metric"), lit(Step).as("step"), col("ts"), col("value"))
  }

  /** Per-application DataFrame cache with persist: shared by the compacted
    * points view and the shingle index. Keyed by applicationId (stable for
    * a SparkContext's lifetime, never reused after GC — an identity hash
    * would be neither), so a restarted context can't see a dead entry. */
  private val dfCache = new ConcurrentHashMap[String, DataFrame]()

  private[graft] def appCached(spark: SparkSession, key: String)
                              (build: => DataFrame): DataFrame = {
    // no computeIfAbsent: builders call appCached for their own inputs, and
    // a nested computeIfAbsent on one CHM throws 'Recursive update'
    val k = s"${spark.sparkContext.applicationId}:$key"
    val existing = dfCache.get(k)
    if (existing != null) existing
    else {
      val built = build.persist(StorageLevel.MEMORY_AND_DISK)
      val prev = dfCache.putIfAbsent(k, built)
      if (prev != null) { built.unpersist(); prev } else built
    }
  }

  /** Session-persisted compacted points: every query in a Verify/Bench run
    * shares one compaction instead of re-deriving it (the harness analog
    * of the materialized points dataset an ingest job maintains at
    * scale). */
  def pointsCached(spark: SparkSession, dir: String): DataFrame =
    appCached(spark, s"points:$dir")(points(spark, dir))

  /** Observability over the engine's OWN session-cache layer — the
    * index-introspection contract (`index_stats`, `ivf_cell_stats`)
    * applied to the [[appCached]] feature tables, which were previously
    * the one layer the engine could not see (r11 VERDICT item 4): one
    * row per cached key with its configured storage level and
    * (optionally) its row count. `withCounts` runs one count() action
    * per table — an audit read, not a steady-state query. */
  def cacheStats(spark: SparkSession,
                 withCounts: Boolean = false): DataFrame = {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    val prefix = spark.sparkContext.applicationId + ":"
    dfCache.asScala.toSeq
      .collect { case (k, df) if k.startsWith(prefix) =>
        (k.stripPrefix(prefix), df.storageLevel.description,
          if (withCounts) df.count() else -1L)
      }
      .sortBy(_._1)
      .toDF("key", "storage_level", "rows")
  }

  /** The executor-side truth the CONFIGURED level cannot show: per-RDD
    * blocks actually cached, with memory and disk bytes — the probe for
    * storage-pressure demotion (a MEMORY_AND_DISK table whose blocks
    * sit on disk puts a spill read back into every consumer; an evicted
    * one re-executes its build). Driver-side metadata only — O(#cached
    * RDDs) rows at any scale. */
  def rddStorageInfo(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.sparkContext.getRDDStorageInfo.toSeq
      .map(i => (i.id, Option(i.name).getOrElse(""),
        i.numCachedPartitions, i.memSize, i.diskSize))
      .toDF("rdd_id", "name", "cached_partitions", "mem_bytes",
        "disk_bytes")
  }

  /** Per-metric metadata (the `.ceres-node` JSON of the reference —
    * `ceres.py` CeresNode.readMetadata ≈L380). Inline and broadcastable:
    * at any scale this table is O(#metrics), never O(#points). Catalog
    * enumeration (walk/find/hasNode) is served from HERE, never from a
    * points scan. */
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
