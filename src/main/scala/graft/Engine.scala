package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core
import graft.core.{Catalog, Kernel}
import graft.operators.SeriesOps
import graft.streaming.{Ingest, Maintenance}

/** The user-facing facade — the reference's `CeresTree` API
  * (`ceres.py` CeresTree: find ≈L210, fetch ≈L260, store ≈L245, hasNode
  * ≈L165, walk ≈L125) re-expressed over the Spark engine, so a user of the
  * reference can switch call-for-call:
  *
  * {{{
  * val tree = Engine.open(spark, "/data/tree")        // CeresTree(root)
  * tree.find("events.*")                              // tree.find(pattern)
  * tree.fetch("events.purchase", from, until)         // tree.fetch(path,…)
  * tree.store(pointsDf)                               // tree.store(path, datapoints)
  * tree.maintain(now)                                 // bin/ceres-maintenance
  * }}}
  *
  * Error contract: `fetch` of an unknown metric raises NodeNotFound
  * (reference ≈L190); a range with no data yields the all-null dense grid
  * (reference NoData → None-padding, ≈L530).
  */
final class Engine(val spark: SparkSession, val dir: String,
                   val metaDir: Option[String] = None,
                   val storeDir: Option[String] = None) {

  // user-built sessions get the engine's required confs at open time
  Catalog.configureSession(spark)

  /** The engine's points table: an ingested/maintained store directory
    * when `storeDir` is given (Engine.openStore — the real write→maintain→
    * read lifecycle), else the harness catalog derived from `dir`. All
    * reads below go through here, so a store-backed engine reconciles
    * multi-resolution history exactly like the harness-backed one. */
  def points: DataFrame =
    storeDir.map(Ingest.storeView(spark, _))
      .getOrElse(Catalog.pointsCached(spark, dir))

  /** The live node-metadata table: a mutable MetaStore when `metaDir` is
    * given (CeresTree.createNode-capable), else the harness's inline
    * catalog. */
  def meta: DataFrame =
    metaDir.map(core.MetaStore.read(spark, _))
      .getOrElse(Catalog.metricsMeta(spark))

  /** CeresTree.createNode / ceres-node-create: register (or update) a
    * node's metadata. Requires a MetaStore-backed engine. */
  def createNode(metric: String, timeStep: Long = Catalog.Step,
                 aggregationMethod: String = "average",
                 xFilesFactor: Double = 0.5,
                 retentions: Seq[core.MetaStore.Retention] = Seq.empty): Unit =
    core.MetaStore.put(spark, metaDirOrThrow, metric, timeStep,
      aggregationMethod, xFilesFactor, retentions)

  /** Remove a node (tombstone in the metadata log). */
  def deleteNode(metric: String): Unit =
    core.MetaStore.delete(spark, metaDirOrThrow, metric)

  /** CeresTree.createTree(**props): record tree-level properties
    * (`.ceres-tree/<prop>` files in the reference). */
  def createTree(props: Map[String, String] = Map.empty): Unit =
    core.MetaStore.createTree(spark, metaDirOrThrow, props)

  /** Resolved tree-level properties (last-writer-wins). */
  def treeProps: Map[String, String] =
    core.MetaStore.treeProps(spark, metaDirOrThrow)

  private def metaDirOrThrow: String =
    metaDir.getOrElse(throw new IllegalStateException(
      "createNode/deleteNode need a MetaStore-backed Engine (metaDir)"))

  /** CeresTree.walk: every node in the tree. */
  def walk(): DataFrame = meta.select("metric").orderBy("metric")

  /** CeresTree.find: glob-resolved nodes, optional data-interval filter
    * (reference `find(pattern, fromTime, untilTime)` via
    * hasDataForInterval). */
  def find(pattern: String, from: Option[Long] = None,
           until: Option[Long] = None): DataFrame =
    (from, until) match {
      case (None, None) =>
        meta.select("metric")
          .where(col("metric").rlike(Kernel.globToRegex(pattern)))
          .orderBy("metric")
      case _ => SeriesOps.findIntervalFrom(points, meta, pattern,
        from.getOrElse(Long.MinValue), until.getOrElse(Long.MaxValue))
    }

  /** CeresTree.hasNode. */
  def hasNode(metric: String): Boolean =
    meta.where(col("metric") === metric).limit(1).count() > 0

  /** CeresTree.fetch → CeresNode.read: the dense grid over the
    * reference-aligned window. Raises NodeNotFound for an unknown metric
    * (reference CeresTree.store/fetch contract ≈L245–270). */
  def fetch(metric: String, from: Long, until: Long): DataFrame = {
    if (!hasNode(metric))
      throw new NoSuchElementException(s"NodeNotFound: $metric")
    SeriesOps.densifyGridFrom(points, meta, metric, from, until)
  }

  /** Sparse read (no grid padding) — CeresNode.read before shaping. */
  def fetchSparse(metric: String, from: Long, until: Long): DataFrame =
    SeriesOps.fetchRangeFrom(points, meta, metric, from, until)

  /** Pattern read — every glob match densified onto its own grid in one
    * (metric, ts, value) frame (the graphite-web render path). */
  def fetchPattern(pattern: String, from: Long, until: Long): DataFrame =
    SeriesOps.fetchPatternFrom(points, meta, pattern, from, until)

  /** CeresTree.store → CeresNode.write: batch ingest of (metric, ts,
    * value) rows, compact semantics (Kernel.compact). A store-backed
    * engine appends to its own store; otherwise pass an explicit
    * directory. Written in the (pb, pd) bucketed layout via
    * [[Ingest.appendToStore]] — batch and streaming writers share ONE
    * layout, or a store fed by both mixes partition structures and
    * discovery fails. */
  def store(rows: DataFrame, destDir: String = null,
            buckets: Int = Maintenance.MetricBuckets): Unit = {
    val target = Option(destDir).orElse(storeDir).getOrElse(
      throw new IllegalStateException(
        "store needs a destination: openStore-backed Engine or explicit dir"))
    Ingest.appendToStore(Ingest.compactBatch(rows, Catalog.Step), target, buckets)
  }

  /** bin/ceres-maintenance: rollup + retention over this engine's points
    * and metadata, returning the maintained dataset. */
  def maintain(now: Long): DataFrame =
    Maintenance.maintainPerNode(points, meta, now)

  /** Register the catalog as temp views so users can `spark.sql` against
    * it: `graft_points`, `graft_metrics_meta`, plus the raw extension
    * tables. The declarative views keep every Catalyst optimization
    * (pushdown through the views) intact. */
  def registerViews(): Unit = {
    points.createOrReplaceTempView("graft_points")
    meta.createOrReplaceTempView("graft_metrics_meta")
    // extension tables exist only for catalog-backed engines; probe via
    // the Hadoop FS API so object-store catalogs resolve too
    if (core.Fs.exists(spark, s"$dir/documents.parquet"))
      Catalog.documents(spark, dir).createOrReplaceTempView("graft_documents")
    if (core.Fs.exists(spark, s"$dir/embeddings.parquet"))
      Catalog.embeddings(spark, dir).createOrReplaceTempView("graft_embeddings")
  }

  /** The five ceres aggregation methods over a fetched range. The
    * aggregate runs IN Spark (a one-row `head()` of an agg plan, never a
    * range collect — a year at 1 s step is ~31 M rows, which must reduce
    * on the executors); `Kernel.aggregate` stays the scalar spec the
    * parity tests pin this against. */
  def aggregate(metric: String, method: String, from: Long,
                until: Long): Option[Double] = {
    require(Kernel.ValidAggregationMethods.contains(method),
      s"Unknown aggregation method: $method")
    val sparse = fetchSparse(metric, from, until)
    val aggCol = method match {
      case "average" => avg("value")
      case "sum"     => sum("value")
      case "min"     => min("value")
      case "max"     => max("value")
      case "last"    => max_by(col("value"), col("ts"))
    }
    val row = sparse.agg(aggCol.as("v")).head()
    if (row.isNullAt(0)) None else Some(row.getDouble(0))
  }
}

object Engine {
  def open(spark: SparkSession, dir: String): Engine = new Engine(spark, dir)

  /** A MetaStore-backed engine: createNode/deleteNode enabled, catalog ops
    * served from the mutable metadata log. */
  def openWithMetaStore(spark: SparkSession, dir: String,
                        metaDir: String): Engine =
    new Engine(spark, dir, Some(metaDir))

  /** An engine over a REAL points store directory (Ingest/Engine.store
    * output) with a MetaStore metadata log — the full reference lifecycle
    * on the user's own data: createNode → store → maintain → fetch, with
    * multi-resolution reconcile on read. */
  def openStore(spark: SparkSession, storeDir: String,
                metaDir: String): Engine =
    new Engine(spark, storeDir, Some(metaDir), Some(storeDir))
}
