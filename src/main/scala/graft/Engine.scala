package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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
final class Engine(val spark: SparkSession, val dir: String) {

  /** CeresTree.walk: every node in the tree. */
  def walk(): DataFrame = SeriesOps.walkTree(spark, dir)

  /** CeresTree.find: glob-resolved nodes, optional data-interval filter
    * (reference `find(pattern, fromTime, untilTime)` via
    * hasDataForInterval). */
  def find(pattern: String, from: Option[Long] = None,
           until: Option[Long] = None): DataFrame =
    (from, until) match {
      case (None, None) => SeriesOps.findGlob(spark, dir, pattern)
      case _ => SeriesOps.findInterval(spark, dir, pattern,
        from.getOrElse(Long.MinValue), until.getOrElse(Long.MaxValue))
    }

  /** CeresTree.hasNode. */
  def hasNode(metric: String): Boolean =
    SeriesOps.hasNode(spark, dir, metric).head.getBoolean(0)

  /** CeresTree.fetch → CeresNode.read: the dense grid over the
    * reference-aligned window. Raises NodeNotFound for an unknown metric
    * (reference CeresTree.store/fetch contract ≈L245–270). */
  def fetch(metric: String, from: Long, until: Long): DataFrame = {
    if (!hasNode(metric))
      throw new NoSuchElementException(s"NodeNotFound: $metric")
    SeriesOps.densifyGrid(spark, dir, metric, from, until)
  }

  /** Sparse read (no grid padding) — CeresNode.read before shaping. */
  def fetchSparse(metric: String, from: Long, until: Long): DataFrame =
    SeriesOps.fetchRange(spark, dir, metric, from, until)

  /** CeresTree.store → CeresNode.write: batch ingest of (metric, ts,
    * value) rows into a points store directory, compact semantics
    * (Kernel.compact). */
  def store(points: DataFrame, storeDir: String): Unit =
    Ingest.compactBatch(points, Catalog.Step)
      .write.mode("append").parquet(storeDir)

  /** bin/ceres-maintenance: rollup + retention over this catalog's
    * metadata, returning the maintained dataset. */
  def maintain(now: Long): DataFrame = {
    val meta = Catalog.metricsMeta(spark)
    Maintenance.maintain(Catalog.pointsCached(spark, dir), meta, now,
      Maintenance.tiersFromMeta(meta))
  }

  /** Register the catalog as temp views so users can `spark.sql` against
    * it: `graft_points`, `graft_metrics_meta`, plus the raw extension
    * tables. The declarative views keep every Catalyst optimization
    * (pushdown through the views) intact. */
  def registerViews(): Unit = {
    Catalog.pointsCached(spark, dir).createOrReplaceTempView("graft_points")
    Catalog.metricsMeta(spark).createOrReplaceTempView("graft_metrics_meta")
    Catalog.documents(spark, dir).createOrReplaceTempView("graft_documents")
    Catalog.embeddings(spark, dir).createOrReplaceTempView("graft_embeddings")
  }

  /** The five ceres aggregation methods over a fetched range. */
  def aggregate(metric: String, method: String, from: Long,
                until: Long): Option[Double] = {
    require(Kernel.ValidAggregationMethods.contains(method),
      s"Unknown aggregation method: $method")
    val rows = fetchSparse(metric, from, until).collect()
    Kernel.aggregate(method,
      rows.map(r => if (r.isNullAt(1)) None else Some(r.getDouble(1))))
  }
}

object Engine {
  def open(spark: SparkSession, dir: String): Engine = new Engine(spark, dir)
}
