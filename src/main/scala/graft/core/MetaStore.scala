package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mutable per-metric metadata store — the engine's `.ceres-node` write
  * path (`ceres.py` CeresNode.create ≈L330 / writeMetadata ≈L395 and the
  * `ceres-node-create` CLI).
  *
  * Layout: an append-only parquet log of metadata rows with a monotonically
  * increasing `version`; reads resolve last-writer-wins per metric
  * (`arg_max` by version). Node deletion is a tombstone (null timeStep).
  * The reference rewrites one JSON file atomically per node; an append-log
  * plus compaction is the object-store-safe equivalent (single-writer
  * maintenance semantics, like the reference's create/update CLIs).
  */
object MetaStore {

  final case class Retention(precision: Long, points: Long)

  /** Append one metadata write (create or update). */
  def put(spark: SparkSession, metaDir: String, metric: String,
          timeStep: Long, aggregationMethod: String, xFilesFactor: Double,
          retentions: Seq[Retention]): Unit = {
    require(Kernel.ValidAggregationMethods.contains(aggregationMethod),
      s"Unknown aggregation method: $aggregationMethod")
    require(timeStep > 0, s"timeStep must be positive: $timeStep")
    writeRow(spark, metaDir, metric, Some(timeStep), aggregationMethod,
      xFilesFactor, retentions)
  }

  /** Tombstone a node (the reference unlinks the node directory). */
  def delete(spark: SparkSession, metaDir: String, metric: String): Unit =
    writeRow(spark, metaDir, metric, None, "average", 0.5, Seq.empty)

  private def writeRow(spark: SparkSession, metaDir: String, metric: String,
                       timeStep: Option[Long], method: String, xff: Double,
                       retentions: Seq[Retention]): Unit = {
    import spark.implicits._
    val version = nextVersion(spark, metaDir)
    Seq((metric, timeStep, method, xff,
        retentions.map(r => (r.precision, r.points)), version))
      .toDF("metric", "timeStep", "aggregationMethod", "xFilesFactor",
        "rawRetentions", "version")
      .withColumn("retentions",
        expr("transform(rawRetentions, r -> struct(r._1 AS precision, r._2 AS points))"))
      .drop("rawRetentions")
      .write.mode("append").parquet(metaDir)
  }

  private def nextVersion(spark: SparkSession, metaDir: String): Long =
    nextVersionIn(spark, metaDir)

  private def nextVersionIn(spark: SparkSession, dir: String): Long =
    if (!Fs.exists(spark, dir)) 0L
    else spark.read.parquet(dir)
      .agg(coalesce(max("version"), lit(-1L))).head().getLong(0) + 1L

  /** Resolved view: one row per live metric, last-writer-wins, tombstones
    * dropped. Schema matches Catalog.metricsMeta. */
  def read(spark: SparkSession, metaDir: String): DataFrame =
    if (!Fs.exists(spark, metaDir))
      Catalog.metricsMeta(spark).limit(0)
    else
      spark.read.parquet(metaDir)
        .groupBy("metric")
        .agg(max_by(struct("timeStep", "aggregationMethod", "xFilesFactor",
          "retentions"), col("version")).as("m"))
        .select(col("metric"), col("m.timeStep").as("timeStep"),
          col("m.aggregationMethod").as("aggregationMethod"),
          col("m.xFilesFactor").as("xFilesFactor"),
          col("m.retentions").as("retentions"))
        .where(col("timeStep").isNotNull)

  /** Compaction (the metadata defrag analog): rewrite the log as its
    * resolved view at version 0. */
  def compact(spark: SparkSession, metaDir: String, destDir: String): Unit =
    read(spark, metaDir)
      .withColumn("version", lit(0L))
      .write.mode("overwrite").parquet(destDir)

  // ———————————————————————— tree-level properties ————————————————————————

  /** Tree props live in a SIBLING directory of the node log (`<metaDir>
    * .tree`) — a subdirectory would leak into the node log's parquet
    * discovery. Same append-log + last-writer-wins shape as nodes. */
  private def treeDir(metaDir: String): String = s"$metaDir.tree"

  /** `CeresTree.createTree(**props)` (ceres.py ≈L100–120: each property
    * becomes a `.ceres-tree/<prop>` file): record tree-level properties.
    * Append-only; re-setting a key overwrites on read (the reference
    * rewrites the prop file). */
  def createTree(spark: SparkSession, metaDir: String,
                 props: Map[String, String]): Unit =
    writeTreeRows(spark, metaDir, props.view.mapValues(Option(_)).toMap)

  /** Remove one tree property (tombstone). */
  def deleteTreeProp(spark: SparkSession, metaDir: String, key: String): Unit =
    writeTreeRows(spark, metaDir, Map(key -> None))

  private def writeTreeRows(spark: SparkSession, metaDir: String,
                            props: Map[String, Option[String]]): Unit = {
    if (props.isEmpty) return
    import spark.implicits._
    val version = nextVersionIn(spark, treeDir(metaDir))
    props.toSeq.map { case (k, v) => (k, v, version) }
      .toDF("key", "value", "version")
      .write.mode("append").parquet(treeDir(metaDir))
  }

  /** Resolved tree properties: last-writer-wins per key, tombstones
    * dropped (the read face of `.ceres-tree/<prop>`). */
  def treeProps(spark: SparkSession, metaDir: String): Map[String, String] =
    if (!Fs.exists(spark, treeDir(metaDir))) Map.empty
    else spark.read.parquet(treeDir(metaDir))
      .groupBy("key")
      .agg(max_by(col("value"), col("version")).as("value"))
      .where(col("value").isNotNull)
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .toMap
}
