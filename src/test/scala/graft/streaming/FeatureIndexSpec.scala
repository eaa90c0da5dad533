package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.Catalog
import graft.operators.{TextOps, VectorOps}

/** The incremental feature index: ingest batches APPEND per-record
  * feature rows, and the maintained index equals a full rebuild — the
  * "re-band on ingest, never re-shingle the corpus per query" contract
  * made real and pinned. */
class FeatureIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val Dir = SparkTestBase.Sf0001

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").toString

  /** (relative path → (size, mtime)) of every file under `dir`. */
  private def snapshot(dir: String): Map[String, (Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(root)) Map.empty
    else java.nio.file.Files.walk(root).iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .map(p => (root.relativize(p).toString,
        (java.nio.file.Files.size(p),
          java.nio.file.Files.getLastModifiedTime(p).toMillis)))
      .toMap
  }

  test("doc index grows incrementally; near-dup pairs equal a full rebuild") {
    val src = tmp("fi-src"); val idx = tmp("fi-idx"); val ckpt = tmp("fi-ckpt")
    val docs = Catalog.documents(spark, Dir).select("doc_id", "text")

    // batch 1: even doc_ids
    docs.where(col("doc_id") % 2 === 0).write.parquet(s"$src/b1")
    FeatureIndex.streamDocuments(spark, src, idx, ckpt, availableNow = true)
      .awaitTermination()
    val snap1 = snapshot(s"$idx/shingles")
    assert(snap1.nonEmpty)

    // batch 2: odd doc_ids, via a NEW query on the same checkpoint
    docs.where(col("doc_id") % 2 === 1).write.parquet(s"$src/b2")
    FeatureIndex.streamDocuments(spark, src, idx, ckpt, availableNow = true)
      .awaitTermination()
    val snap2 = snapshot(s"$idx/shingles")

    // incremental, not rebuilt: every batch-1 DATA file survives
    // byte-identical (_SUCCESS markers and their .crc shadows churn)
    snap1.filterNot(p => p._1.startsWith("_") || p._1.startsWith("."))
      .foreach { case (p, meta) =>
        assert(snap2.get(p).contains(meta),
          s"batch-1 index file $p must not be rewritten by batch 2")
      }

    // the maintained index equals a full rebuild of the feature tables
    def shKey(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getLong(2))
    assert(spark.read.parquet(s"$idx/shingles").collect().map(shKey).toSet ===
      TextOps.shinglesOf(docs).collect().map(shKey).toSet)

    // near-dup pairs served from the index == the full-rebuild operators
    def pair(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    val gotMh = FeatureIndex.minhashPairs(spark, idx, 0.9).collect().map(pair)
    val wantMh = TextOps.dedupMinhashLsh(spark, Dir, 0.9).collect().map(pair)
    assert(gotMh.toSeq === wantMh.toSeq && wantMh.nonEmpty)

    def hp(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getInt(2))
    assert(FeatureIndex.simhashPairs(spark, idx, 3).collect().map(hp).toSeq ===
      TextOps.dedupSimhash(spark, Dir, 3).collect().map(hp).toSeq)
  }

  test("embedding index: LSH buckets + frozen-quantizer IVF assignments append-only") {
    val src = tmp("fe-src"); val idx = tmp("fe-idx"); val ckpt = tmp("fe-ckpt")
    val emb = Catalog.embeddings(spark, Dir)
    val vecs = emb.withColumn("vecd", col("embedding").cast("array<double>"))
    val cents = vecs.where(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("vecd").as("cv"))
    FeatureIndex.bootstrapIvfCentroids(cents, idx)
    // freezing twice is an error, not a silent overwrite
    intercept[Exception] { FeatureIndex.bootstrapIvfCentroids(cents, idx) }

    emb.where(col("vec_id") % 2 === 0).select("vec_id", "embedding")
      .write.parquet(s"$src/b1")
    FeatureIndex.streamEmbeddings(spark, src, idx, ckpt, availableNow = true)
      .awaitTermination()
    emb.where(col("vec_id") % 2 === 1).select("vec_id", "embedding")
      .write.parquet(s"$src/b2")
    FeatureIndex.streamEmbeddings(spark, src, idx, ckpt, availableNow = true)
      .awaitTermination()

    def bk(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getLong(2))
    assert(spark.read.parquet(s"$idx/emb_buckets").collect().map(bk).toSet ===
      VectorOps.annLshBuckets(vecs).select("vec_id", "tbl", "bucket")
        .collect().map(bk).toSet)
    def as(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1))
    assert(spark.read.parquet(s"$idx/emb_assign").collect().map(as).toSet ===
      VectorOps.ivfAssign(vecs, cents).collect().map(as).toSet)
  }
}
