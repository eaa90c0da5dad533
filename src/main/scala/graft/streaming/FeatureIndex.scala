package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.operators.{TextOps, VectorOps}

/** Incremental FEATURE-INDEX maintenance — the ingest-side half of the
  * near-dup / ANN contract. The dedup and similarity operators consume
  * materialized feature tables (shingle index, minhash band buckets,
  * simhash fingerprints, LSH sign buckets, IVF assignments); at 100 TB
  * those tables are maintained ON INGEST — re-banding only the newly
  * arrived documents — never rebuilt by re-shingling the corpus per
  * query. This object is that ingest job: a file-source stream of
  * document (or embedding) drops whose `foreachBatch` APPENDS the
  * batch's feature rows to the persisted index tables.
  *
  * Why append-only is exactly right: every feature here is a PER-ROW
  * function of one ingested record (a doc's shingles/minhashes/simhash
  * depend on its text alone; a vector's buckets/cell on its embedding
  * alone — the hyperplanes are deterministic literals and the IVF
  * quantizer is trained once, then frozen for assignment). No batch can
  * change another batch's rows, so the incrementally-maintained index
  * is EQUAL to a full rebuild — parity pinned by FeatureIndexSpec,
  * batch-1 files pinned physically untouched by batch 2.
  *
  * Scale shape: per batch, one shingle explosion + codegen'd hashing
  * over the NEW rows only, appended as partitioned parquet. Query-side
  * ([[minhashPairs]] / [[simhashPairs]] / the bucket tables) reads the
  * index and runs candidates + exact verify — identical operator
  * semantics to the session-cached forms in TextOps/VectorOps, with the
  * build cost amortized to the write path.
  */
object FeatureIndex {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  val embSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  // ————————————————————————— document features ————————————————————————————

  /** Append one document batch's feature rows: shingles (doc_id, s, h),
    * minhash band buckets (doc_id, band, sig), simhash fingerprints
    * (doc_id, fp). Documents are atomic within a drop, so the per-doc
    * aggregations (minhash mins, simhash bit sums) see every shingle /
    * token of their doc. */
  def appendDocFeatures(batch: DataFrame, indexDir: String): Unit = {
    // the shingle explosion feeds two sinks: materialize it once per
    // batch instead of re-hashing the batch per feature table
    val sh = TextOps.shinglesOf(batch).localCheckpoint(true)
    sh.write.mode("append").parquet(s"$indexDir/shingles")
    TextOps.minhashBucketsOf(sh)
      .write.mode("append").parquet(s"$indexDir/buckets")
    TextOps.simhashFingerprints(batch)
      .write.mode("append").parquet(s"$indexDir/simhash")
  }

  /** Stream document drops (parquet files of (doc_id, text)) from
    * `srcDir` into the feature index at `indexDir`. */
  def streamDocuments(spark: SparkSession, srcDir: String, indexDir: String,
                      checkpointDir: String,
                      availableNow: Boolean = false): StreamingQuery = {
    val writer = spark.readStream
      .schema(docSchema)
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        appendDocFeatures(batch, indexDir)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** MinHash+LSH near-dup pairs SERVED FROM the maintained index: band
    * buckets → candidate pairs → exact-jaccard verify against the
    * indexed shingles. Same output contract as `TextOps.dedupMinhashLsh`
    * — nothing is re-shingled. */
  def minhashPairs(spark: SparkSession, indexDir: String,
                   threshold: Double = 0.9): DataFrame = {
    val sh = spark.read.parquet(s"$indexDir/shingles")
    val buckets = spark.read.parquet(s"$indexDir/buckets")
    val candidates = buckets.as("x")
      .join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    TextOps.exactJaccardOnCandidates(sh, candidates, threshold)
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash near-dup pairs from the indexed fingerprints (same contract
    * as `TextOps.dedupSimhash`). */
  def simhashPairs(spark: SparkSession, indexDir: String,
                   maxHamming: Int = 3): DataFrame =
    TextOps.dedupSimhashFromFps(
      spark.read.parquet(s"$indexDir/simhash"), maxHamming)

  // ————————————————————————— embedding features ———————————————————————————

  /** Freeze the IVF coarse quantizer for this index: written ONCE (the
    * production shape — the quantizer trains on a sample, then every
    * later assignment uses the frozen centroids, or cell membership
    * would shift under the store's feet). `cents` = (cid, cv) as
    * produced by the VectorOps quantizers. */
  def bootstrapIvfCentroids(cents: DataFrame, indexDir: String): Unit =
    cents.write.mode("errorifexists").parquet(s"$indexDir/centroids")

  /** Append one embedding batch's feature rows: LSH sign buckets
    * (vec_id, tbl, bucket) and — when a frozen quantizer exists — IVF
    * assignments (vec_id, cid). */
  def appendEmbFeatures(batch: DataFrame, indexDir: String,
                        tables: Int = 16, bitsPerTable: Int = 6,
                        dim: Int = 64): Unit = {
    val spark = batch.sparkSession
    val vecs = batch.withColumn("vecd", col("embedding").cast("array<double>"))
      .localCheckpoint(true) // two sinks, one cast/scan of the batch
    VectorOps.annLshBuckets(vecs, tables, bitsPerTable, dim)
      .select("vec_id", "tbl", "bucket")
      .write.mode("append").parquet(s"$indexDir/emb_buckets")
    if (graft.core.Fs.exists(spark, s"$indexDir/centroids"))
      VectorOps.ivfAssign(vecs,
          spark.read.parquet(s"$indexDir/centroids"))
        .write.mode("append").parquet(s"$indexDir/emb_assign")
  }

  /** Stream embedding drops (parquet files of (vec_id, embedding)) from
    * `srcDir` into the feature index at `indexDir`. */
  def streamEmbeddings(spark: SparkSession, srcDir: String, indexDir: String,
                       checkpointDir: String,
                       availableNow: Boolean = false): StreamingQuery = {
    val writer = spark.readStream
      .schema(embSchema)
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        appendEmbFeatures(batch, indexDir)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }
}
