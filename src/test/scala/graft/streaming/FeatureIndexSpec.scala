package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.Catalog
import graft.operators.{TextOps, VectorOps}

/** The incremental feature index: ingest batches write per-record
  * feature rows into per-batch partitions, and the maintained index
  * equals a full rebuild — the "re-band on ingest, never re-shingle the
  * corpus per query" contract made real and pinned. Replay idempotence
  * (at-least-once foreachBatch re-running a batch must not duplicate
  * feature rows) and closed-batch compaction are pinned here too. */
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

  /** Parquet data files (no _SUCCESS / .crc shadows) under `dir`. */
  private def dataFiles(dir: String): Set[String] =
    snapshot(dir).keySet
      .filterNot(p => java.nio.file.Paths.get(p).getFileName.toString
        .matches("^[_.].*"))

  private def pair(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), r.getDouble(2))

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
    assert(spark.read.parquet(s"$idx/shingles").select("doc_id", "s", "h")
      .collect().map(shKey).toSet ===
      TextOps.shinglesOf(docs).collect().map(shKey).toSet)

    // near-dup pairs served from the index == the full-rebuild operators
    val gotMh = FeatureIndex.minhashPairs(spark, idx, 0.9).collect().map(pair)
    val wantMh = TextOps.dedupMinhashLsh(spark, Dir, 0.9).collect().map(pair)
    assert(gotMh.toSeq === wantMh.toSeq && wantMh.nonEmpty)

    def hp(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getInt(2))
    assert(FeatureIndex.simhashPairs(spark, idx, 3).collect().map(hp).toSeq ===
      TextOps.dedupSimhash(spark, Dir, 3).collect().map(hp).toSeq)

    // REPLAY: foreachBatch is at-least-once — re-running the last batch
    // (same batch id, the streaming replay contract) must overwrite its
    // own partition, not append a second copy of its feature rows. The
    // pair output — whose count-based jaccard verification duplicated
    // shingles would skew — stays byte-identical to the oracle-checked
    // operators.
    FeatureIndex.appendDocFeatures(
      docs.where(col("doc_id") % 2 === 1), idx, batchId = 1L)
    assert(FeatureIndex.minhashPairs(spark, idx, 0.9).collect().map(pair)
      .toSeq === wantMh.toSeq)
    assert(FeatureIndex.simhashPairs(spark, idx, 3).count() ===
      TextOps.dedupSimhash(spark, Dir, 3).count())
    assert(spark.read.parquet(s"$idx/shingles").select("doc_id", "s", "h")
      .collect().map(shKey).toSet ===
      TextOps.shinglesOf(docs).collect().map(shKey).toSet)
  }

  test("embedding index: LSH buckets + frozen-quantizer IVF assignments, replay-idempotent") {
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
    def as(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1))
    val wantBk = VectorOps.annLshBuckets(vecs).select("vec_id", "tbl", "bucket")
      .collect().map(bk).toSet
    val wantAs = VectorOps.ivfAssign(vecs, cents).collect().map(as).toSet
    assert(spark.read.parquet(s"$idx/emb_buckets").collect().map(bk).toSet
      === wantBk)
    assert(spark.read.parquet(s"$idx/emb_assign").collect().map(as).toSet
      === wantAs)

    // replaying the last batch duplicates nothing: same SETS and same
    // ROW COUNTS (a duplicated bucket row would survive a set compare)
    val nBk = spark.read.parquet(s"$idx/emb_buckets").count()
    val nAs = spark.read.parquet(s"$idx/emb_assign").count()
    FeatureIndex.appendEmbFeatures(
      emb.where(col("vec_id") % 2 === 1).select("vec_id", "embedding"),
      idx, batchId = 1L)
    assert(spark.read.parquet(s"$idx/emb_buckets").count() === nBk)
    assert(spark.read.parquet(s"$idx/emb_assign").count() === nAs)
    assert(spark.read.parquet(s"$idx/emb_buckets").collect().map(bk).toSet
      === wantBk)
  }

  test("embedding batches without a frozen quantizer fail loudly (no silent subset)") {
    val idx = tmp("fe-noivf")
    val batch = Catalog.embeddings(spark, Dir)
      .where(col("vec_id") < 10).select("vec_id", "embedding")
    // assignments would silently cover a subset of the bucket table
    // forever (the index keeps no raw vectors to backfill from) — so a
    // missing quantizer is an error...
    intercept[IllegalStateException] {
      FeatureIndex.appendEmbFeatures(batch, idx, batchId = 0L)
    }
    // ...unless the caller explicitly opts into an LSH-only index
    FeatureIndex.appendEmbFeatures(batch, idx, batchId = 0L, ivf = false)
    assert(spark.read.parquet(s"$idx/emb_buckets").count() > 0)
    assert(!graft.core.Fs.exists(spark, s"$idx/emb_assign"))
  }

  test("compactIndex folds closed batches; pair output and index content unchanged") {
    val idx = tmp("fi-compact")
    val docs = Catalog.documents(spark, Dir).select("doc_id", "text")
    for (b <- 0 until 3)
      FeatureIndex.appendDocFeatures(
        docs.where(col("doc_id") % 3 === b), idx, batchId = b.toLong)

    val before = dataFiles(s"$idx/shingles")
    val wantMh = TextOps.dedupMinhashLsh(spark, Dir, 0.9).collect().map(pair)
    assert(FeatureIndex.minhashPairs(spark, idx, 0.9).collect().map(pair)
      .toSeq === wantMh.toSeq)

    FeatureIndex.compactIndex(spark, idx)

    // fewer data files: three batch partitions fold to (compacted, last)
    val after = dataFiles(s"$idx/shingles")
    assert(after.size < before.size,
      s"expected fewer data files, had ${before.size}, got ${after.size}")
    assert(after.exists(_.contains("batch_id=-1")) &&
      after.exists(_.contains("batch_id=2")))
    // the LAST batch partition survives compaction untouched — it is the
    // one partition an at-least-once restart can replay into
    assert(!after.exists(_.contains("batch_id=0")) &&
      !after.exists(_.contains("batch_id=1")))

    // read contract identical: same pairs, same index content
    assert(FeatureIndex.minhashPairs(spark, idx, 0.9).collect().map(pair)
      .toSeq === wantMh.toSeq)
    assert(FeatureIndex.simhashPairs(spark, idx, 3).collect().length ===
      TextOps.dedupSimhash(spark, Dir, 3).collect().length)

    // a replay of the last batch AFTER compaction still lands clean
    FeatureIndex.appendDocFeatures(
      docs.where(col("doc_id") % 3 === 2), idx, batchId = 2L)
    assert(FeatureIndex.minhashPairs(spark, idx, 0.9).collect().map(pair)
      .toSeq === wantMh.toSeq)

    // steady state: a second compaction is a no-op (byte-identical files)
    FeatureIndex.compactIndex(spark, idx)
    val snapA = snapshot(s"$idx/buckets")
    FeatureIndex.compactIndex(spark, idx)
    assert(snapshot(s"$idx/buckets") === snapA,
      "compacting a compacted index must not rewrite anything")
  }

  test("index-served ANN top-k equals the session-built forms row for row") {
    // deterministic hyperplanes + frozen seed quantizer + per-row
    // features => the batch-built index must serve IDENTICAL answers
    val lshWant = VectorOps.annLshTopk(spark, Dir, 0, 10).collect().toSeq
    val lshGot = FeatureIndex.indexedAnnLshTopk(spark, Dir, 0, 10)
      .collect().toSeq
    assert(lshGot === lshWant)
    val ivfWant = VectorOps.annIvfTopk(spark, Dir, 0, 10).collect().toSeq
    val ivfGot = FeatureIndex.indexedAnnIvfTopk(spark, Dir, 0, 10)
      .collect().toSeq
    assert(ivfGot === ivfWant)
    // PQ: frozen TRAINED codebook (r14) + integer code assignment =>
    // identical codes, identical ADC scores, identical ranks
    val pqWant = VectorOps.annPqTopkTrained(spark, Dir, 0, 10).collect().toSeq
    val pqGot = FeatureIndex.indexedAnnPqTopk(spark, Dir, 0, 10)
      .collect().toSeq
    assert(pqWant.nonEmpty && pqGot === pqWant)
  }

  test("index-served simhash pairs equal the session-built form row for row") {
    // fingerprints are deterministic per-row functions, so the persisted
    // fingerprint table must serve IDENTICAL pairs
    val want = graft.operators.TextOps.dedupSimhash(spark, Dir, 3)
      .collect().toSeq
    val got = FeatureIndex.indexedSimhashPairs(spark, Dir, 3)
      .collect().toSeq
    assert(want.nonEmpty && got === want)
  }

  test("index_stats counts equal the session-built feature-table counts") {
    val rows = FeatureIndex.indexStats(spark, Dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sh = graft.operators.TextOps.shingles(spark, Dir)
    val nDocs = graft.core.Catalog.documents(spark, Dir).count()
    val nVecs = graft.core.Catalog.embeddings(spark, Dir).count()
    assert(rows("shingles") === sh.count())
    assert(rows("buckets") === sh.select("doc_id").distinct().count() * 16)
    assert(rows("simhash") === nDocs)
    assert(rows("emb_buckets") === nVecs * 16)
    assert(rows("emb_assign") === nVecs)
    assert(rows("word_counts") ===
      graft.operators.TextOps.wordCounts(spark, Dir).count())
  }

  test("index-served top_terms equals the session word-count form") {
    val want = graft.operators.TextOps.topTerms(spark, Dir, 20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = FeatureIndex.indexedTopTerms(spark, Dir, 20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(want.nonEmpty && got.toSeq === want.toSeq)
  }

  test("index-served perplexity_filter equals the session form") {
    val want = graft.operators.TextOps.perplexityFilter(spark, Dir, 3.41)
      .collect().map(_.toSeq).toSeq
    val got = FeatureIndex.indexedPerplexityFilter(spark, Dir, 3.41)
      .collect().map(_.toSeq).toSeq
    assert(want.nonEmpty && got === want)
  }

  test("index-served gopher_rules and source_kl equal the session forms") {
    val wantG = graft.operators.TextOps.gopherRules(spark, Dir).collect()
      .map(_.toSeq).toSeq
    val gotG = FeatureIndex.indexedGopherRules(spark, Dir).collect()
      .map(_.toSeq).toSeq
    assert(wantG.nonEmpty && gotG === wantG)
    val wantK = graft.operators.TextOps.sourceKl(spark, Dir).collect()
      .map(_.toSeq).toSeq
    val gotK = FeatureIndex.indexedSourceKl(spark, Dir).collect()
      .map(_.toSeq).toSeq
    assert(wantK.nonEmpty && gotK === wantK)
  }

  test("index-served embed incremental admission equals the session " +
      "relabeling face row for row") {
    // the session face relabels the cached verified sim stream; the
    // index face generates candidates from the PERSISTED emb_buckets
    // with the join restricted to new-vector right sides — the candidate
    // sets provably coincide (in-bucket pairs with >= 1 new member), so
    // the verdicts must match exactly, not just as sets
    val want = VectorOps.embedDedupIncremental(spark, Dir, 0.4)
      .collect().map(_.toSeq).toSeq
    val got = FeatureIndex.indexedEmbedDedupIncremental(spark, Dir, 0.4)
      .collect().map(_.toSeq).toSeq
    assert(want.nonEmpty && got === want)
  }

  test("index-served mm pHash incremental admission equals the session " +
      "face row for row") {
    // the session face hashes the decoded batch in-session; the index
    // face reads the PERSISTED mm_phash block table (written per ingest
    // batch, compacted) — same definition (phashIncrementalFromBlocks),
    // so the admission verdicts must match exactly, not just as sets
    val want = graft.operators.MultimodalOps.phashIncremental(spark, Dir, 3)
      .collect().map(_.toSeq).toSeq
    val got = FeatureIndex.indexedMmPhashIncremental(spark, Dir, 3)
      .collect().map(_.toSeq).toSeq
    assert(want.nonEmpty && got === want)
  }

  test("index-served unigram trainer and apply equal the session faces " +
      "row for row") {
    // both faces train their own frozen state (separate cache
    // namespaces) from count tables that must be identical (the
    // index_stats row-count audit's claim for word_counts) — so the
    // full EM trajectories and per-doc piece counts must match exactly
    val wantT = graft.operators.TextOps.unigramLmTrain(spark, Dir, 24, 2)
      .collect().map(_.toSeq).toSeq
    val gotT = FeatureIndex.indexedUnigramLmTrain(spark, Dir, 24, 2)
      .collect().map(_.toSeq).toSeq
    assert(wantT.nonEmpty && gotT === wantT)
    val wantA = graft.operators.TextOps.unigramLmApply(spark, Dir, 24, 2)
      .collect().map(_.toSeq).toSeq
    val gotA = FeatureIndex.indexedUnigramLmApply(spark, Dir, 24, 2)
      .collect().map(_.toSeq).toSeq
    assert(wantA.nonEmpty && gotA === wantA)
    val wantS = graft.operators.TextOps.unigramLmScore(spark, Dir, 24, 2)
      .collect().map(_.toSeq).toSeq
    val gotS = FeatureIndex.indexedUnigramLmScore(spark, Dir, 24, 2)
      .collect().map(_.toSeq).toSeq
    assert(wantS.nonEmpty && gotS === wantS)
  }

  test("compaction auto-restores a table stranded mid-swap by a crash") {
    // a death BETWEEN the two swap renames leaves `path` absent and the
    // intact table at `path.compacted-old` — the next compaction must
    // rename it back (not silently skip the now-"missing" table)
    val idx = tmp("fi-restore")
    val docs = Catalog.documents(spark, Dir).select("doc_id", "text")
    for (b <- 0 until 2)
      FeatureIndex.appendDocFeatures(
        docs.where(col("doc_id") % 2 === b), idx, batchId = b.toLong)
    val want = FeatureIndex.minhashPairs(spark, idx, 0.9).collect().map(pair)
    // simulate the crash window: first rename done, second never ran
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$idx/shingles"),
      java.nio.file.Paths.get(s"$idx/shingles.compacted-old"))
    FeatureIndex.compactIndex(spark, idx)
    assert(new java.io.File(s"$idx/shingles").isDirectory,
      "stranded table must be restored from .compacted-old")
    assert(FeatureIndex.minhashPairs(spark, idx, 0.9).collect().map(pair)
      .toSeq === want.toSeq)
  }

  test("compaction swap is durable: stale swap dirs replaced, none left behind") {
    val idx = tmp("fi-swap")
    val docs = Catalog.documents(spark, Dir).select("doc_id", "text")
    for (b <- 0 until 2)
      FeatureIndex.appendDocFeatures(
        docs.where(col("doc_id") % 2 === b), idx, batchId = b.toLong)
    val want = FeatureIndex.minhashPairs(spark, idx, 0.9).collect().map(pair)

    // leftovers of a crashed earlier compaction (a half-written folded
    // copy, an undeleted old table) must be replaced, not trusted
    for (stale <- Seq(s"$idx/shingles.compacting", s"$idx/buckets.compacted-old"))
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(stale, "junk"))

    FeatureIndex.compactIndex(spark, idx)

    // swap completed: table is the folded copy, no swap dirs remain —
    // the table was never the only copy (tmp write THEN rename), so no
    // failure point loses it
    val leftovers = new java.io.File(idx).listFiles()
      .map(_.getName).filter(n => n.contains(".compact"))
    assert(leftovers.isEmpty, s"swap must clean up: ${leftovers.toSeq}")
    assert(FeatureIndex.minhashPairs(spark, idx, 0.9).collect().map(pair)
      .toSeq === want.toSeq)
  }
}
