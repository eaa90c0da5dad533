package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{EventOps, MultimodalOps, SeriesOps, TextOps, VectorOps}

/** The user-facing facade for the LLM-training-data pipeline layer
  * (SURVEY §2.9) — the extension counterpart of [[Engine]] (which covers
  * the reference's CeresTree surface). One object per corpus root, with
  * every pipeline stage as a method:
  *
  * {{{
  * val p = Pipeline.open(spark, "/data/corpus")
  * p.dedupExact()                       // keeper + copy count per text
  * p.dedupMinhashLsh(0.9)              // near-dups, LSH candidates + exact verify
  * p.contamination(0.9)                // cross-source leak scan
  * p.trainSplit()                      // deterministic 90/5/5 assignment
  * p.cosineTopk(queryId = 0, k = 10)   // exact similarity baseline
  * p.annLshTopk(queryId = 0, k = 10)   // the 100 TB ANN path
  * }}}
  *
  * All methods return lazy DataFrames (plans, not results) so stages
  * compose and Catalyst optimizes across them; feature tables (shingle
  * index, band buckets, fingerprints, LSH/IVF indexes) are materialized
  * once per session and shared between stages, mirroring the feature
  * datasets an ingest pipeline maintains at scale.
  */
final class Pipeline(val spark: SparkSession, val dir: String) {

  // —— dedup family ——
  def dedupExact(): DataFrame = TextOps.dedupExact(spark, dir)
  def dedupNorm(): DataFrame = TextOps.dedupNorm(spark, dir)
  def dedupJaccard(threshold: Double = 0.9,
                   maxDf: Long = Long.MaxValue): DataFrame =
    TextOps.dedupJaccard(spark, dir, threshold, maxDf)
  def dedupMinhashLsh(threshold: Double = 0.9): DataFrame =
    TextOps.dedupMinhashLsh(spark, dir, threshold)
  def dedupSimhash(maxHamming: Int = 3): DataFrame =
    TextOps.dedupSimhash(spark, dir, maxHamming)
  def docFingerprint(): DataFrame = TextOps.docFingerprint(spark, dir)
  /** Near-dup pair graph closed into connected components (cluster id =
    * min doc_id = the keeper). */
  def dedupClusters(threshold: Double = 0.9): DataFrame =
    TextOps.dedupClusters(spark, dir, threshold)
  /** The apply stage: the kept corpus after keeper selection (shares the
    * session-cached component labels with [[dedupClusters]]). */
  def dedupApply(threshold: Double = 0.9): DataFrame =
    TextOps.dedupApply(spark, dir, threshold)

  /** Incremental admission: new-batch docs near-duplicating the indexed
    * corpus (or an earlier batch doc), with their best match. */
  def dedupIncremental(threshold: Double = 0.9): DataFrame =
    TextOps.dedupIncremental(spark, dir, threshold)
  /** Per-source batch size / rejected / ratio of [[dedupIncremental]]. */
  def dedupIncrementalStats(threshold: Double = 0.9): DataFrame =
    TextOps.dedupIncrementalStats(spark, dir, threshold)
  /** CCNet paragraph-hash dedup: per-source duplicated-segment mass. */
  def paraDupStats(): DataFrame = TextOps.paraDupStats(spark, dir)
  /** First-corpus-occurrence paragraph keep: per-doc survival ledger. */
  def paraDedupApply(): DataFrame = TextOps.paraDedupApply(spark, dir)
  /** Paragraph-level admission of the arriving batch. */
  def paraDedupIncremental(maxDupFrac: Double = 0.5): DataFrame =
    TextOps.paraDedupIncremental(spark, dir, maxDupFrac)
  /** OOV share of the arriving batch vs the indexed vocabulary. */
  def batchVocabDrift(): DataFrame = TextOps.batchVocabDrift(spark, dir)
  /** Tokenizer fertility (subwords/word at the trained merge state —
    * default = the registered 10-merge deep codebook). */
  def bpeFertility(rounds: Int = 10): DataFrame =
    TextOps.bpeFertility(spark, dir, rounds)
  /** Sequence packing at the trained tokenizer's lengths (default = the
    * registered 10-merge deep codebook). */
  def packSequencesBpe(budget: Long = 2048, shards: Long = 8,
                       rounds: Int = 10): DataFrame =
    TextOps.packSequencesBpe(spark, dir, budget, shards, rounds)
  /** Embedding-side incremental admission (cosine near-dup vs index). */
  def embedDedupIncremental(threshold: Double = 0.4): DataFrame =
    VectorOps.embedDedupIncremental(spark, dir, threshold)

  /** SimHash pairs served from the doc index's persisted fingerprint
    * table (built per JVM; see FeatureIndex). */
  def indexedSimhashPairs(maxHamming: Int = 3): DataFrame =
    graft.streaming.FeatureIndex.indexedSimhashPairs(spark, dir, maxHamming)
  /** Per-table row counts of the persisted feature indexes (the
    * completeness audit). */
  def indexStats(): DataFrame =
    graft.streaming.FeatureIndex.indexStats(spark, dir)
  /** Lexical-vs-semantic dedup agreement: the (in_text, in_embed)
    * membership matrix over the verified text and embedding pair sets. */
  def dedupAgreement(jaccardT: Double = 0.9, cosineT: Double = 0.4): DataFrame =
    TextOps.dedupAgreement(spark, dir, jaccardT, cosineT)

  // —— corpus hygiene ——
  def trainSplit(): DataFrame = TextOps.trainSplit(spark, dir)
  def contaminationMatrix(threshold: Double = 0.9,
                          maxDf: Long = 64L): DataFrame =
    TextOps.contaminationMatrix(spark, dir, threshold, maxDf)
  def contamination(threshold: Double = 0.9, maxDf: Long = 64L): DataFrame =
    TextOps.contamination(spark, dir, threshold, maxDf)
  /** The quality-filter apply stage: the kept corpus after the
    * score / length / repetition gates. */
  def qualityApply(minScore: Double = 0.8, minChars: Long = 150,
                   maxRep: Double = 0.02): DataFrame =
    TextOps.qualityApply(spark, dir, minScore, minChars, maxRep)
  /** Sequence-packing planner: shard-parallel concat-and-split chunking
    * into fixed token-budget training sequences. */
  def packSequences(budget: Long = 2048, shards: Long = 8): DataFrame =
    TextOps.packSequences(spark, dir, budget, shards)

  // —— text analysis ——
  def textStats(): DataFrame = TextOps.textStats(spark, dir)
  def tokenCount(): DataFrame = TextOps.tokenCount(spark, dir)
  def langId(): DataFrame = TextOps.langId(spark, dir)
  def qualityScore(): DataFrame = TextOps.qualityScore(spark, dir)
  def topTerms(k: Int = 20): DataFrame = TextOps.topTerms(spark, dir, k)
  /** Signature-term vocabulary: top-k terms by tf·ln(N/df). */
  def tfidfTerms(k: Int = 20): DataFrame = TextOps.tfidfTerms(spark, dir, k)
  def topTermsByLang(k: Int = 5): DataFrame =
    TextOps.topTermsByLang(spark, dir, k)
  def docLengthQuantiles(ps: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame =
    TextOps.docLengthQuantiles(spark, dir, ps)
  def docRepetition(): DataFrame = TextOps.docRepetition(spark, dir)
  /** Cross-doc duplicated 3-gram span mass per source — the
    * substring-dedup decision input. */
  def spanDupStats(): DataFrame = TextOps.spanDupStats(spark, dir)
  /** Signature-estimated vs exact jaccard per verified near-dup pair
    * (the banding-config fidelity audit). */
  def minhashEstError(threshold: Double = 0.9): DataFrame =
    TextOps.minhashEstError(spark, dir, threshold)
  /** Near-dup pairs straddling train/val/test splits (the
    * eval-integrity audit). */
  def splitLeakage(threshold: Double = 0.9): DataFrame =
    TextOps.splitLeakage(spark, dir, threshold)
  /** The decontaminated training corpus: no benchmark sources, no
    * cross-source near-dups of benchmark docs. */
  def contaminationApply(bench: Seq[String],
                         threshold: Double = 0.9): DataFrame =
    TextOps.contaminationApply(spark, dir, bench, threshold)
  /** Decile histogram of the per-doc quality score per source (drift
    * view next to the average). */
  def qualityHistogram(): DataFrame = TextOps.qualityHistogram(spark, dir)
  /** Per-source dedup removal share (the effective-token mixing
    * input). */
  def dedupRateBySource(threshold: Double = 0.9): DataFrame =
    TextOps.dedupRateBySource(spark, dir, threshold)
  /** Per-shard packing utilization (chunk count + fill ratio). */
  def packEfficiency(budget: Long = 2048, shards: Long = 8): DataFrame =
    TextOps.packEfficiency(spark, dir, budget, shards)
  def sourceCapSample(cap: Long = 30): DataFrame =
    TextOps.sourceCapSample(spark, dir, cap)
  /** Source-mixture sampling weights toward a uniform target (capped
    * effective epochs). */
  def mixWeights(maxWeight: Double = 3.0): DataFrame =
    TextOps.mixWeights(spark, dir, maxWeight)
  /** Corpus-unigram LM quality score (mean token NLL per doc, per
    * source). */
  def unigramLogprob(): DataFrame = TextOps.unigramLogprob(spark, dir)
  /** Within-doc word entropy per source (word-diversity axis). */
  def docEntropy(): DataFrame = TextOps.docEntropy(spark, dir)
  /** Gopher stopword-ratio rule with a corpus-derived top-k list. */
  def stopwordStats(k: Int = 20): DataFrame =
    TextOps.stopwordStats(spark, dir, k)
  /** One-row corpus vocabulary health (|V|, mass, hapax, TTR). */
  def vocabStats(): DataFrame = TextOps.vocabStats(spark, dir)
  /** GPT-3-style verbatim 13-gram decontamination scan. */
  def contaminationNgram(bench: Seq[String],
                         n: Int = 13): DataFrame =
    TextOps.contaminationNgram(spark, dir, bench, n)

  // —— similarity search ——
  def cosineTopk(queryId: Long = 0, k: Int = 10): DataFrame =
    VectorOps.cosineTopk(spark, dir, queryId, k)
  def knnLabelCount(queryId: Long = 0, k: Int = 50): DataFrame =
    VectorOps.knnLabelCount(spark, dir, queryId, k)
  /** Top-k similar pairs via LSH candidates + exact verify (the scale
    * plan; [[VectorOps.embedTopkPairs]] is the all-pairs test baseline). */
  def embedTopkPairs(k: Int = 20): DataFrame =
    VectorOps.embedTopkPairsLsh(spark, dir, k)
  /** Near-dup pairs via LSH candidates + exact verify (the scale plan). */
  def embedNearDup(threshold: Double = 0.4): DataFrame =
    VectorOps.embedNearDupLsh(spark, dir, threshold)
  /** Embedding near-dup pair graph closed into connected components. */
  def embedClusters(threshold: Double = 0.4): DataFrame =
    VectorOps.embedClusters(spark, dir, threshold)
  /** The vector-side apply stage: the kept vector set after keeper
    * selection (shares the cached labels with [[embedClusters]]). */
  def embedApply(threshold: Double = 0.4): DataFrame =
    VectorOps.embedApply(spark, dir, threshold)
  def annLshTopk(queryId: Long = 0, k: Int = 10): DataFrame =
    VectorOps.annLshTopk(spark, dir, queryId, k)
  def annIvfTopk(queryId: Long = 0, k: Int = 10): DataFrame =
    VectorOps.annIvfTopk(spark, dir, queryId, k)
  /** IVF with the seeded distributed k-means quantizer (same plumbing). */
  def annIvfTopkKmeans(queryId: Long = 0, k: Int = 10): DataFrame =
    VectorOps.annIvfTopkKmeans(spark, dir, queryId, k)
  /** IVF served from the cid-partitioned store layout (built per JVM). */
  def annIvfTopkStore(queryId: Long = 0, k: Int = 10): DataFrame =
    VectorOps.annIvfTopkStoreQuery(spark, dir, queryId, k)
  def ivfCellStats(): DataFrame = VectorOps.ivfCellStats(spark, dir)
  /** Recall@k of both ANN paths vs the exact top-k (index-trust
    * observability). */
  def annRecall(queryId: Long = 0, k: Int = 10): DataFrame =
    VectorOps.annRecall(spark, dir, queryId, k)
  /** Per-dimension embedding moments (embedding QA before index
    * builds). */
  def embedDimStats(): DataFrame = VectorOps.embedDimStats(spark, dir)
  /** Int8 quantization reconstruction error per label (compression-loss
    * QA). */
  def embedQuantizeError(): DataFrame =
    VectorOps.embedQuantizeError(spark, dir)
  /** IVF recall@k per nprobe — the probe-count tuning curve. */
  def annIvfRecallSweep(queryId: Long = 0, k: Int = 10,
                        nprobes: Seq[Int] = Seq(1, 2, 4, 8)): DataFrame =
    VectorOps.annIvfRecallSweep(spark, dir, queryId, k, nprobes)
  // —— feature-index-served read paths (built per JVM; see FeatureIndex) ——
  def indexedMinhashPairs(threshold: Double = 0.9): DataFrame =
    graft.streaming.FeatureIndex.indexedMinhashPairs(spark, dir, threshold)
  def indexedAnnLshTopk(queryId: Long = 0, k: Int = 10): DataFrame =
    graft.streaming.FeatureIndex.indexedAnnLshTopk(spark, dir, queryId, k)
  /** Batch-query IVF: top-k for each of the first `nQueries` vectors
    * in one distributed plan (the retrieval-pass serving shape). */
  def annIvfBatchTopk(nQueries: Int = 5, k: Int = 10): DataFrame =
    VectorOps.annIvfBatchTopk(spark, dir, nQueries, k)
  /** Batch-query LSH top-k (the same serving shape on the LSH path). */
  def annLshBatchTopk(nQueries: Int = 5, k: Int = 10): DataFrame =
    VectorOps.annLshBatchTopk(spark, dir, nQueries, k)
  /** Vocabulary top-k served from the ingest-built word-count index
    * table. */
  def indexedTopTerms(k: Int = 20): DataFrame =
    graft.streaming.FeatureIndex.indexedTopTerms(spark, dir, k)
  def indexedAnnIvfTopk(queryId: Long = 0, k: Int = 10): DataFrame =
    graft.streaming.FeatureIndex.indexedAnnIvfTopk(spark, dir, queryId, k)

  // —— event-stream analysis ——
  def sessionize(gapSeconds: Long = 3600): DataFrame =
    EventOps.sessionize(spark, dir, gapSeconds)
  /** Skew-safe sessionize: pre-bucket by (user, day), stitch boundaries
    * (parity-pinned against [[sessionize]]). */
  def sessionizeSkewSafe(gapSeconds: Long = 3600,
                         bucketSeconds: Long = 86400): DataFrame =
    EventOps.sessionizePreBucketed(spark, dir, gapSeconds, bucketSeconds)
  def funnel(stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame =
    EventOps.funnel(spark, dir, stages)
  def transitions(): DataFrame = EventOps.transitions(spark, dir)
  /** First-seen-week cohorts × activity-week user counts. */
  /** DAU + exact trailing-window WAU per observed day. */
  def activeUsers(window: Int = 7): DataFrame =
    EventOps.activeUsers(spark, dir, window)
  def cohortRetention(bucketSeconds: Long = 604800L): DataFrame =
    EventOps.cohortRetention(spark, dir, bucketSeconds)
  def jsonProps(): DataFrame = EventOps.jsonProps(spark, dir)
  /** Unordered event-type co-occurrence matrix with Jaccard affinity. */
  def eventCoOccurrence(): DataFrame = EventOps.eventCoOccurrence(spark, dir)
  /** Ordered funnel under a conversion deadline (windowFunnel). */
  def funnelWindowed(stages: Seq[String] = Seq("view", "click", "purchase"),
                     windowSeconds: Long = 86400L): DataFrame =
    EventOps.funnelWindowed(spark, dir, stages, windowSeconds)
  /** Events-per-user skew histogram (integer log2 buckets). */
  def userActivityHist(): DataFrame = EventOps.userActivityHist(spark, dir)
  /** RFM quartile segmentation over the per-user summary. */
  def eventsRfm(buckets: Int = 4): DataFrame =
    EventOps.eventsRfm(spark, dir, buckets)

  // —— retrieval / quality observability (round 11) ——
  /** BM25 ranked retrieval off the shared word-count feature table. */
  def bm25Search(terms: Seq[String] = Seq("spark", "merge"),
                 k: Int = 15): DataFrame =
    TextOps.bm25Search(spark, dir, terms, k = k)
  /** The same BM25 served from the persisted word-count index table. */
  def indexedBm25Search(terms: Seq[String] = Seq("spark", "merge"),
                        k: Int = 15): DataFrame =
    graft.streaming.FeatureIndex.indexedBm25Search(spark, dir, terms, k)
  /** Per-source inter-document shingle novelty (inverse boilerplate). */
  def docNovelty(): DataFrame = TextOps.docNovelty(spark, dir)
  /** Stage-by-stage survivors of the quality_apply gate cascade. */
  def qualityFunnel(minScore: Double = 0.8, minChars: Long = 150,
                    maxRep: Double = 0.02): DataFrame =
    TextOps.qualityFunnel(spark, dir, minScore, minChars, maxRep)
  /** Per-source language-ID confidence (micro-averaged vote margin). */
  def langIdMargin(): DataFrame = TextOps.langIdMargin(spark, dir)
  /** Per-label centroid outliers (exact-integer deviation ranks). */
  def embedOutliers(k: Int = 3): DataFrame =
    VectorOps.embedOutliers(spark, dir, k)
  /** Product-quantization ANN top-k over the cached codes table. */
  def annPqTopk(queryId: Long = 0, k: Int = 10): DataFrame =
    VectorOps.annPqTopk(spark, dir, queryId, k)
  /** PQ recall vs the exact integer-L2 top-k. */
  def annPqRecall(queryId: Long = 0, k: Int = 10): DataFrame =
    VectorOps.annPqRecall(spark, dir, queryId, k)
  /** PQ top-k from the ingest-maintained codes table + frozen codebook. */
  def indexedAnnPqTopk(queryId: Long = 0, k: Int = 10): DataFrame =
    graft.streaming.FeatureIndex.indexedAnnPqTopk(spark, dir, queryId, k)
  /** IVFADC: coarse-cell candidate pruning + PQ ADC candidate scoring —
    * the two cached feature tables serving together. */
  def annIvfPqTopk(queryId: Long = 0, k: Int = 10): DataFrame =
    VectorOps.annIvfPqTopk(spark, dir, queryId, k)
  /** Pairwise source shingle-set Jaccard (corpus-composition audit). */
  def sourceSimilarity(): DataFrame = TextOps.sourceSimilarity(spark, dir)
  /** PageRank centrality over the event-type transition graph. */
  def eventPagerank(iters: Int = 15): DataFrame =
    EventOps.eventPagerank(spark, dir, iters)
  /** IVFADC served entirely from the durable ingest-built index. */
  def indexedAnnIvfPqTopk(queryId: Long = 0, k: Int = 10): DataFrame =
    graft.streaming.FeatureIndex.indexedAnnIvfPqTopk(spark, dir, queryId, k)
  /** Top-k most-correlated embedding dimension pairs (PQ design QA). */
  def embedCovariance(k: Int = 10): DataFrame =
    VectorOps.embedCovariance(spark, dir, k)
  /** Zipf-law fit (slope/intercept/R²) over the top-100 vocabulary. */
  def vocabZipf(topR: Int = 100): DataFrame =
    TextOps.vocabZipf(spark, dir, topR)
  /** DSIR importance weights: per-source mean target-vs-raw hashed-ngram
    * log-ratio (Xie et al. 2023). */
  def dsirWeights(targetSources: Seq[String],
                  nBuckets: Int = 16): DataFrame =
    TextOps.dsirWeights(spark, dir, targetSources, nBuckets)
  /** Overlapping word-window chunking with per-chunk fingerprints. */
  def chunkDocuments(chunk: Int = 64, stride: Int = 48): DataFrame =
    TextOps.chunkDocuments(spark, dir, chunk, stride)
  /** SemDeDup: exact near-dup pairs within coarse-quantizer cells. */
  def semDedup(nCentroids: Int = 16, threshold: Double = 0.93): DataFrame =
    VectorOps.semDedup(spark, dir, nCentroids, threshold)
  /** Radius search: the full cosine band around a query vector. */
  def annRangeSearch(queryId: Long = 0, minSim: Double = 0.5): DataFrame =
    VectorOps.annRangeSearch(spark, dir, queryId, minSim)
  /** SQ8 ANN: integer-code candidates off the 1-byte/dim codes table,
    * exact rerank on candidates only. */
  def annSq8Topk(queryId: Long = 0, k: Int = 10,
                 rerank: Int = 30): DataFrame =
    VectorOps.annSq8Topk(spark, dir, queryId, k, rerank)
  /** Last-touch attribution: purchases and revenue per touch channel. */
  def eventAttribution(touches: Seq[String] = Seq("view", "click"),
                       windowSec: Long = 86400L): DataFrame =
    EventOps.eventAttribution(spark, dir, touches, windowSec)

  /** Gopher-style rule gate: per-source fail counts + survivors. */
  def gopherRules(minWords: Long = 50, maxWords: Long = 100000): DataFrame =
    TextOps.gopherRules(spark, dir, minWords, maxWords)
  /** Joint-bigram LM surprisal per source. */
  def bigramLogprob(): DataFrame = TextOps.bigramLogprob(spark, dir)
  /** Per-source KL divergence from the corpus unigram mix. */
  def sourceKl(): DataFrame = TextOps.sourceKl(spark, dir)
  /** Session-shape histogram over the sessionize output. */
  def sessionStats(gapSeconds: Long = 3600, capBucket: Int = 10): DataFrame =
    EventOps.sessionStats(spark, dir, gapSeconds, capBucket)
  /** Conversion latency between consecutive funnel stages. */
  def funnelTimeToConvert(stages: Seq[String] =
      Seq("view", "click", "purchase")): DataFrame =
    EventOps.funnelTimeToConvert(spark, dir, stages)
  /** Per-origin transition entropy of the behavior Markov chain. */
  def markovEntropy(): DataFrame = EventOps.markovEntropy(spark, dir)
  /** Per-type return-cadence quantiles of same-type arrival gaps. */
  def eventIntervals(ps: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame =
    EventOps.eventIntervals(spark, dir, ps)
  /** Lifetime audience Jaccard per event-type pair. */
  def eventUserOverlap(): DataFrame = EventOps.eventUserOverlap(spark, dir)
  /** Near-dup pair counts at a ladder of cosine thresholds (one pass). */
  def embedThresholdSweep(thresholds: Seq[Double] =
      Seq(0.3, 0.35, 0.4, 0.45, 0.5)): DataFrame =
    VectorOps.embedThresholdSweep(spark, dir, thresholds)
  /** Power-iteration top-principal-direction projection stats per label. */
  def embedPcaProject(iters: Int = 8): DataFrame =
    VectorOps.embedPcaProject(spark, dir, iters)
  /** Pairwise label-centroid distances. */
  def embedCentroidDistances(): DataFrame =
    VectorOps.embedCentroidDistances(spark, dir)

  // —— multimodal plumbing ——
  /** Full decode output incl. the 8-dim feature vector (the typed
    * mapPartitions stage). */
  def decodeFeatures(): DataFrame =
    MultimodalOps.decodeFeatures(spark, dir).toDF()
  /** Scalar decode metadata only (the oracle-shaped projection). */
  def decodeMeta(): DataFrame =
    MultimodalOps.decodeStubQuery(spark, dir)
  def frameSample(stride: Int = 10): DataFrame =
    MultimodalOps.frameSampleQuery(spark, dir, stride)
  /** REAL multi-frame sampling: animated-GIF roundtrip, random-access
    * decode of only the stride-sampled frames. */
  def frameSampleReal(stride: Int = 3): DataFrame =
    MultimodalOps.frameSampleRealQuery(spark, dir, stride)
  /** Overlapping STFT-shaped audio analysis windows with tail padding. */
  def audioWindows(window: Int = 400, hop: Int = 160): DataFrame =
    MultimodalOps.audioWindowQuery(spark, dir, window, hop)
  def resizePlan(target: Int = 224): DataFrame =
    MultimodalOps.resizeQuery(spark, dir, target)
  /** Perceptual-hash dedup groups over the decoded media features. */
  def phashDedup(): DataFrame = MultimodalOps.phashDedup(spark, dir)
  /** REAL `javax.imageio` PNG/BMP decode roundtrip (dims + pixel sum). */
  def decodeReal(): DataFrame = MultimodalOps.decodeRealQuery(spark, dir)
  /** REAL nearest-neighbor thumbnail of the decoded raster. */
  def resizeReal(): DataFrame = MultimodalOps.resizeRealQuery(spark, dir)
  /** REAL `javax.sound.sampled` WAV decode roundtrip (sample sums). */
  def decodeAudioReal(): DataFrame =
    MultimodalOps.decodeAudioRealQuery(spark, dir)
  /** Per-frame energy (sum of squares) over the real decoded WAV. */
  def audioRmsReal(frame: Int = 32): DataFrame =
    MultimodalOps.audioRmsReal(spark, dir, frame).toDF()
      .orderBy("doc_id", "frame")

  // —— round-11 wave 2 ——
  /** STL-lite trend/seasonal/residual split of one metric's grid. */
  def seriesSeasonalDecompose(metric: String = "events.purchase",
                              season: Int = 24, half: Int = 12): DataFrame =
    SeriesOps.seriesSeasonalDecompose(spark, dir, metric,
      SeriesOps.From, SeriesOps.Until, season, half)
  /** Per-metric MAE/WAPE forecast QA of the Holt–Winters walk. */
  def seriesForecastError(season: Int = 24): DataFrame =
    SeriesOps.seriesForecastError(spark, dir,
      SeriesOps.From, SeriesOps.Until, season)
  /** Rollup dry-run: per-metric emit/suppress counts and reduction. */
  def rollupPlan(fineStep: Long = 3600L,
                 coarseStep: Long = 86400L): DataFrame =
    SeriesOps.rollupPlan(spark, dir, fineStep, coarseStep)
  /** One-row trend/seasonal strength summary of the decomposition. */
  def seriesStlStrength(metric: String = "events.purchase"): DataFrame =
    SeriesOps.seriesStlStrength(spark, dir, metric,
      SeriesOps.From, SeriesOps.Until, 24, 12)
  /** Seasonal-aware anomaly flags on the decompose residuals. */
  def seriesAnomalyStl(metric: String = "events.purchase",
                       sigma: Double = 3.0): DataFrame =
    SeriesOps.seriesAnomalyStl(spark, dir, metric,
      SeriesOps.From, SeriesOps.Until, 24, 12, sigma)
  /** Offline CUSUM mean-shift changepoint scan. */
  def seriesChangepoint(metric: String = "events.purchase"): DataFrame =
    SeriesOps.seriesChangepoint(spark, dir, metric,
      SeriesOps.From, SeriesOps.Until)
  /** Per-lag sample autocorrelation (ACF) of one metric's grid. */
  def seriesAutocorrelation(metric: String = "events.view",
                            maxLag: Int = 48): DataFrame =
    SeriesOps.seriesAutocorrelation(spark, dir, metric,
      SeriesOps.From, SeriesOps.Until, maxLag)
  /** Modified z-score (median/MAD) robust outlier flags. */
  def seriesOutlierMad(metric: String = "events.view",
                       cutoff: Double = 3.5): DataFrame =
    SeriesOps.seriesOutlierMad(spark, dir, metric,
      SeriesOps.From, SeriesOps.Until, cutoff)
  /** Directed shingle-containment subset/quote near-dup pairs. */
  def containmentPairs(threshold: Double = 0.8,
                       maxDf: Long = 64L): DataFrame =
    TextOps.containmentPairs(spark, dir, threshold, maxDf)
  /** TF-IDF cosine pairs over the df-capped distinctive vocabulary. */
  def tfidfPairs(threshold: Double = 0.3, maxDf: Long = 64L): DataFrame =
    TextOps.tfidfPairs(spark, dir, threshold, maxDf)
  /** The same tf-idf pairs served from the persisted word-count index. */
  def indexedTfidfPairs(threshold: Double = 0.3,
                        maxDf: Long = 64L): DataFrame =
    graft.streaming.FeatureIndex.indexedTfidfPairs(spark, dir, threshold,
      maxDf)
  /** Theil–Sen robust trend slope (median of pairwise slopes). */
  def seriesTheilSen(metric: String = "events.purchase"): DataFrame =
    SeriesOps.seriesTheilSen(spark, dir, metric,
      SeriesOps.From, SeriesOps.Until)
  /** Per-document top-k tf-idf keyphrases. */
  def docKeyphrases(k: Int = 3): DataFrame =
    TextOps.docKeyphrases(spark, dir, k)
  /** Shingle df skew histogram (the maxDf-cap evidence). */
  def shingleDfHist(): DataFrame = TextOps.shingleDfHist(spark, dir)
  /** Dup-family size histogram (integer log2 buckets). */
  def dedupClusterSizes(threshold: Double = 0.9): DataFrame =
    TextOps.dedupClusterSizes(spark, dir, threshold)
  /** Top-k adjacent-bigram PMI collocations. */
  def tokenPmiPairs(minCount: Long = 5, k: Int = 20): DataFrame =
    TextOps.tokenPmiPairs(spark, dir, minCount, k)
  /** Centroid-based silhouette per label. */
  def embedSilhouette(): DataFrame = VectorOps.embedSilhouette(spark, dir)
  /** Batched IVF top-k off the cid-partitioned store (one pruned scan). */
  def annIvfBatchStore(nQueries: Int = 5, k: Int = 10): DataFrame =
    VectorOps.annIvfBatchStoreQuery(spark, dir, nQueries, k)
  /** Per-label centroid drift between ingest-batch parities. */
  def embedCentroidShift(): DataFrame =
    VectorOps.embedCentroidShift(spark, dir)
  /** Keyphrases served from the persisted word-count index. */
  def indexedDocKeyphrases(k: Int = 3): DataFrame =
    graft.streaming.FeatureIndex.indexedDocKeyphrases(spark, dir, k)
  /** Heaps'-law vocabulary growth curve at doc-rank checkpoints. */
  def vocabGrowth(points: Int = 10): DataFrame =
    TextOps.vocabGrowth(spark, dir, points)
  /** Per-source PII (email/phone/IPv4) observability scan. */
  def piiStats(): DataFrame = TextOps.piiStats(spark, dir)
  /** Top-k discovered session event-type paths. */
  def eventPathTopk(gapSeconds: Long = 3600, maxSteps: Int = 8,
                    k: Int = 20): DataFrame =
    EventOps.eventPathTopk(spark, dir, gapSeconds, maxSteps, k)
  /** Per-day KL drift of the event-type mix vs the corpus mix. */
  def eventMixDrift(): DataFrame = EventOps.eventMixDrift(spark, dir)
  /** Space-saving guarantee audit (the streaming heavyHitters fold,
    * batch-replayed and checked against exact counts). */
  def eventHeavyHittersApprox(shards: Int = 4,
                              capacity: Int = 16): DataFrame =
    EventOps.eventHeavyHittersApprox(spark, dir, shards, capacity)
  /** Hour-of-day seasonality profile per event type. */
  def eventSeasonality(): DataFrame = EventOps.eventSeasonality(spark, dir)
  /** Exact micro-unit LTV decile segmentation. */
  def userValueDeciles(buckets: Int = 10): DataFrame =
    EventOps.userValueDeciles(spark, dir, buckets)
  /** Max-inner-product (unnormalized) top-k retrieval. */
  def mipsTopk(queryId: Long = 0, k: Int = 10): DataFrame =
    VectorOps.mipsTopk(spark, dir, queryId, k)
  /** LSH neighbor-graph degree histogram (tunes tables/bits). */
  def embedKnnDegreeHist(tables: Int = 16, bits: Int = 6): DataFrame =
    VectorOps.embedKnnDegreeHist(spark, dir, tables, bits)
  /** MMR diversified top-k retrieval (λ = 1/2). */
  def mmrTopk(queryId: Long = 0, k: Int = 5, pool: Int = 50): DataFrame =
    VectorOps.mmrTopk(spark, dir, queryId, k, pool)

  // —— round-16 wave ——
  /** Count-min sketch frequency audit at the exact top-k terms. */
  def sketchCmsTopk(depth: Int = 4, width: Int = 512,
                    k: Int = 20): DataFrame =
    TextOps.sketchCmsTopk(spark, dir, depth, width, k)
  /** Bloom-filter decontamination pre-screen + exact audit. */
  def contaminationBloom(bench: Seq[String] = Seq("src12", "src18"),
                         kHash: Int = 3, m: Int = 8192): DataFrame =
    TextOps.contaminationBloom(spark, dir, bench, kHash, m)
  /** Linear-counting distinct-user bitmap audit per event type. */
  def sketchLinearCount(m: Int = 256): DataFrame =
    EventOps.sketchLinearCount(spark, dir, m)
  /** Training-output shard balance audit on the stable md5 bucket. */
  def shardAssign(nShards: Int = 8): DataFrame =
    TextOps.shardAssign(spark, dir, nShards)
  /** Per-frame zero-crossing counts over the real decoded WAV. */
  def audioZcrReal(frame: Int = 32): DataFrame =
    MultimodalOps.audioZcrReal(spark, dir, frame).toDF()
      .orderBy("doc_id", "frame")

  // —— round-17 wave ——
  /** HyperLogLog distinct audit over the rolling WAU window: per-day
    * register maxima next to the exact trailing distinct. */
  def sketchHllUsers(p: Int = 6, window: Int = 7): DataFrame =
    EventOps.sketchHllUsers(spark, dir, p, window)
  /** Mergeable hash-sample quantile sketch audit (sample vs exact). */
  def sketchQuantileSample(mod: Long = 4): DataFrame =
    TextOps.sketchQuantileSample(spark, dir, mod)
  /** pHash near-dup pair graph closed into connected components
    * (exact collisions included; keeper = min doc_id). */
  def phashClusters(maxHamming: Int = 3): DataFrame =
    MultimodalOps.phashClusters(spark, dir, maxHamming)
  /** The multimodal dedup apply: kept assets after keeper selection. */
  def phashDedupApply(maxHamming: Int = 3): DataFrame =
    MultimodalOps.phashDedupApply(spark, dir, maxHamming)
  /** Asset dup-family size histogram (integer log2 buckets). */
  def phashClusterSizes(maxHamming: Int = 3): DataFrame =
    MultimodalOps.phashClusterSizes(spark, dir, maxHamming)
  /** Embedding incremental admission served from the persisted
    * emb_buckets index (candidates restricted to the arriving batch). */
  def indexedEmbedDedupIncremental(threshold: Double = 0.4): DataFrame =
    graft.streaming.FeatureIndex.indexedEmbedDedupIncremental(
      spark, dir, threshold)
  /** KMV bottom-k distinct sketch audit (per type + `__all__` union). */
  def sketchKmvDistinct(k: Int = 8): DataFrame =
    EventOps.sketchKmvDistinct(spark, dir, k)
  /** Theta-sketch set-operation audit over event-type pairs. */
  def sketchKmvSetops(k: Int = 8): DataFrame =
    EventOps.sketchKmvSetops(spark, dir, k)
  /** Watermark-dedup (alert-dedup) batch replay: per-event verdicts. */
  def streamDedupReplay(horizonSec: Long = 172800): DataFrame =
    EventOps.streamDedupReplay(spark, dir, horizonSec)
  /** Streaming admission-gate batch replay (index + watermark chain). */
  def streamAdmissionReplay(horizonSec: Long = 172800,
                            indexDays: Int = 3): DataFrame =
    EventOps.streamAdmissionReplay(spark, dir, horizonSec, indexDays)
  /** Watermark-lateness audit under bounded synthetic disorder. */
  def streamLateEvents(disorderSec: Long = 172800,
                       delaySec: Long = 86400): DataFrame =
    EventOps.streamLateEvents(spark, dir, disorderSec, delaySec)
  /** Token-bucket throttle replay (exact milli-token balances). */
  def streamRateLimitReplay(burstTokens: Int = 2,
                            refillSec: Long = 86400): DataFrame =
    EventOps.streamRateLimitReplay(spark, dir, burstTokens, refillSec)
  /** Provisioned-at-mean windowed backlog replay (Lindley recursion). */
  def streamBacklogReplay(windowSec: Long = 21600): DataFrame =
    EventOps.streamBacklogReplay(spark, dir, windowSec)
  /** AMS tug-of-war F2 sketch audit (signed sums vs exact self-join). */
  def sketchAmsF2(rows: Int = 8): DataFrame =
    EventOps.sketchAmsF2(spark, dir, rows)
  /** AMS inner-product join-size sketch audit per type pair. */
  def sketchAmsJoin(rows: Int = 8): DataFrame =
    EventOps.sketchAmsJoin(spark, dir, rows)
}

object Pipeline {
  def open(spark: SparkSession, dir: String): Pipeline =
    new Pipeline(spark, dir)
}
