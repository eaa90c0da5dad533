package graft

import org.scalatest.funsuite.AnyFunSuite

/** The Pipeline facade delegates to the operator modules — each method
  * must produce a non-empty, correctly-shaped result on the fixture. */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import SparkTestBase.Sf0001

  test("every pipeline stage returns a well-formed non-empty result") {
    val p = Pipeline.open(spark, Sf0001)
    val stages: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "dedupExact" -> p.dedupExact(),
      "dedupNorm" -> p.dedupNorm(),
      "dedupJaccard" -> p.dedupJaccard(),
      "dedupMinhashLsh" -> p.dedupMinhashLsh(),
      "dedupSimhash" -> p.dedupSimhash(),
      "docFingerprint" -> p.docFingerprint(),
      "trainSplit" -> p.trainSplit(),
      "contamination" -> p.contamination(),
      "textStats" -> p.textStats(),
      "tokenCount" -> p.tokenCount(),
      "langId" -> p.langId(),
      "qualityScore" -> p.qualityScore(),
      "topTerms" -> p.topTerms(),
      "cosineTopk" -> p.cosineTopk(),
      "knnLabelCount" -> p.knnLabelCount(),
      "embedTopkPairs" -> p.embedTopkPairs(),
      "embedNearDup" -> p.embedNearDup(),
      "annLshTopk" -> p.annLshTopk(),
      "annIvfTopk" -> p.annIvfTopk(),
      "sessionize" -> p.sessionize(),
      "funnel" -> p.funnel(),
      "transitions" -> p.transitions(),
      "jsonProps" -> p.jsonProps(),
      "decodeFeatures" -> p.decodeFeatures(),
      "decodeMeta" -> p.decodeMeta(),
      "frameSample" -> p.frameSample(),
      "resizePlan" -> p.resizePlan(),
      "topTermsByLang" -> p.topTermsByLang(),
      "docLengthQuantiles" -> p.docLengthQuantiles(),
      "docRepetition" -> p.docRepetition(),
      "sourceCapSample" -> p.sourceCapSample(),
      "annIvfTopkStore" -> p.annIvfTopkStore(),
      "ivfCellStats" -> p.ivfCellStats(),
      "indexedMinhashPairs" -> p.indexedMinhashPairs(),
      "indexedAnnLshTopk" -> p.indexedAnnLshTopk(),
      "indexedAnnIvfTopk" -> p.indexedAnnIvfTopk(),
      "dedupClusters" -> p.dedupClusters(),
      "dedupIncremental" -> p.dedupIncremental(),
      "dedupIncrementalStats" -> p.dedupIncrementalStats(),
      "paraDupStats" -> p.paraDupStats(),
      "paraDedupApply" -> p.paraDedupApply(),
      "paraDedupIncremental" -> p.paraDedupIncremental(),
      "batchVocabDrift" -> p.batchVocabDrift(),
      "bpeFertility" -> p.bpeFertility(),
      "packSequencesBpe" -> p.packSequencesBpe(),
      "embedDedupIncremental" -> p.embedDedupIncremental(),
      "dedupApply" -> p.dedupApply(),
      "embedClusters" -> p.embedClusters(),
      "embedApply" -> p.embedApply(),
      "annIvfTopkKmeans" -> p.annIvfTopkKmeans(),
      "sessionizeSkewSafe" -> p.sessionizeSkewSafe(),
      "cohortRetention" -> p.cohortRetention(),
      "contaminationMatrix" -> p.contaminationMatrix(),
      "indexedSimhashPairs" -> p.indexedSimhashPairs(),
      "dedupAgreement" -> p.dedupAgreement(),
      "spanDupStats" -> p.spanDupStats(),
      "annRecall" -> p.annRecall(),
      "embedDimStats" -> p.embedDimStats(),
      "minhashEstError" -> p.minhashEstError(),
      "qualityHistogram" -> p.qualityHistogram(),
      "dedupRateBySource" -> p.dedupRateBySource(),
      "annIvfRecallSweep" -> p.annIvfRecallSweep(),
      "embedQuantizeError" -> p.embedQuantizeError(),
      "contaminationApply" -> p.contaminationApply(Seq("src12", "src18")),
      "indexStats" -> p.indexStats(),
      "splitLeakage" -> p.splitLeakage(),
      "packEfficiency" -> p.packEfficiency(),
      "qualityApply" -> p.qualityApply(),
      "packSequences" -> p.packSequences(),
      "tfidfTerms" -> p.tfidfTerms(),
      "bm25Search" -> p.bm25Search(),
      "indexedBm25Search" -> p.indexedBm25Search(),
      "docNovelty" -> p.docNovelty(),
      "qualityFunnel" -> p.qualityFunnel(),
      "langIdMargin" -> p.langIdMargin(),
      "embedOutliers" -> p.embedOutliers(),
      "annPqTopk" -> p.annPqTopk(),
      "annPqRecall" -> p.annPqRecall(),
      "eventCoOccurrence" -> p.eventCoOccurrence(),
      "userActivityHist" -> p.userActivityHist(),
      "eventsRfm" -> p.eventsRfm(),
      "funnelWindowed" -> p.funnelWindowed(),
      "indexedAnnPqTopk" -> p.indexedAnnPqTopk(),
      "annIvfPqTopk" -> p.annIvfPqTopk(),
      "sourceSimilarity" -> p.sourceSimilarity(),
      "eventPagerank" -> p.eventPagerank(),
      "indexedAnnIvfPqTopk" -> p.indexedAnnIvfPqTopk(),
      "embedCovariance" -> p.embedCovariance(),
      "vocabZipf" -> p.vocabZipf(),
      "seriesSeasonalDecompose" -> p.seriesSeasonalDecompose(),
      "seriesChangepoint" -> p.seriesChangepoint(),
      "seriesOutlierMad" -> p.seriesOutlierMad(),
      "containmentPairs" -> p.containmentPairs(),
      "piiStats" -> p.piiStats(),
      "eventSeasonality" -> p.eventSeasonality(),
      "userValueDeciles" -> p.userValueDeciles(),
      "mipsTopk" -> p.mipsTopk(),
      "seriesAutocorrelation" -> p.seriesAutocorrelation(),
      "tfidfPairs" -> p.tfidfPairs(),
      "indexedTfidfPairs" -> p.indexedTfidfPairs(),
      "vocabGrowth" -> p.vocabGrowth(),
      "eventPathTopk" -> p.eventPathTopk(),
      "seriesAnomalyStl" -> p.seriesAnomalyStl(),
      "seriesTheilSen" -> p.seriesTheilSen(),
      "docKeyphrases" -> p.docKeyphrases(),
      "embedSilhouette" -> p.embedSilhouette(),
      "audioWindows" -> p.audioWindows(),
      "embedCentroidShift" -> p.embedCentroidShift(),
      "indexedDocKeyphrases" -> p.indexedDocKeyphrases(),
      "annIvfBatchStore" -> p.annIvfBatchStore(),
      "tokenPmiPairs" -> p.tokenPmiPairs(),
      "dedupClusterSizes" -> p.dedupClusterSizes(),
      "rollupPlan" -> p.rollupPlan(),
      "mmrTopk" -> p.mmrTopk(),
      "seriesForecastError" -> p.seriesForecastError(),
      "seriesStlStrength" -> p.seriesStlStrength(),
      "embedKnnDegreeHist" -> p.embedKnnDegreeHist(),
      "shingleDfHist" -> p.shingleDfHist(),
      "eventMixDrift" -> p.eventMixDrift())
    stages.foreach { case (name, df) =>
      assert(df.count() > 0, s"$name returned no rows")
      assert(df.columns.nonEmpty, s"$name has no columns")
    }
  }

  test("facade results equal the operator-module results") {
    val p = Pipeline.open(spark, Sf0001)
    val viaFacade = p.cosineTopk(0, 10).collect().toSeq
    val direct = operators.VectorOps.cosineTopk(spark, Sf0001, 0, 10)
      .collect().toSeq
    assert(viaFacade === direct)
  }

  test("real-codec facade methods equal the operator-module results") {
    val p = Pipeline.open(spark, Sf0001)
    assert(p.decodeReal().collect().toSeq ===
      operators.MultimodalOps.decodeRealQuery(spark, Sf0001)
        .collect().toSeq)
    assert(p.resizeReal().collect().toSeq ===
      operators.MultimodalOps.resizeRealQuery(spark, Sf0001)
        .collect().toSeq)
    assert(p.decodeAudioReal().collect().toSeq ===
      operators.MultimodalOps.decodeAudioRealQuery(spark, Sf0001)
        .collect().toSeq)
    assert(p.audioRmsReal(32).collect().toSeq ===
      operators.MultimodalOps.audioRmsRealQuery(spark, Sf0001)
        .collect().toSeq)
  }

  test("round-16 facade faces match their operator twins") {
    val p = Pipeline.open(spark, Sf0001)
    assert(p.sketchCmsTopk(4, 16, 20).collect().toSeq ===
      operators.TextOps.sketchCmsTopk(spark, Sf0001, 4, 16, 20)
        .collect().toSeq)
    assert(p.contaminationBloom().collect().toSeq ===
      operators.TextOps.contaminationBloom(spark, Sf0001)
        .collect().toSeq)
    assert(p.sketchLinearCount(256).collect().toSeq ===
      operators.EventOps.sketchLinearCount(spark, Sf0001, 256)
        .collect().toSeq)
    assert(p.shardAssign(8).collect().toSeq ===
      operators.TextOps.shardAssign(spark, Sf0001, 8).collect().toSeq)
    assert(p.audioZcrReal(32).collect().toSeq ===
      operators.MultimodalOps.audioZcrRealQuery(spark, Sf0001)
        .collect().toSeq)
  }

  test("round-17 facade faces match their operator twins") {
    val p = Pipeline.open(spark, Sf0001)
    assert(p.sketchHllUsers().collect().toSeq ===
      operators.EventOps.sketchHllUsers(spark, Sf0001, 6, 7)
        .collect().toSeq)
    assert(p.sketchQuantileSample().collect().toSeq ===
      operators.TextOps.sketchQuantileSample(spark, Sf0001, 4)
        .collect().toSeq)
    assert(p.phashClusters().collect().toSeq ===
      operators.MultimodalOps.phashClusters(spark, Sf0001, 3)
        .collect().toSeq)
    assert(p.phashDedupApply().collect().toSeq ===
      operators.MultimodalOps.phashDedupApply(spark, Sf0001, 3)
        .collect().toSeq)
    assert(p.phashClusterSizes().collect().toSeq ===
      operators.MultimodalOps.phashClusterSizes(spark, Sf0001, 3)
        .collect().toSeq)
    assert(p.indexedEmbedDedupIncremental().collect().toSeq ===
      graft.streaming.FeatureIndex
        .indexedEmbedDedupIncremental(spark, Sf0001, 0.4).collect().toSeq)
  }

  test("round-17 streaming-replay + KMV facade faces match their twins") {
    val p = Pipeline.open(spark, Sf0001)
    assert(p.sketchKmvDistinct().collect().toSeq ===
      operators.EventOps.sketchKmvDistinct(spark, Sf0001, 8)
        .collect().toSeq)
    assert(p.sketchKmvSetops().collect().toSeq ===
      operators.EventOps.sketchKmvSetops(spark, Sf0001, 8)
        .collect().toSeq)
    assert(p.streamDedupReplay().collect().toSeq ===
      operators.EventOps.streamDedupReplay(spark, Sf0001, 172800)
        .collect().toSeq)
    assert(p.streamAdmissionReplay().collect().toSeq ===
      operators.EventOps.streamAdmissionReplay(spark, Sf0001, 172800, 3)
        .collect().toSeq)
    assert(p.streamLateEvents().collect().toSeq ===
      operators.EventOps.streamLateEvents(spark, Sf0001, 172800, 86400)
        .collect().toSeq)
    assert(p.streamRateLimitReplay().collect().toSeq ===
      operators.EventOps.streamRateLimitReplay(spark, Sf0001, 2, 86400)
        .collect().toSeq)
    assert(p.streamBacklogReplay().collect().toSeq ===
      operators.EventOps.streamBacklogReplay(spark, Sf0001, 21600)
        .collect().toSeq)
    assert(p.sketchAmsF2().collect().toSeq ===
      operators.EventOps.sketchAmsF2(spark, Sf0001, 8).collect().toSeq)
    assert(p.sketchAmsJoin().collect().toSeq ===
      operators.EventOps.sketchAmsJoin(spark, Sf0001, 8).collect().toSeq)
  }
}
