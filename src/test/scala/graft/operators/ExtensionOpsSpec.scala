package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Specs for the LLM-pipeline extension operators (SURVEY §2.9). */
class ExtensionOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import SparkTestBase.Sf0001

  test("dedup keepers partition the corpus: copies sum to the doc count") {
    val total = graft.core.Catalog.documents(spark, Sf0001).count()
    val exact = TextOps.dedupExact(spark, Sf0001)
      .agg(sum("copies")).head.getLong(0)
    val norm = TextOps.dedupNorm(spark, Sf0001)
      .agg(sum("copies")).head.getLong(0)
    assert(exact === total && norm === total)
  }

  test("skew-capped jaccard (maxDf) finds the same pairs as the exact form") {
    val exact = TextOps.dedupJaccard(spark, Sf0001, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val capped = TextOps.dedupJaccard(spark, Sf0001, 0.9, maxDf = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty)
    assert(capped === exact)
  }

  test("quality_apply: every gate filters, kept set is a strict subset") {
    val total = graft.core.Catalog.documents(spark, Sf0001).count()
    def kept(s: Double, c: Long, r: Double) =
      TextOps.qualityApply(spark, Sf0001, s, c, r).count()
    val all = kept(0.8, 150, 0.02)
    assert(all > 0 && all < total)
    // each gate ALONE drops documents from the corpus...
    assert(kept(0.8, 0, 1.0) < total)   // score
    assert(kept(0.0, 150, 1.0) < total) // length
    assert(kept(0.0, 0, 0.02) < total)  // repetition
    // ...and loosening a gate can only grow the kept set (on this
    // fixture the score and repetition gates are strictly binding even
    // given the other two; the length gate is subsumed by the score
    // gate here — short docs score low — so >= only)
    assert(kept(0.0, 150, 0.02) > all)
    assert(kept(0.8, 150, 1.0) > all)
    assert(kept(0.8, 0, 0.02) >= all)
  }

  test("pack_sequences matches a scalar replay of concat-and-split packing") {
    // budget chosen near the fixture's doc lengths so chunk boundaries
    // fall INSIDE documents too (a straddling doc legitimately leaves
    // gaps in a shard's seq ids — consecutive ids are NOT an invariant)
    val budget = 256L
    val packed = TextOps.packSequences(spark, Sf0001, budget, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(packed.nonEmpty)
    // ground truth: replay the packing per shard in plain Scala from the
    // same (shard, doc_id, tok) inputs — doc_id order, running sum,
    // chunk index of each doc's first token
    val docs = graft.core.Catalog.documents(spark, Sf0001)
      .select(col("doc_id"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("long") % 8).as("shard"),
        size(regexp_extract_all(col("text"), lit("\\w+|[^\\w\\s]"), lit(0)))
          .cast("long").as("tok"))
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getLong(2)))
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (shard, rows) =>
      var cum = 0L
      rows.sortBy(_._2).map { case (_, _, tok) =>
        val seq = cum / budget; cum += tok; (shard, seq, tok)
      }
    }.groupBy(t => (t._1, t._2)).toSeq
      .map { case ((sh, sq), ts) =>
        (sh, sq, ts.size.toLong, ts.map(_._3).sum) }
      .sortBy(t => (t._1, t._2))
    assert(packed.toSeq === expected,
      "distributed packing must equal the scalar replay")
    // determinism: the plan re-executes to the identical packing
    assert(TextOps.packSequences(spark, Sf0001, budget, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq === packed.toSeq)
  }

  test("tfidf_terms scores are tf*ln(N/df), ranked descending") {
    val n = graft.core.Catalog.documents(spark, Sf0001).count().toDouble
    val rows = TextOps.tfidfTerms(spark, Sf0001, 20).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length === 20)
    rows.foreach { case (tok, tf, df, score) =>
      assert(df >= 1 && tf >= df, s"$tok: tf=$tf must be >= df=$df >= 1")
      val want = BigDecimal(tf * math.log(n / df))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(score - want) < 1e-9, s"$tok: $score vs $want")
    }
    assert(rows.map(_._4).toSeq === rows.map(_._4).sortBy(-_).toSeq,
      "scores must be non-increasing")
  }

  test("dedup clusters are the connected components of the pair graph") {
    // ground truth: union-find over the (tiny) collected pair list
    val pairs = TextOps.dedupMinhashLsh(spark, Sf0001, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = parent.keys.toSeq.groupBy(find)
      .map { case (root, members) => (root, members.size.toLong) }
      .toSeq.sortBy(_._1)
    val got = TextOps.dedupClusters(spark, Sf0001, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expect)
    // cluster ids are keepers: each is the min doc_id of its component
    assert(got.forall { case (cid, _) => find(cid) == cid })
  }

  test("dedup_apply keeps exactly one doc per cluster plus all unclustered docs") {
    val total = graft.core.Catalog.documents(spark, Sf0001).count()
    val clusters = TextOps.dedupClusters(spark, Sf0001, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val kept = TextOps.dedupApply(spark, Sf0001, 0.9).collect()
      .map(_.getLong(0)).toSet
    // survivorship accounting: each cluster loses (size - 1) members
    assert(kept.size.toLong === total - clusters.map(_._2 - 1).sum)
    // every cluster keeper (its min id) survives
    assert(clusters.forall { case (cid, _) => kept.contains(cid) })
    // the larger side of any near-dup pair can never be its cluster's min
    // (min <= doc_a < doc_b), so every doc_b must have been dropped
    val docBs = TextOps.dedupMinhashLsh(spark, Sf0001, 0.9).collect()
      .map(_.getLong(1)).toSet
    assert(docBs.nonEmpty && docBs.intersect(kept).isEmpty)
  }

  test("dedup_agreement matrix cells reconcile with the two pair sets") {
    val text = TextOps.dedupMinhashLsh(spark, Sf0001, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val embed = VectorOps.embedNearDupLsh(spark, Sf0001, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(text.nonEmpty && embed.nonEmpty)
    val cells = TextOps.dedupAgreement(spark, Sf0001, 0.9, 0.4).collect()
      .map(r => ((r.getBoolean(0), r.getBoolean(1)), r.getLong(2))).toMap
    def cell(t: Boolean, e: Boolean) = cells.getOrElse((t, e), 0L)
    // the (false, false) cell cannot exist: every row came from a pair set
    assert(!cells.contains((false, false)))
    // marginals: each pair set's size is its row/column sum
    assert(cell(true, true) + cell(true, false) === text.size.toLong)
    assert(cell(true, true) + cell(false, true) === embed.size.toLong)
    // the agreement cell is exactly the set intersection
    assert(cell(true, true) === text.intersect(embed).size.toLong)
  }

  test("ann_recall rows equal the manual topk-set intersections") {
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = ids(VectorOps.cosineTopk(spark, Sf0001, 0, 10))
    val want = Map(
      "ivf" -> ids(VectorOps.annIvfTopk(spark, Sf0001, 0, 10)),
      "lsh" -> ids(VectorOps.annLshTopk(spark, Sf0001, 0, 10)))
    val rows = VectorOps.annRecall(spark, Sf0001, 0, 10).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("ivf", "lsh"))
    rows.foreach { r =>
      val hits = want(r.getString(0)).intersect(exact).size.toLong
      assert(r.getLong(1) === hits)
      assert(math.abs(r.getDouble(2) - hits / 10.0) < 1e-9)
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    }
  }

  test("span_dedup_apply keeps exactly the docs under the dup-share gate") {
    val docs = graft.core.Catalog.documents(spark, Sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).trim.toLowerCase.replaceAll("\\s+", " ")))
    def grams(t: String): Set[String] =
      t.split(" ").sliding(13).filter(_.length == 13)
        .map(_.mkString(" ")).toSet
    val docGrams = docs.map { case (id, t) => id -> grams(t) }.toMap
    val df = docGrams.values.flatten.groupBy(identity)
      .map { case (g, xs) => g -> xs.size }
    val expected = docs.collect { case (id, _)
      if docGrams(id).isEmpty ||
        docGrams(id).count(g => df(g) >= 2).toDouble
          / docGrams(id).size <= 0.5 => id
    }.toSet
    val kept = TextOps.spanDedupApply(spark, Sf0001, 0.5, 13).collect()
      .map(_.getLong(0)).toSet
    assert(kept === expected)
    // the fixture plants duplicates, so the gate must drop something —
    // and 13-gram spans must not fire on chance vocabulary collisions,
    // so it must keep most of the corpus
    assert(kept.size < docs.length)
    assert(kept.size > docs.length / 2,
      s"gate dropped ${docs.length - kept.size} of ${docs.length}: " +
        "span unit fires on background collisions")
  }

  test("span_dup_stats reconciles with a driver-side shingle recount") {
    val sh = TextOps.shingles(spark, Sf0001)
      .select("doc_id", "h").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val df = sh.groupBy(_._2).map { case (h, xs) => h -> xs.size }
    val src = graft.core.Catalog.documents(spark, Sf0001)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val want = sh.groupBy { case (d, _) => src(d) }.map { case (s, xs) =>
      s -> ((xs.size.toLong, xs.count { case (_, h) => df(h) >= 2 }.toLong))
    }
    val rows = TextOps.spanDupStats(spark, Sf0001).collect()
    assert(rows.map(_.getString(0)).toSet === want.keySet)
    rows.foreach { r =>
      val (total, dup) = want(r.getString(0))
      assert(r.getLong(1) === total)
      assert(r.getLong(2) === dup)
      assert(math.abs(r.getDouble(3) - dup * 1.0 / total) < 1e-6)
    }
  }

  test("embed_quantize_error reconciles with a driver-side quantize pass") {
    val vecs = graft.core.Catalog.embeddings(spark, Sf0001)
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).map(_.toDouble)))
    def errs(v: Seq[Double]): (Double, Double) = {
      val maxabs = math.max(v.map(math.abs).max, 1e-30)
      val es = v.map(x =>
        math.abs(x - math.floor(x / maxabs * 127 + 0.5) * maxabs / 127))
      (es.max, es.map(e => e * e).sum / v.size)
    }
    val want = vecs.groupBy(_._1).map { case (l, xs) =>
      val es = xs.map(x => errs(x._2))
      l -> ((xs.size.toLong,
        es.map(_._1).sum / es.size, es.map(_._2).sum / es.size))
    }
    val rows = VectorOps.embedQuantizeError(spark, Sf0001).collect()
    assert(rows.map(_.getInt(0)).toSet === want.keySet)
    rows.foreach { r =>
      val (n, me, mse) = want(r.getInt(0))
      assert(r.getLong(1) === n)
      assert(math.abs(r.getDouble(2) - me) < 1e-6)
      assert(math.abs(r.getDouble(3) - mse) < 1e-6)
      // int8 reconstruction error is half-a-step-sized, far below unity
      assert(r.getDouble(2) < 0.05)
    }
  }

  test("ann_ivf_recall_sweep is monotone and its nprobe=4 point matches ann_recall") {
    val rows = VectorOps.annIvfRecallSweep(spark, Sf0001, 0, 10, Seq(1, 2, 4, 8))
      .collect().map(r => r.getLong(0) -> r.getDouble(2))
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 4L, 8L))
    // more probed cells can only add candidates: recall is monotone
    rows.sliding(2).foreach { case Array((_, lo), (_, hi)) =>
      assert(hi >= lo - 1e-9, s"recall must not drop as nprobe grows: $rows")
    }
    val point = VectorOps.annRecall(spark, Sf0001, 0, 10).collect()
      .find(_.getString(0) == "ivf").get.getDouble(2)
    assert(rows.toMap.apply(4L) === point)
  }

  test("pack_efficiency reconciles with pack_sequences' token mass") {
    val seqs = TextOps.packSequences(spark, Sf0001, 2048, 8).collect()
    val bySh = seqs.groupBy(_.getLong(0))
    val rows = TextOps.packEfficiency(spark, Sf0001, 2048, 8).collect()
    assert(rows.map(_.getLong(0)).toSet === bySh.keySet)
    rows.foreach { r =>
      val sh = r.getLong(0)
      val docs = bySh(sh).map(_.getLong(2)).sum
      val toks = bySh(sh).map(_.getLong(3)).sum
      assert(r.getLong(1) === docs)
      assert(r.getLong(2) === toks)
      val chunks = (toks + 2047) / 2048
      assert(r.getLong(3) === chunks)
      assert(math.abs(r.getDouble(4) - toks * 1.0 / (chunks * 2048)) < 1e-6)
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("split_leakage counts the cross-split near-dup pairs exactly") {
    // recompute the split assignment driver-side (same md5 bucket rule)
    def split(id: Long): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(4)
      val b = java.lang.Long.parseLong(hex, 16) % 20
      if (b < 18) "train" else if (b == 18) "val" else "test"
    }
    val pairs = TextOps.dedupJaccard(spark, Sf0001, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = pairs
      .map { case (a, b) => (split(a), split(b)) }
      .filter { case (x, y) => x != y }
      .map { case (x, y) => if (x < y) (x, y) else (y, x) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val rows = TextOps.splitLeakage(spark, Sf0001, 0.9).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rows === want)
  }

  test("contamination_apply drops exactly bench sources + their near-dups") {
    val bench = Set("src3", "src15") // sources with leaks in the fixture
    val docs = graft.core.Catalog.documents(spark, Sf0001)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = TextOps.contamination(spark, Sf0001, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val contaminated = pairs.collect {
      case (a, b) if bench(docs(a)) && !bench(docs(b)) => b
      case (a, b) if bench(docs(b)) && !bench(docs(a)) => a
    }.toSet
    val kept = TextOps.contaminationApply(spark, Sf0001, bench.toSeq, 0.9)
      .collect().map(_.getLong(0)).toSet
    val want = docs.collect {
      case (id, src) if !bench(src) && !contaminated(id) => id
    }.toSet
    assert(kept === want)
    assert(kept.size < docs.size) // bench sources really are excluded
  }

  test("quality_histogram shares sum to 1 and counts sum to source sizes") {
    val sizes = graft.core.Catalog.documents(spark, Sf0001)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = TextOps.qualityHistogram(spark, Sf0001).collect()
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 9) // decile buckets
    }
    val bySrc = rows.groupBy(_.getString(0))
    assert(bySrc.keySet === sizes.keySet)
    bySrc.foreach { case (src, rs) =>
      assert(rs.map(_.getLong(2)).sum === sizes(src))
      assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 1e-4)
    }
  }

  test("mix_weights reconciles with a driver-side recount; shares normalize") {
    val toks = graft.core.Catalog.documents(spark, Sf0001)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("t"))
      .groupBy("source").agg(sum("t").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = toks.values.sum
    val s = toks.size
    val rows = TextOps.mixWeights(spark, Sf0001, 3.0).collect()
    assert(rows.map(_.getString(0)).toSet === toks.keySet)
    val effNum = toks.map { case (src, t) =>
      src -> t * math.min(total * 1.0 / (s.toLong * t), 3.0)
    }
    val effDen = effNum.values.sum
    rows.foreach { r =>
      val src = r.getString(0)
      assert(r.getLong(2) === toks(src))
      assert(math.abs(r.getDouble(3) - toks(src) * 1.0 / total) < 1e-6)
      val w = math.min(total * 1.0 / (s.toLong * toks(src)), 3.0)
      assert(math.abs(r.getDouble(4) - w) < 1e-6)
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 3.0)
      assert(math.abs(r.getDouble(5) - effNum(src) / effDen) < 1e-6)
    }
    // shares and effective shares each normalize to 1
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_.getDouble(5)).sum - 1.0) < 1e-4)
  }

  test("unigram_logprob matches a driver-side scalar LM recount") {
    val docs = graft.core.Catalog.documents(spark, Sf0001)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).trim.toLowerCase.replaceAll("\\s+", " ")))
    val cf = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach(_._3.split(" ").foreach(w => cf(w) = cf.getOrElse(w, 0L) + 1))
    val n = cf.values.sum.toDouble
    val bySrc = docs.groupBy(_._2).map { case (src, ds) =>
      val nlls = ds.map { case (_, _, text) =>
        val ws = text.split(" ")
        val s = ws.map(w => -math.log(cf(w) / n)).sum
        math.rint(s / ws.length * 1e6) / 1e6
      }
      src -> (ds.length.toLong, nlls.sum / nlls.length)
    }
    val rows = TextOps.unigramLogprob(spark, Sf0001).collect()
    assert(rows.map(_.getString(0)).toSet === bySrc.keySet)
    rows.foreach { r =>
      val (nd, avg) = bySrc(r.getString(0))
      assert(r.getLong(1) === nd)
      assert(r.getDouble(2) > 0.0) // rare tokens are surprising: NLL > 0
      assert(math.abs(r.getDouble(2) - avg) < 1e-5)
    }
  }

  test("perplexityFilter: ppl = exp(nll), keep cut consistent and strict") {
    val maxNll = 3.41
    val rows = TextOps.perplexityFilter(spark, Sf0001, maxNll).collect()
    val nDocs = graft.core.Catalog.documents(spark, Sf0001).count()
    assert(rows.length.toLong === nDocs)
    rows.foreach { r =>
      val nll = r.getDouble(2)
      assert(math.abs(r.getDouble(3) - math.rint(math.exp(nll) * 1e6) / 1e6)
        < 2e-6) // ppl displays exp of the same micro-nat score
      // the cut compares integer micro-nats: nll is that integer / 1e6
      assert(r.getBoolean(4) === (math.rint(nll * 1e6) <= maxNll * 1e6))
    }
    val kept = rows.count(_.getBoolean(4))
    assert(kept > 0 && kept < rows.length, "threshold should discriminate")
    // per-source mean of the per-doc scores must equal unigram_logprob's
    val bySrc = rows.groupBy(_.getString(1)).map { case (s, rs) =>
      s -> rs.map(r => math.rint(r.getDouble(2) * 1e6).toLong).sum
        .toDouble / rs.length / 1e6
    }
    TextOps.unigramLogprob(spark, Sf0001).collect().foreach { r =>
      assert(math.abs(bySrc(r.getString(0)) - r.getDouble(2)) < 2e-6)
    }
  }

  test("stopword_stats matches a driver-side recount with the top-20 list") {
    val docs = graft.core.Catalog.documents(spark, Sf0001)
      .select("source", "text").collect()
      .map(r => (r.getString(0),
        r.getString(1).trim.toLowerCase.replaceAll("\\s+", " ").split(" ")))
    val cf = docs.flatMap(_._2).groupBy(identity)
      .map { case (t, xs) => t -> xs.length.toLong }
    val stop = cf.toSeq.sortBy { case (t, n) => (-n, t) }.take(20)
      .map(_._1).toSet
    val bySrc = docs.groupBy(_._1).map { case (src, ds) =>
      val ratios = ds.map { case (_, ws) =>
        ws.count(stop).toDouble / ws.length
      }
      src -> (ds.length.toLong, ratios.sum / ratios.length)
    }
    val rows = TextOps.stopwordStats(spark, Sf0001, 20).collect()
    assert(rows.map(_.getString(0)).toSet === bySrc.keySet)
    rows.foreach { r =>
      val (nd, avg) = bySrc(r.getString(0))
      assert(r.getLong(1) === nd)
      assert(r.getDouble(2) > 0.0 && r.getDouble(2) < 1.0)
      assert(math.abs(r.getDouble(2) - avg) < 1e-5)
    }
  }

  test("vocab_stats matches a driver-side vocabulary recount") {
    val texts = graft.core.Catalog.documents(spark, Sf0001)
      .select("text").collect()
      .map(_.getString(0).trim.toLowerCase.replaceAll("\\s+", " "))
    val cf = texts.flatMap(_.split(" ")).groupBy(identity).map(_._2.length.toLong)
    val r = TextOps.vocabStats(spark, Sf0001).collect() match {
      case Array(row) => row
      case rows => fail(s"expected one row, got ${rows.length}")
    }
    assert(r.getLong(0) === cf.size.toLong)
    assert(r.getLong(1) === cf.sum)
    assert(r.getLong(2) === cf.count(_ == 1L).toLong)
    assert(math.abs(r.getDouble(3) - cf.count(_ == 1L).toDouble / cf.size) < 1e-6)
    assert(math.abs(r.getDouble(4) - cf.size.toDouble / cf.sum) < 1e-6)
  }

  test("doc_entropy matches a driver-side scalar entropy recount") {
    val docs = graft.core.Catalog.documents(spark, Sf0001)
      .select("source", "text").collect()
      .map(r => (r.getString(0),
        r.getString(1).trim.toLowerCase.replaceAll("\\s+", " ")))
    val bySrc = docs.groupBy(_._1).map { case (src, ds) =>
      val hs = ds.map { case (_, text) =>
        val cs = text.split(" ").groupBy(identity).map(_._2.length.toLong)
        val n = cs.sum.toDouble
        val h = math.log(n) - cs.map(c => c * math.log(c.toDouble)).sum / n
        math.rint(h * 1e6) / 1e6
      }
      src -> (ds.length.toLong, hs.sum / hs.length)
    }
    val rows = TextOps.docEntropy(spark, Sf0001).collect()
    assert(rows.map(_.getString(0)).toSet === bySrc.keySet)
    rows.foreach { r =>
      val (nd, avg) = bySrc(r.getString(0))
      assert(r.getLong(1) === nd)
      assert(r.getDouble(2) > 0.0)
      assert(math.abs(r.getDouble(2) - avg) < 1e-5)
    }
  }

  test("contamination_ngram matches a driver-side 13-gram recount") {
    val bench = Set("src12", "src18")
    val docs = graft.core.Catalog.documents(spark, Sf0001)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).trim.toLowerCase.replaceAll("\\s+", " ")))
    def grams(text: String): Set[String] =
      text.split(" ").sliding(13).filter(_.length == 13)
        .map(_.mkString(" ")).toSet
    val benchGrams = docs.filter(d => bench(d._2)).flatMap(d => grams(d._3)).toSet
    val expected = docs.filterNot(d => bench(d._2)).flatMap { case (id, src, t) =>
      val shared = grams(t).count(benchGrams)
      if (shared > 0) Some((id, src) -> shared.toLong) else None
    }.toMap
    val rows = TextOps.contaminationNgram(spark, Sf0001, bench.toSeq.sorted, 13)
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      === expected)
    // the fixture corpus plants cross-source duplicates, so the scan
    // must actually flag something (otherwise this test proves nothing)
    assert(rows.nonEmpty)
  }

  test("dedup_rate_by_source reconciles with the dedup_apply removal set") {
    val total = graft.core.Catalog.documents(spark, Sf0001)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = TextOps.dedupApply(spark, Sf0001, 0.9)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = TextOps.dedupRateBySource(spark, Sf0001, 0.9).collect()
    assert(rows.map(_.getString(0)).toSet === total.keySet)
    rows.foreach { r =>
      val src = r.getString(0)
      assert(r.getLong(1) === total(src))
      assert(r.getLong(2) === total(src) - kept.getOrElse(src, 0L))
      assert(math.abs(
        r.getDouble(3) - r.getLong(2) * 1.0 / r.getLong(1)) < 1e-6)
    }
  }

  test("minhash_est_error rows cover the verified pairs with sane errors") {
    val pairs = TextOps.dedupMinhashLsh(spark, Sf0001, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val rows = TextOps.minhashEstError(spark, Sf0001, 0.9).collect()
    // one audit row per verified pair, exact jaccard carried through
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet === pairs.keySet)
    rows.foreach { r =>
      assert(r.getDouble(2) === pairs((r.getLong(0), r.getLong(1))))
      val est = r.getDouble(3)
      // estimates are k/64 rationals in [0, 1]
      assert(est >= 0.0 && est <= 1.0)
      assert(math.abs(est * 64 - math.round(est * 64)) < 1e-9)
      assert(math.abs(r.getDouble(4) - math.abs(est - r.getDouble(2))) < 1e-6)
    }
    // the estimator is unbiased with std ~0.037 at j~0.9: the MEAN abs
    // error across pairs must sit well inside a few stds
    val meanErr = rows.map(_.getDouble(4)).sum / rows.length
    assert(meanErr < 0.12, s"mean |est - exact| $meanErr implausibly high")
  }

  test("embed_dim_stats reconciles with a driver-side moment recount") {
    val vecs = graft.core.Catalog.embeddings(spark, Sf0001)
      .select("embedding").collect().map(_.getSeq[Float](0).map(_.toDouble))
    val dims = vecs.head.size
    val rows = VectorOps.embedDimStats(spark, Sf0001).collect()
    assert(rows.length === dims)
    rows.foreach { r =>
      val d = r.getLong(0).toInt
      val xs = vecs.map(_(d))
      assert(r.getLong(1) === vecs.length.toLong)
      val mean = xs.sum / xs.length
      assert(math.abs(r.getDouble(2) - mean) < 1e-6)
      val std = math.sqrt(math.max(
        xs.map(x => x * x).sum / xs.length - mean * mean, 0.0))
      assert(math.abs(r.getDouble(3) - std) < 1e-6)
      assert(r.getDouble(4) === xs.min)
      assert(r.getDouble(5) === xs.max)
    }
  }

  test("embed_apply: one kept vector per cluster, unclustered vectors intact") {
    val total = graft.core.Catalog.embeddings(spark, Sf0001).count()
    val clusters = VectorOps.embedClusters(spark, Sf0001, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val kept = VectorOps.embedApply(spark, Sf0001, 0.4).collect()
      .map(_.getLong(0)).toSet
    assert(kept.size.toLong === total - clusters.map(_._2 - 1).sum)
    assert(clusters.forall { case (cid, _) => kept.contains(cid) })
  }

  test("embed star clusters refine the all-pairs components (sound at 0.4)") {
    // The cluster/apply chain rides STAR candidates (member → bucket-min,
    // O(c) per bucket). A star edge shares a bucket AND verifies, so the
    // star graph is a SUBGRAPH of the all-pairs near-dup graph — star
    // components must refine the all-pairs components. At this fixture's
    // deliberately-low 0.4 threshold (sims 0.4–0.48, no true duplicates)
    // borderline member-vs-min misses are expected — that recall trade is
    // the documented contract, exact parity on real duplicate clusters is
    // pinned by the mega-cluster specs.
    val pairs = VectorOps.embedNearDupLsh(spark, Sf0001, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val got = VectorOps.embedClusters(spark, Sf0001, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.nonEmpty)
    // refinement: every star cluster id is a node of the all-pairs graph,
    // no star cluster can exceed its all-pairs component's size
    val allSizes = parent.keys.toSeq.groupBy(find)
      .map { case (root, members) => (root, members.size.toLong) }
    got.foreach { case (cid, n) =>
      assert(parent.contains(cid), s"star cluster id $cid not in pair graph")
      assert(n <= allSizes(find(cid)),
        s"star cluster $cid size $n exceeds its all-pairs component")
    }
  }

  test("embed star CC == all-pairs CC on true duplicate clusters") {
    import spark.implicits._
    // three clusters of EXACT duplicate vectors (cosine 1.0 in-cluster):
    // star candidates lose nothing verification would keep, so the star
    // components equal the all-pairs components exactly
    val base = Seq.tabulate(3)(c => Array.tabulate(8)(d =>
      math.sin(c * 8 + d + 1).abs + 0.1))
    val vecs = for (c <- 0 until 3; i <- 0 until 5) yield
      ((c * 100 + i).toLong, base(c).toSeq)
    val e = vecs.toDF("vec_id", "vecd")
      .withColumn("vecd", col("vecd").cast("array<double>"))
    val buckets = VectorOps.annLshBuckets(e, dim = 8)
      .select("vec_id", "tbl", "bucket")
    def cc(edges: org.apache.spark.sql.DataFrame, key: String) =
      GraphOps.clusterSizes(
        GraphOps.connectedComponents(spark, edges, key, 25), "n").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val star = cc(VectorOps.starEdgesOf(buckets), "spec:vec-star")
    val allPairs = cc(buckets.as("x")
      .join(buckets.as("y"),
        col("x.tbl") === col("y.tbl") && col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
      .distinct(), "spec:vec-allpairs")
    assert(star === allPairs)
    assert(star.map(_._2).sum === 15L)
  }

  test("containment flags subset pairs jaccard misses; capped == uncapped") {
    import spark.implicits._
    // doc 2 is doc 1's opening paragraph: every shingle of 2 appears in 1
    // (containment 2→1 = 1.0) while jaccard is far below any dedup
    // threshold; doc 3 shares nothing
    val quote = "alpha beta gamma delta epsilon"
    val long = s"$quote zeta eta theta iota kappa lambda mu nu xi " +
      "omicron pi rho sigma tau upsilon phi chi psi omega"
    val docs = Seq((1L, long), (2L, quote),
      (3L, "one two three four five six")).toDF("doc_id", "text")
    val got = TextOps.containmentPairsDf(docs, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === Seq((2L, 1L, 1.0)))
    // jaccard at the same fixture finds nothing: |A∩B|/|A∪B| = 3/23
    assert(TextOps.dedupJaccardDf(docs, 0.8).collect().isEmpty)
    // the capped plan agrees when the shared shingles include rare ones
    val capped = TextOps.containmentPairsDf(docs, 0.8, maxDf = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(capped === got)
  }

  test("capped containment rescues small ALL-HOT docs (r11 ADVICE gap)") {
    import spark.implicits._
    // the headline containment case the jaccard-tuned machinery cannot
    // see: a small quote whose EVERY shingle is hot (df > maxDf), fully
    // contained in each of six long documents with otherwise-disjoint
    // filler. The pair (quote, long_i) shares no rare shingle and has
    // jaccard far below any band design point — without the small-doc
    // rescue the capped plan silently drops all six pairs.
    val quote = "alpha beta gamma delta epsilon"
    val longs = (1 to 6).map { i =>
      (i.toLong, s"$quote " + (1 to 20).map(j => s"w${i}x$j").mkString(" "))
    }
    val docs = (longs :+ (7L, quote)).toDF("doc_id", "text")
    val exact = TextOps.containmentPairsDf(docs, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // quote (id 7) is contained in every long doc at containment 1.0
    assert((1 to 6).forall(i => exact.contains((7L, i.toLong, 1.0))))
    val capped = TextOps.containmentPairsDf(docs, 0.8, maxDf = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(capped === exact,
      s"capped containment lost pairs: ${exact -- capped}")
  }

  test("capped jaccard counts HOT shingles in the intersection exactly") {
    import spark.implicits._
    // 'alpha beta gamma' is a boilerplate shingle in every doc (df=6 > cap
    // 2); docs 1/2 are near-dups sharing rare AND hot shingles — the hot
    // part of the intersection must still be counted or jaccard comes out
    // low and the pair is lost
    val boiler = "alpha beta gamma"
    val docs = Seq(
      (1L, s"$boiler delta epsilon zeta eta"),
      (2L, s"$boiler delta epsilon zeta theta"),
      (3L, s"$boiler one two three four five"),
      (4L, s"$boiler six seven eight nine ten"),
      (5L, s"$boiler eleven twelve thirteen fourteen"),
      (6L, s"$boiler fifteen sixteen seventeen eighteen")
    ).toDF("doc_id", "text")
    def pairs(maxDf: Long) =
      TextOps.dedupJaccardDf(docs, 0.5, maxDf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val exact = pairs(Long.MaxValue)
    assert(exact.map(p => (p._1, p._2)) === Seq((1L, 2L)))
    assert(pairs(2L) === exact)
  }

  test("capped jaccard rescues ALL-HOT pairs (dup cluster bigger than the cap)") {
    import spark.implicits._
    // 10 exact copies with maxDf = 4: every shingle of the cluster has
    // df = 10 > cap, so NO pair shares a rare shingle — the rare
    // self-join alone would miss the entire cluster. The band-candidate
    // rescue must re-admit all C(10,2) pairs (identical docs -> identical
    // signatures -> same buckets), verified at jaccard 1.0.
    val copy = "the quick brown fox jumps over the lazy dog again"
    val docs = ((1L to 10L).map(i => (i, copy)) ++
      Seq((11L, "completely unrelated words one"),
          (12L, "another unrelated document two"))).toDF("doc_id", "text")
    val capped = TextOps.dedupJaccardDf(docs, 0.9, maxDf = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = (for {
      a <- 1L to 10L; b <- (a + 1) to 10L
    } yield (a, b, 1.0)).toSet
    assert(capped === want)
    // and the uncapped form agrees (the rescue adds nothing spurious)
    val exact = TextOps.dedupJaccardDf(docs, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(capped === exact)
  }

  test("minhash LSH candidates + exact verify == exhaustive jaccard pairs") {
    val lsh = TextOps.dedupMinhashLsh(spark, Sf0001, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = TextOps.dedupJaccard(spark, Sf0001, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty, "fixture should contain near-dup pairs")
    assert(lsh === exact)
  }

  test("simhash semantics on a controlled fixture") {
    // SimHash approximates term-frequency-vector cosine: identical bags →
    // hamming 0; one word changed → small hamming; disjoint vocab → large.
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // identical
      (3L, "alpha beta gamma delta epsilon zeta eta iota"),  // one word off
      (4L, "one two three four five six seven eight")        // disjoint
    ).toDF("doc_id", "text")
    val exact = TextOps.dedupSimhashDf(docs, 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact === Set((1L, 2L)), "identical bags must collide at hamming 0")
    // fingerprint-level discrimination, independent of band blocking
    val fp = TextOps.simhashFingerprints(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(fp(a) ^ fp(b))
    assert(hamming(1, 2) === 0)
    assert(hamming(1, 3) < hamming(1, 4),
      "one-word-off must be closer than disjoint vocab")
    assert(hamming(1, 4) > 16, "disjoint-vocab docs should differ widely")
  }

  test("simhash on the corpus emits pairs and respects the hamming bound") {
    val sim = TextOps.dedupSimhash(spark, Sf0001, 3).collect()
    assert(sim.nonEmpty)
    sim.foreach(r => assert(r.getAs[Number]("hamming").intValue() <= 3))
  }

  test("ann LSH top-k has high recall against brute-force top-k") {
    val exact = VectorOps.cosineTopk(spark, Sf0001, 0, 10).collect()
      .map(_.getLong(0)).toSet
    val approx = VectorOps.annLshTopk(spark, Sf0001, 0, 10).collect()
      .map(_.getLong(0)).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH recall $recall too low (got $approx vs $exact)")
  }

  test("train split partitions the corpus with all three splits present") {
    val split = TextOps.trainSplit(spark, Sf0001).collect()
    val total = split.map(_.getLong(2)).sum
    assert(total === graft.core.Catalog.documents(spark, Sf0001).count())
    val names = split.map(_.getString(1)).toSet
    assert(names === Set("train", "val", "test"))
    val trainDocs = split.filter(_.getString(1) == "train").map(_.getLong(2)).sum
    assert(trainDocs.toDouble / total > 0.8, "train split should dominate")
  }

  test("contamination pairs are exactly the cross-source near-dup pairs") {
    val all = TextOps.dedupJaccard(spark, Sf0001, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cross = TextOps.contamination(spark, Sf0001, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cross.subsetOf(all))
    assert(cross.nonEmpty, "fixture should contain cross-source near-dups")
  }

  test("docLengthQuantiles matches a naive in-memory reference (seeded random)") {
    import spark.implicits._
    val ps = Seq(0.5, 0.9, 0.99)
    def naive(vals: Seq[Long], p: Double): Double = {
      val s = vals.sorted
      val h = p * (s.length - 1)
      val lo = math.floor(h).toInt
      val hi = math.ceil(h).toInt
      val q = s(lo).toDouble + (s(hi) - s(lo)).toDouble * (h - lo)
      BigDecimal(q).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val rnd = new scala.util.Random(20260813L)
    // group-size edge cases: singleton, pair, heavy ties, larger groups
    val data = Seq(
      "solo" -> Seq(7L),
      "pair" -> Seq(3L, 9L),
      "ties" -> Seq.fill(40)(5L),
      "rand" -> Seq.fill(137)(rnd.nextLong(10000L)),
      "rand2" -> Seq.fill(63)(rnd.nextLong(50L))
    )
    val df = data.flatMap { case (s, vs) => vs.map((s, _)) }
      .toDF("source", "n_chars")
    val got = TextOps.docLengthQuantilesOf(df, ps).collect()
      .map(r => ((r.getString(0), r.getDouble(1)), r.getDouble(2))).toMap
    for ((s, vs) <- data; p <- ps)
      assert(got((s, p)) === naive(vs, p),
        s"quantile mismatch for source=$s p=$p")
    assert(got.size === data.size * ps.size)
  }

  test("ivfAssign argmax: max cosine wins; exact ties break to min cid") {
    import spark.implicits._
    // the single-aggregation argmax (max(struct(csim, -cid))) replaced a
    // per-vector max-join — pin its two semantics explicitly: (a) the
    // best-cosine cell wins regardless of cid order, (b) bit-equal ties
    // go to the SMALLEST cid (the oracle's max-then-min-cid CTE)
    val e = Seq(
      (100L, Seq(1.0, 0.0)),  // ties between identical cids 7 and 3
      (101L, Seq(0.0, 1.0))   // strictly closer to cid 9 than 3/7
    ).toDF("vec_id", "vecd")
    val cents = Seq(
      (7L, Seq(1.0, 0.0)), (3L, Seq(1.0, 0.0)), (9L, Seq(0.1, 1.0))
    ).toDF("cid", "cv")
    val got = VectorOps.ivfAssign(e, cents)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((100L, 3L), (101L, 9L)))
  }

  test("batch IVF top-k: each query's rows equal the single-query path") {
    val batch = VectorOps.annIvfBatchTopk(spark, Sf0001, 5, 10).collect()
      .groupBy(_.getLong(0))
    assert(batch.keySet === (0L until 5L).toSet)
    for (q <- 0L until 5L) {
      val rows = batch(q).sortBy(_.getLong(1))
      // ranks are 1..n contiguous
      assert(rows.map(_.getLong(1)).toSeq === (1L to rows.length).toSeq)
      // sims are non-increasing in rank
      assert(rows.sliding(2).forall {
        case Array(a, b) => a.getDouble(3) >= b.getDouble(3); case _ => true })
      val single = VectorOps.annIvfTopk(spark, Sf0001, q, 10).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
      assert(rows.map(r => (r.getLong(2), r.getDouble(3))).sortBy(_._1).toSeq
        === single.toSeq,
        s"query $q: batch rows diverge from the single-query path")
    }
  }

  test("batch LSH top-k: each query's rows equal the single-query path") {
    val batch = VectorOps.annLshBatchTopk(spark, Sf0001, 5, 10).collect()
      .groupBy(_.getLong(0))
    assert(batch.keySet === (0L until 5L).toSet)
    for (q <- 0L until 5L) {
      val rows = batch(q)
      val single = VectorOps.annLshTopk(spark, Sf0001, q, 10).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
      assert(rows.map(r => (r.getLong(2), r.getDouble(3))).sortBy(_._1).toSeq
        === single.toSeq,
        s"query $q: LSH batch rows diverge from the single-query path")
    }
  }

  test("ann IVF top-k: reasonable recall, prunes, and is deterministic") {
    val exact = VectorOps.cosineTopk(spark, Sf0001, 0, 10).collect()
      .map(_.getLong(0)).toSet
    val ivf1 = VectorOps.annIvfTopk(spark, Sf0001, 0, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val recall = exact.intersect(ivf1.map(_._1).toSet).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF recall $recall too low")
    // deterministic: re-running yields the identical result set
    val ivf2 = VectorOps.annIvfTopk(spark, Sf0001, 0, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(ivf1.toSeq === ivf2.toSeq)
  }

  test("IVF k-means quantizer: identical plumbing, balanced cells, bounded recall cost") {
    // The fixture is label-free isotropic noise (within-label mean cosine
    // ~ 0, measured): there is NO cluster structure for Lloyd to learn,
    // so data-point seeds — unit vectors sitting exactly on neighborhood
    // directions — are already near-optimal and training cannot win
    // recall here. (The pre-r14 single-query "trained >= seed" pin
    // passed on one lucky centroid set: the 10-query MEAN is seed ~0.92
    // vs trained ~0.65-0.68 for EVERY trainer variant, including the
    // pre-r14 hash-sampled/double-mean one.) What Lloyd guarantees is
    // bounded cell skew — the property that keeps cid-partition pruning
    // alive at 100 TB; where there IS structure to learn, the same
    // training machinery lifts recall (the PQ m=32 sweep: seed 0.49 →
    // trained 0.60, pinned in the next test). So the honest pins are:
    // identical plumbing, a recall floor, and cells no more skewed than
    // the seed quantizer's.
    val seeded = VectorOps.annIvfTopk(spark, Sf0001, 0, 10).collect()
    val kmeans = VectorOps.annIvfTopkKmeans(spark, Sf0001, 0, 10).collect()
    assert(seeded.map(_.schema.fieldNames.toSeq).distinct ===
      kmeans.map(_.schema.fieldNames.toSeq).distinct)
    assert(kmeans.length === 10)
    val meanRecall = (0L until 10L).map { q =>
      val brute = VectorOps.cosineTopk(spark, Sf0001, q, 10).collect()
        .map(_.getLong(0)).toSet
      VectorOps.annIvfTopkKmeans(spark, Sf0001, q, 10).collect()
        .map(_.getLong(0)).toSet.intersect(brute).size / 10.0
    }.sum / 10
    assert(meanRecall >= 0.5,
      s"k-means 10-query mean recall $meanRecall below the 0.5 floor")
    // balance: trained max cell <= seed max cell (the at-scale point)
    import org.apache.spark.sql.functions._
    val e = graft.core.Catalog.embeddings(spark, Sf0001)
      .withColumn("vecd", col("embedding").cast("array<double>"))
    def maxCell(cents: org.apache.spark.sql.DataFrame): Long =
      VectorOps.ivfAssign(e, cents).groupBy("cid")
        .agg(count(lit(1)).as("n")).agg(max("n")).head().getLong(0)
    val seedMax = maxCell(
      e.where(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("vecd").as("cv")))
    val kmMax = maxCell(
      VectorOps.ivfKmeansCentroidsFrom(e, 16, 3, 2))
    assert(kmMax <= seedMax,
      s"trained max cell $kmMax more skewed than seed quantizer's $seedMax")
  }

  test("trained PQ codebook: identical plumbing, recall >= seeded codebook") {
    // 10-query MEAN recall (deterministic — no RNG anywhere): a single
    // query's overlap@10 is a coarse 0.1-granular statistic; the mean is
    // the number the scaladoc's config sweep is stated in (seed 0.49 →
    // trained 0.60 at the registered m=32, ksub=16)
    val perQuery = (0L until 10L).map { q =>
      val r = VectorOps.annPqRecallTrained(spark, Sf0001, q, 10).collect()
        .map(x => (x.getString(0), x.getDouble(2))).toMap
      (r("pq_seed"), r("pq_trained"))
    }
    val seedMean = perQuery.map(_._1).sum / 10
    val trainedMean = perQuery.map(_._2).sum / 10
    assert(trainedMean >= seedMean,
      s"trained PQ mean recall $trainedMean regressed the seed's $seedMean")
    // same plumbing: the trained top-k has the seed face's schema and k
    val seed = VectorOps.annPqTopk(spark, Sf0001, 0, 10).collect()
    val trained = VectorOps.annPqTopkTrained(spark, Sf0001, 0, 10).collect()
    assert(seed.map(_.schema.fieldNames.toSeq).distinct ===
      trained.map(_.schema.fieldNames.toSeq).distinct)
    assert(trained.length === 10)
  }

  test("pHash banding recall: every hamming<=3 pair survives the band join") {
    import org.apache.spark.sql.functions._
    // brute-force ground truth over the fixture's asset hashes: the
    // pigeonhole guarantee (hamming <= 3 of 64 bits => >= 1 of the four
    // 16-bit blocks identical) means the banded face must find EVERY
    // such pair — LSH recall is exact here, not probabilistic
    val hs = MultimodalOps.phashNearDup(spark, Sf0001, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val docs = graft.core.Catalog.documents(spark, Sf0001)
      .select(col("doc_id"), octet_length(col("text").cast("binary"))
        .cast("long").as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def hash(n: Long): Long = (0 until 64).foldLeft(0L) { (acc, j) =>
      if ((n * (j + 1)) % 997 >= 498) acc | (1L << j) else acc
    }
    val want = (for {
      (ida, na) <- docs; (idb, nb) <- docs if ida < idb
      h = java.lang.Long.bitCount(hash(na) ^ hash(nb)) if h >= 1 && h <= 3
    } yield (ida, idb) -> h.toLong).toMap
    assert(hs === want, "banded pairs must equal brute-force hamming<=3")
    assert(want.nonEmpty, "fixture must exercise at least one near-dup")
  }

  test("IVF serving default routes to the seed quantizer; kmeans face to trained") {
    // the r15 serving-default decision (the IVF counterpart of PQ's
    // frozen-codebook contract, with the OPPOSITE default — see the
    // annIvfTopk scaladoc for the recall-vs-balance argument): the
    // registry key `ann_ivf_topk` must serve the seed quantizer and
    // `ann_ivf_topk_kmeans` the Lloyd-trained one. A silent swap of
    // either routing fails here.
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    assert(rows(graft.SparkEntry.queries("ann_ivf_topk")(spark, Sf0001)) ===
      rows(VectorOps.annIvfTopk(spark, Sf0001, 0, 10)),
      "ann_ivf_topk must serve the seed quantizer")
    assert(rows(graft.SparkEntry.queries("ann_ivf_topk_kmeans")(spark, Sf0001)) ===
      rows(VectorOps.annIvfTopkKmeans(spark, Sf0001, 0, 10)),
      "ann_ivf_topk_kmeans must serve the Lloyd-trained centroids")
  }

  test("PQ Lloyd trains on the id-stride sample only (non-sampled cells inert)") {
    import org.apache.spark.sql.functions._
    val cells = graft.core.Catalog.embeddings(spark, Sf0001)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .withColumn("sub", (col("dim") / 8).cast("int"))
      .withColumn("d", col("dim") % 8)
      .withColumn("mv", floor(col("x") * lit(1e3) + lit(0.5)).cast("long"))
      .select("vec_id", "sub", "d", "mv")
    def codebook(c: org.apache.spark.sql.DataFrame) =
      VectorOps.pqTrainedCodebookFrom(c, ksub = 8, iters = 2, sampleMod = 4)
        .orderBy("sub", "cid", "d").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    // corrupt every NON-sampled vector's cells (sample = vec_id % 4 == 0): a full-corpus Lloyd
    // would move the trained sub-centroids
    val corrupted = cells.withColumn("mv",
      when(pmod(col("vec_id"), lit(4L)) === 0L, col("mv"))
        .otherwise(col("mv") * 7L + 1L))
    assert(codebook(cells).toSeq === codebook(corrupted).toSeq)
  }

  test("k-means Lloyd trains on the id-stride sample only (non-sampled rows inert)") {
    import org.apache.spark.sql.functions._
    def centroids(e: org.apache.spark.sql.DataFrame) =
      VectorOps.ivfKmeansCentroidsFrom(e, nCentroids = 8, iters = 2,
          sampleMod = 4)
        .orderBy("cid").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
    val e = graft.core.Catalog.embeddings(spark, Sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vecd"))
    // corrupt EVERY vector outside the seeded hash-sample: if the Lloyd
    // input were the full corpus (the round-4 "prose, not code" finding),
    // the trained centroids would move
    val corrupted = e.withColumn("vecd",
      when(pmod(col("vec_id"), lit(4L)) === 0L, col("vecd"))
        .otherwise(expr("transform(vecd, x -> x * 7.0 + 1.0)")))
    assert(centroids(e).toSeq === centroids(corrupted).toSeq)
  }

  test("k-means iteration count scales the work, not the plan tree") {
    import org.apache.spark.sql.functions._
    // each Lloyd round is localCheckpoint'ed; without that, iteration N's
    // plan embeds all N-1 previous join subtrees and deep iteration dies
    // on plan analysis — iters=10 here is the regression rail
    val e = graft.core.Catalog.embeddings(spark, Sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vecd"))
    val cents = VectorOps.ivfKmeansCentroidsFrom(e, nCentroids = 8,
      iters = 10, sampleMod = 4).collect()
    assert(cents.length === 8)
    assert(cents.forall(!_.isNullAt(1)))
  }

  test("LSH near-dup pairs are sound and recall the exact baseline") {
    val exact = VectorOps.embedNearDup(spark, Sf0001, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = VectorOps.embedNearDupLsh(spark, Sf0001, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty, "fixture should contain pairs >= 0.4")
    // sound: every LSH pair is an exact pair with the identical sim
    assert(lsh.subsetOf(exact))
    // recall on this fixture's low-sim band (~0.4-0.48, where per-pair
    // collision probability is lowest) — deterministic, since the
    // hyperplanes are hashed, not random
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH recall $recall (${lsh.size}/${exact.size})")
  }

  test("LSH top-k pairs verify with exact cosine (values match all-pairs)") {
    val exactAll = VectorOps.embedNearDup(spark, Sf0001, 0.0).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val topk = VectorOps.embedTopkPairsLsh(spark, Sf0001, 20).collect()
    assert(topk.length === 20)
    topk.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(exactAll(key) === r.getDouble(2),
        s"pair $key sim mismatch vs exact baseline")
    }
  }

  test("ann LSH candidates are a strict subset of the corpus (it prunes)") {
    val buckets = VectorOps.annLshBuckets(
      graft.core.Catalog.embeddings(spark, Sf0001)
        .withColumn("vecd", col("embedding").cast("array<double>")))
    val q = buckets.where(col("vec_id") === 0)
      .select("tbl", "bucket")
    val nCandidates = buckets.join(q, Seq("tbl", "bucket"))
      .select("vec_id").distinct().count()
    val total = graft.core.Catalog.embeddings(spark, Sf0001).count()
    assert(nCandidates < total,
      s"LSH bucketing pruned nothing ($nCandidates of $total)")
  }

  test("multimodal decode: features are deterministic and batch-shaped") {
    val feats = MultimodalOps.decodeFeatures(spark, Sf0001).collect()
    assert(feats.length === 500)
    feats.foreach { f =>
      assert(f.features.length === 8)
      assert(f.format == "jpeg" || f.format == "png" || f.format == "webp")
      assert(f.width >= 64 && f.width < 1024 && f.height >= 64 && f.height < 1024)
      // deterministic: re-decoding the same payload gives the same features
      val again = MultimodalOps.decodeStub(
        MultimodalOps.MediaRecord(f.doc_id, Array.fill(f.n_bytes.toInt)(0), "image"))
      assert(again.n_bytes === f.n_bytes && again.format === f.format)
    }
  }

  test("mm_decode_real: genuine PNG/BMP containers survive a lossless roundtrip") {
    // the payloads must be REAL container bytes, not arithmetic
    // stand-ins: check the magic numbers before trusting the decode
    val recs = MultimodalOps.realMediaRecords(spark, Sf0001).collect()
    assert(recs.length === 500)
    recs.foreach { r =>
      val p = r.payload
      if (r.doc_id % 2 == 0) {
        assert(r.fmt === "png")
        assert((p(0) & 0xff) === 0x89 && p(1) === 'P'.toByte &&
          p(2) === 'N'.toByte && p(3) === 'G'.toByte,
          s"doc ${r.doc_id}: not a PNG container")
      } else {
        assert(r.fmt === "bmp")
        assert(p(0) === 'B'.toByte && p(1) === 'M'.toByte,
          s"doc ${r.doc_id}: not a BMP container")
      }
    }
    // decoded dims + exact pixel sums must equal the synthesis formula —
    // only true if ImageIO encoded AND decoded every sample losslessly
    val decoded = MultimodalOps.decodeReal(spark, Sf0001).collect()
    val nChars = graft.core.Catalog.documents(spark, Sf0001)
      .selectExpr("doc_id", "cast(n_chars as long)").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    decoded.foreach { d =>
      val n = nChars(d.doc_id)
      val (w, h) = (8 + n % 32, 8 + (n * 7) % 32)
      assert(d.width === w && d.height === h, s"dims of doc ${d.doc_id}")
      val want = (for { x <- 0L until w; y <- 0L until h }
        yield (x * 31 + y * 17 + d.doc_id) % 256).sum
      assert(d.sum_pixels === want, s"pixel sum of doc ${d.doc_id}")
      assert(d.n_bytes > 0)
    }
    assert(decoded.count(_.format == "png") > 0)
    assert(decoded.count(_.format == "bmp") > 0)
  }

  test("mm_frame_sample_real: genuine animated GIFs, random-access decode") {
    // the containers must be REAL animated GIFs: magic number + the
    // encoded frame count read back OUT of the container must equal the
    // synthesis count (getNumImages walks the image descriptors)
    val recs = MultimodalOps.realVideoRecords(spark, Sf0001).collect()
    assert(recs.length === 500)
    recs.foreach { r =>
      val p = r.payload
      assert(p(0) == 'G'.toByte && p(1) == 'I'.toByte && p(2) == 'F'.toByte,
        s"doc ${r.doc_id}: not a GIF container")
    }
    assert(recs.exists(_.n_frames > 2) && recs.exists(_.n_frames == 8),
      "the fixture must exercise multi-frame containers")
    val nChars = graft.core.Catalog.documents(spark, Sf0001)
      .selectExpr("doc_id", "cast(n_chars as long)").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = MultimodalOps.frameSampleReal(spark, Sf0001, 3).collect()
      .groupBy(_.doc_id)
    assert(got.size === 500)
    got.foreach { case (id, frames) =>
      val n = nChars(id)
      val (nf, w, h) = (2 + n % 7, 8 + n % 16, 8 + (n * 3) % 16)
      // frame count came from the CONTAINER, sampling is stride-3
      assert(frames.forall(_.n_frames === nf), s"container count of $id")
      assert(frames.map(_.frame_idx).sorted.toSeq ===
        (0L until nf by 3).toSeq, s"sampled indices of $id")
      frames.foreach { f =>
        assert(f.width === w && f.height === h)
        val want = (for { x <- 0L until w; y <- 0L until h }
          yield (x * 31 + y * 17 + f.frame_idx * 19 + id) % 256).sum
        assert(f.sum_pixels === want,
          s"pixel sum of doc $id frame ${f.frame_idx}")
      }
    }
  }

  test("real aHash: thumbnail-mean bits match the formula at sampled coords") {
    val got = MultimodalOps.phashRealBlocks(spark, Sf0001).collect()
    val nChars = graft.core.Catalog.documents(spark, Sf0001)
      .selectExpr("doc_id", "cast(n_chars as long)").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.length === nChars.size)
    got.foreach { d =>
      val n = nChars(d.doc_id)
      val (w, h) = (8 + n % 32, 8 + (n * 7) % 32)
      val px = for { y <- 0 until 8; x <- 0 until 8 }
        yield ((x * w / 8) * 31 + (y * h / 8) * 17 + d.doc_id) % 256
      val sum = px.sum
      val blocks = Array.fill(4)(0L)
      px.zipWithIndex.foreach { case (p, k) =>
        if (p * 64L > sum) blocks(k / 16) |= 1L << (k % 16)
      }
      assert((d.b0, d.b1, d.b2, d.b3) ===
        ((blocks(0), blocks(1), blocks(2), blocks(3))),
        s"hash blocks of doc ${d.doc_id}")
    }
    // the hash must discriminate: not every asset shares one hash
    assert(got.map(r => (r.b0, r.b1, r.b2, r.b3)).distinct.length > 1)
  }

  test("real resize: NN thumbnail sums match the formula at sampled coords") {
    val out = 16
    val resized = MultimodalOps.resizeReal(spark, Sf0001, out).collect()
    val nChars = graft.core.Catalog.documents(spark, Sf0001)
      .selectExpr("doc_id", "cast(n_chars as long)").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(resized.length === nChars.size)
    resized.foreach { d =>
      val n = nChars(d.doc_id)
      val (w, h) = (8 + n % 32, 8 + (n * 7) % 32)
      assert(d.width === w && d.height === h && d.out_w === out)
      // the decode→resample chain must agree with the synthesis formula
      // AT the nearest-neighbor source coordinates
      val want = (for { x <- 0 until out; y <- 0 until out }
        yield ((x * w / out) * 31 + (y * h / out) * 17 + d.doc_id) % 256).sum
      assert(d.sum_resized === want, s"resized sum of doc ${d.doc_id}")
    }
  }

  test("real WAV roundtrip: genuine RIFF containers, lossless sample sums") {
    // the payloads must be real RIFF/WAVE containers, not stand-ins
    val recs = MultimodalOps.realAudioRecords(spark, Sf0001).collect()
    assert(recs.nonEmpty)
    recs.foreach { r =>
      val p = r.payload
      assert(p(0) == 'R'.toByte && p(1) == 'I'.toByte &&
        p(2) == 'F'.toByte && p(3) == 'F'.toByte,
        s"doc ${r.doc_id}: not a RIFF container")
      assert(p(8) == 'W'.toByte && p(9) == 'A'.toByte &&
        p(10) == 'V'.toByte && p(11) == 'E'.toByte,
        s"doc ${r.doc_id}: not a WAVE form")
    }
    // decoded counts + exact sample sums must equal the synthesis
    // formula — only true if javax.sound encoded AND decoded every
    // 16-bit sample losslessly
    val decoded = MultimodalOps.decodeAudioReal(spark, Sf0001).collect()
    val nChars = graft.core.Catalog.documents(spark, Sf0001)
      .selectExpr("doc_id", "cast(n_chars as long)").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    decoded.foreach { d =>
      val n = 64 + nChars(d.doc_id) % 256
      assert(d.n_samples === n, s"frame count of doc ${d.doc_id}")
      assert(d.sample_rate === 16000L && d.bits === 16L)
      val samples = (0L until n)
        .map(i => (d.doc_id * 31 + i * 131) % 65536 - 32768)
      assert(d.sum_samples === samples.sum, s"sample sum of doc ${d.doc_id}")
      assert(d.sum_abs === samples.map(math.abs).sum,
        s"abs sum of doc ${d.doc_id}")
    }
  }

  test("funnel stages shrink monotonically and transitions conserve events") {
    val f = EventOps.funnel(spark, Sf0001).collect()
      .map(r => (r.getString(1), r.getLong(2)))
    assert(f.map(_._1).toSeq === Seq("view", "click", "purchase"))
    val counts = f.map(_._2)
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"funnel must shrink: ${counts.toSeq}")
    assert(counts.head > 0)
    // transitions: one row less than events per user with >= 2 events
    val totalTransitions = EventOps.transitions(spark, Sf0001)
      .agg(sum("n")).head.getLong(0)
    val events = graft.core.Catalog.events(spark, Sf0001).count()
    val users = graft.core.Catalog.events(spark, Sf0001)
      .select("user_id").distinct().count()
    assert(totalTransitions <= events - 1)
    assert(totalTransitions >= events - users)
  }

  test("pre-bucketed sessionize == window sessionize (skewed fixture + corpus)") {
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    // skewed fixture: one whale user with 4000 events (sessions of ~50
    // events every 20000 s, constantly straddling midnights) + small users
    val base = 1704067200L
    val whale = (0 until 4000).map { i =>
      (1L, base + i.toLong * 700 + (i / 50).toLong * 20000, i.toLong)
    }
    val small = (2 to 20).flatMap { u =>
      (0 until u).map(i => (u.toLong, base + i.toLong * 5000 + u * 977, i.toLong))
    }
    val e = (whale ++ small).toDF("user_id", "s", "event_id")
    assert(rows(EventOps.sessionizePreBucketedDf(e, 3600)) ===
      rows(EventOps.sessionizeDf(e, 3600)))

    // gap wider than the bucket: sessions must stitch across EMPTY days
    val sparse = Seq((9L, base, 0L), (9L, base + 3 * 86400L, 1L),
      (9L, base + 10 * 86400L, 2L)).toDF("user_id", "s", "event_id")
    assert(rows(EventOps.sessionizePreBucketedDf(sparse, 4 * 86400L)) ===
      rows(EventOps.sessionizeDf(sparse, 4 * 86400L)))

    // and on the real corpus
    assert(rows(EventOps.sessionizePreBucketed(spark, Sf0001)) ===
      rows(EventOps.sessionize(spark, Sf0001)))
  }

  test("active_users: DAU/WAU reconcile with a driver-side recount") {
    val du = graft.core.Catalog.events(spark, Sf0001)
      .selectExpr("(ts div 1000000000) div 86400 AS day", "user_id")
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val dau = du.groupBy(_._1).map { case (d, xs) => d -> xs.length.toLong }
    val wau = du.flatMap { case (d, u) => (d to d + 6).map(dd => (dd, u)) }
      .distinct.groupBy(_._1).map { case (d, xs) => d -> xs.length.toLong }
    val rows = EventOps.activeUsers(spark, Sf0001, 7).collect()
    assert(rows.map(_.getLong(0)).toSet === dau.keySet)
    rows.foreach { r =>
      val d = r.getLong(0)
      assert(r.getLong(1) === dau(d), s"dau mismatch on day $d")
      assert(r.getLong(2) === wau(d), s"wau mismatch on day $d")
      assert(r.getLong(2) >= r.getLong(1)) // WAU dominates DAU
    }
  }

  test("event_anomaly: z-scores reconcile with exact driver-side moment sums") {
    val daily = graft.core.Catalog.events(spark, Sf0001)
      .selectExpr("event_type", "(ts div 1000000000) div 86400 AS day")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case ((t, d), xs) => (t, d, xs.length.toLong) }
      .toSeq
    val expected = daily.groupBy(_._1).flatMap { case (t, cells) =>
      val n = cells.length.toLong
      val s1 = cells.map(_._3).sum
      val s2 = cells.map(c => c._3 * c._3).sum
      val varr = (s2 - s1 * s1 * 1.0 / n) / (n - 1)
      cells.map { case (_, d, c) =>
        (t, d) -> (c, if (n > 1 && varr > 0)
          Some((c - s1 * 1.0 / n) / math.sqrt(varr)) else None)
      }
    }
    val rows = EventOps.eventAnomaly(spark, Sf0001, 2.0).collect()
    assert(rows.length === expected.size)
    var flagged = 0
    rows.foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      val (cnt, zExp) = expected(key)
      assert(r.getLong(2) === cnt, s"count mismatch at $key")
      val z = if (r.isNullAt(3)) None else Some(r.getDouble(3))
      assert(z === zExp, s"z mismatch at $key") // exact: same IEEE op order
      val flag = if (r.isNullAt(4)) None else Some(r.getBoolean(4))
      assert(flag === zExp.map(v => math.abs(v) >= 2.0), s"flag at $key")
      if (flag.contains(true)) flagged += 1
    }
    // a 30-day × 5-type fixture must flag a few tail days, not zero, not most
    assert(flagged > 0 && flagged < rows.length / 10)
  }

  test("events_asof_value reconciles with a driver-side latest-quote scan") {
    val quotes = graft.core.Catalog.pointsCached(spark, Sf0001)
      .select("metric", "ts", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    val rows = EventOps.asofValue(spark, Sf0001).collect()
    val nEvents = graft.core.Catalog.events(spark, Sf0001).count()
    assert(rows.length === nEvents)
    rows.foreach { r =>
      val metric = "events." + r.getString(1)
      val s = r.getLong(2)
      val expected = quotes.getOrElse(metric, Seq.empty)
        .takeWhile(_._2 <= s).lastOption
      val got = if (r.isNullAt(3)) None
        else Some((metric, r.getLong(3), r.getDouble(4)))
      assert(got === expected, s"asof for event ${r.getLong(0)} at $s")
    }
  }

  test("events_asof_value_bucketed: exact parity with the union-window form") {
    val a = EventOps.asofValue(spark, Sf0001).collect().toSeq
    val b = EventOps.asofValueBucketed(spark, Sf0001).collect().toSeq
    assert(a === b)
  }

  test("as-of semantics: ties inclusive, pre-first-quote null, cross-day opening") {
    import spark.implicits._
    val quotes = Seq(
      ("m", 1000L, 1.0), ("m", 5000L, 2.0),       // day 0
      ("m", 86400L * 3 + 100L, 3.0),              // day 3 (days 1-2 silent)
      ("other", 10L, 9.0))
      .toDF("metric", "ts", "value")
    val requests = Seq(
      ("m", 500L, 1L),          // before any quote -> null
      ("m", 1000L, 2L),         // exact tie -> that quote (inclusive >=)
      ("m", 4999L, 3L),         // between quotes -> first
      ("m", 86400L + 7L, 4L),   // day 1, no quotes that day -> day-0 close
      ("m", 86400L * 2 + 7L, 5L), // day 2, two silent days back -> day-0 close
      ("m", 86400L * 3 + 99L, 6L), // day 3 before its quote -> opening
      ("m", 86400L * 3 + 100L, 7L)) // day 3 at its quote -> in-day tie
      .map { case (m, ts, id) => (m, ts, id, "t") }
      .toDF("metric", "ts", "event_id", "event_type")
    val expected = Seq(
      (1L, None), (2L, Some((1000L, 1.0))), (3L, Some((1000L, 1.0))),
      (4L, Some((5000L, 2.0))), (5L, Some((5000L, 2.0))),
      (6L, Some((5000L, 2.0))), (7L, Some((86400L * 3 + 100L, 3.0))))
    for (df <- Seq(EventOps.asofValueFrom(quotes, requests),
                   EventOps.asofValueBucketedFrom(quotes, requests))) {
      val got = df.collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some((r.getLong(3), r.getDouble(4)))))
      assert(got.toSeq === expected)
    }
  }

  test("sketchLinearCount: occupancy bounded and the estimator lands " +
      "near exact below saturation") {
    val rows = EventOps.sketchLinearCount(spark, Sf0001, 256).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (t, m, nSet, exact) =>
      assert(m === 256L)
      assert(nSet >= 1 && nSet <= math.min(m, exact), t)
    }
    // sf0.001 has only 15 distinct users — injective at m=256 (the
    // driver's sf0.01, with 150 users, exercises the collision regime
    // on the registered face); drive the collision path here with a
    // deliberately tiny bitmap
    assert(rows.forall { case (_, _, nSet, exact) => nSet === exact })
    val tiny = EventOps.sketchLinearCount(spark, Sf0001, 8).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(tiny.forall { case (_, nSet, exact) => nSet <= 8 && nSet < exact })
    // driver-side estimate check (the ln stays out of compared columns):
    // below ~70% load, linear counting lands within 15% of exact
    rows.filter { case (_, m, nSet, _) => nSet.toDouble / m < 0.7 }
      .foreach { case (t, m, nSet, exact) =>
        val est = -m * math.log(1.0 - nSet.toDouble / m)
        assert(math.abs(est - exact) / exact < 0.15,
          s"$t: est $est vs exact $exact")
      }
    // exact side cross-check against a direct distinct count
    val direct = graft.core.Catalog.events(spark, Sf0001)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (t, _, _, exact) => assert(direct(t) === exact, t) }
  }

  test("sketchHllUsers: registers replay the md5 decode, union is " +
      "register max, estimate lands near exact WAU") {
    val got = EventOps.sketchHllUsers(spark, Sf0001, 6, 7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.nonEmpty)
    assert(got.forall(_._2 === 64L))
    // brute-force replay: (day, user) distinct -> md5 hex -> register
    // index (2 hex digits mod 64) + leading-zero rank of the next 12 hex
    // digits, daily max, window-max union, exact trailing distinct
    val du = graft.core.Catalog.events(spark, Sf0001)
      .select(org.apache.spark.sql.functions.expr(
        "(ts div 1000000000) div 86400").as("day"),
        org.apache.spark.sql.functions.col("user_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def regRank(u: Long): (Long, Long) = {
      val hx = md5hex(u.toString)
      val reg = java.lang.Long.parseLong(hx.substring(0, 2), 16) % 64
      val field = hx.substring(2, 14)
      val lz = field.takeWhile(_ == '0').length
      val rank =
        if (lz == 12) 49L
        else {
          val nz = Integer.parseInt(field.charAt(lz).toString, 16)
          val extra = if (nz >= 8) 0 else if (nz >= 4) 1
            else if (nz >= 2) 2 else 3
          4L * lz + extra + 1
        }
      (reg, rank)
    }
    val observed = du.map(_._1).toSet
    val daily = du.map { case (d, u) => val (rg, rk) = regRank(u)
      ((d, rg), rk) }
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val expected = daily.toSeq
      .flatMap { case ((d, rg), rk) => (d until d + 7).map(e => ((e, rg), rk)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).max)
      .filter { case ((d, _), _) => observed(d) }.toMap
    val wauExact = du
      .flatMap { case (d, u) => (d until d + 7).map(e => (e, u)) }
      .distinct.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(got.map(r => ((r._1, r._3), r._4)).toMap === expected)
    got.foreach { case (d, _, _, _, we) => assert(we === wauExact(d), d) }
    assert(got.map(r => (r._1, r._3)).distinct.length === got.length)
    // driver-side HLL estimate (registers + the m - |rows| zeros; pow/ln
    // stay out of compared columns): with Flajolet's small-range linear-
    // counting correction, m = 64 lands well inside 25% of exact WAU
    val m = 64
    val alpha = 0.709 // alpha_64
    got.groupBy(_._1).foreach { case (d, rows) =>
      val sumPow = rows.map(r => math.pow(2.0, -r._4.toDouble)).sum +
        (m - rows.length) // zero registers contribute 2^0 = 1
      val raw = alpha * m * m / sumPow
      val zeros = m - rows.length
      val est = if (raw <= 2.5 * m && zeros > 0)
        m * math.log(m.toDouble / zeros) else raw
      val exact = rows.head._5.toDouble
      assert(math.abs(est - exact) / exact < 0.25,
        s"day $d: est $est vs exact $exact")
    }
  }

  test("sketchQuantileSample: membership replays the md5 gate and the " +
      "sample quantile lands within the rank-error bound") {
    val got = TextOps.sketchQuantileSample(spark, Sf0001, 4).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.map(_._1).toSeq === Seq(0.5, 0.9))
    // brute-force replay: md5-bucket gate + sorted interpolation
    val docs = graft.core.Catalog.documents(spark, Sf0001)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val sampled = docs.filter { case (id, _) =>
      java.lang.Long.parseLong(
        md5hex(id.toString).substring(0, 4), 16) % 4 == 0
    }
    def quant(vals: Seq[Long], p: Double): Double = {
      val sorted = vals.sorted
      val h = p * (sorted.length - 1)
      val lo = math.floor(h).toInt; val hi = math.ceil(h).toInt
      val q = sorted(lo).toDouble + (sorted(hi) - sorted(lo)).toDouble *
        (h - lo)
      math.floor(q * 1e6 + 0.5) / 1e6
    }
    got.foreach { case (p, n, ns, exactQ, estQ) =>
      assert(n === docs.length.toLong)
      assert(ns === sampled.length.toLong)
      assert(exactQ === quant(docs.map(_._2).toSeq, p))
      assert(estQ === quant(sampled.map(_._2).toSeq, p))
      // the sketch's claim: the sample quantile's RANK in the full
      // corpus is within ~3σ = 3·√(p(1−p)/ns) of p (the subsample
      // estimator's binomial bound; deterministic here — fixed hashes)
      val rank = docs.count(_._2 < estQ).toDouble / docs.length
      val bound = 3 * math.sqrt(p * (1 - p) / ns)
      assert(math.abs(rank - p) < bound, s"p=$p rank=$rank bound=$bound")
    }
    // the gate genuinely subsamples (neither empty nor everything)
    assert(sampled.length > 0 && sampled.length < docs.length)
  }

  test("event_heavy_hitters: per-type top-5 users reconcile with driver counts") {
    val counts = graft.core.Catalog.events(spark, Sf0001)
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case ((t, u), xs) => (t, u, xs.length.toLong) }
    val expected = counts.groupBy(_._1).toSeq.flatMap { case (t, xs) =>
      xs.toSeq.sortBy(x => (-x._3, x._2)).take(5).zipWithIndex
        .map { case ((_, u, n), i) => (t, i + 1L, u, n) }
    }.sorted
    val got = EventOps.heavyHitters(spark, Sf0001, 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expected)
  }

  test("winnow_pairs: candidates reconcile with a driver-side df-capped pair count") {
    import graft.functions.GraftFunctions
    val fps = graft.core.Catalog.documents(spark, Sf0001)
      .select(col("doc_id"),
        explode(GraftFunctions.winnowHashes(col("text"), 5, 4)).as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val df = fps.groupBy(_._2).view.mapValues(_.length).toMap
    val rare = fps.filter { case (_, fp) => df(fp) > 1 && df(fp) <= 64 }
    val expected = rare.groupBy(_._2).values.toSeq
      .flatMap { docs =>
        val ids = docs.map(_._1).sorted
        for (i <- ids.indices; j <- (i + 1) until ids.length)
          yield (ids(i), ids(j))
      }
      .groupBy(identity).collect { case ((a, b), xs) if xs.length >= 2 =>
        (a, b, xs.length.toLong) }
      .toSeq.sorted
    val got = TextOps.winnowPairs(spark, Sf0001, 5, 4, 2, 64).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === expected)
    assert(got.nonEmpty) // the fixture contains near-dup docs
  }

  test("cohort retention: offset-0 cells are cohort sizes and dominate later offsets") {
    val rows = EventOps.cohortRetention(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_._1)
    byCohort.foreach { case (cohort, cells) =>
      val sizes = cells.filter(_._2 == 0L)
      assert(sizes.length === 1, s"cohort $cohort must have an offset-0 cell")
      val cohortSize = sizes.head._3
      assert(cells.forall(_._3 <= cohortSize),
        s"cohort $cohort: no later week can exceed the cohort size")
    }
    // every user lands in exactly one cohort: offset-0 cells sum to the
    // distinct-user count
    val totalUsers = graft.core.Catalog.events(spark, Sf0001)
      .select("user_id").distinct().count()
    assert(rows.filter(_._2 == 0L).map(_._3).sum === totalUsers)
  }

  test("sessionize session extents nest inside the per-user event extents") {
    val sessions = EventOps.sessionize(spark, Sf0001, 3600L)
    val bad = sessions.where(col("start_s") > col("end_s")).count()
    assert(bad === 0)
    val n = sessions.agg(sum("n_events")).head.getLong(0)
    assert(n === graft.core.Catalog.events(spark, Sf0001).count())
  }

  test("star candidate edges stay O(c) on a mega duplicate cluster") {
    import spark.implicits._
    // 2000 exact copies of one text: every copy lands in every band bucket
    // together, so the all-pairs form would emit c(c-1)/2 ≈ 2M candidate
    // pairs — the 100 TB boilerplate blowup. The star must emit exactly
    // c-1 distinct edges (member → bucket-min) and still recover ONE
    // cluster of size c after exact verification + components.
    val c = 2000
    val copies = (0 until c).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog again and again"))
    val others = Seq(
      (9000L, "completely different text about something else entirely here"),
      (9001L, "yet another unrelated document carrying its own words inside"))
    val docs = (copies ++ others).toDF("doc_id", "text")
    val sh = TextOps.shinglesOf(docs)
    val edges = TextOps.starEdges(TextOps.minhashBucketsOf(sh))
    val megaEdges = edges.where(col("doc_b") < 9000L)
    // two hubs (min 0, second-min 1): (c-1) + (c-2) distinct edges — the
    // all-pairs form would emit c(c-1)/2 ≈ 2M
    assert(megaEdges.count() === (2 * c - 3).toLong,
      "star candidate generation must be linear in duplicate-cluster size")
    // connectivity survives the star: one verified cluster of size c
    val verified = TextOps.exactJaccardOnCandidates(sh, edges, 0.9)
    val labels = GraphOps.connectedComponents(spark,
      verified.select("doc_a", "doc_b"), "spec:mega-star", 25)
    val clusters = GraphOps.clusterSizes(labels, "n_docs").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(clusters === Seq((0L, c.toLong)))
  }

  test("vector star edges: two hubs per bucket, distinct across tables") {
    import spark.implicits._
    // one hot bucket replicated across two tables + a disjoint small
    // bucket: edges come from the bucket's two lowest ids (min 0 → 99
    // members, second-min 1 → 98 later members), distinct across tables;
    // a 2-member bucket has no third member for its second hub to reach
    val hot = for (t <- 0 to 1; i <- 0 until 100) yield (i.toLong, t, 42L)
    val small = Seq((200L, 0, 7L), (201L, 0, 7L))
    val edges = VectorOps.starEdgesOf(
      (hot ++ small).toDF("vec_id", "tbl", "bucket")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges.size === 99 + 98 + 1)
    assert(edges.forall { case (a, b) => a < b })
    assert(edges.count(_._1 == 0L) === 99 && edges.count(_._1 == 1L) === 98 &&
      edges((200L, 201L)))
  }

  test("text star CC recovers borderline clusters a shadowing bucket-min would split") {
    import spark.implicits._
    // Pairs STRADDLING the 0.9 threshold, with the bucket-min SHADOW mode
    // live: doc 0 is an ~0.86-jaccard neighbor of docs 1/2 (below
    // threshold, but similar enough to share band buckets w.h.p.), and
    // holds the LOWEST id — under a one-hub star every candidate edge of
    // a shared bucket runs through doc 0 and fails verification, splitting
    // the genuine 1–2 pair (19/21 ≈ 0.905 ≥ 0.9). The second hub restores
    // it. Star CC must equal the exhaustive-jaccard CC on this fixture.
    val base = (1 to 21).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (0L, s"$base extra other thing"), // ⊃ base: j(0,1)=19/22≈0.864 ✗
      (1L, base),                       // j(1,2)=19/21≈0.905 ✓
      (2L, s"$base tail more"),         // j(0,2)=19/24≈0.792 ✗
      (3L, (1 to 9).map(i => s"lone$i").mkString(" ")) // unrelated
    ).toDF("doc_id", "text")
    val sh = TextOps.shinglesOf(docs)
    val buckets = TextOps.minhashBucketsOf(sh)

    // the shadow scenario is REAL in this fixture, not vacuous: doc 0
    // shares at least one band bucket with doc 1 and with doc 2
    val shared = buckets.as("x")
      .join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(shared((0L, 1L)) && shared((0L, 2L)),
      "fixture must put the below-threshold doc 0 into shared buckets")

    // exhaustive ground truth: connected components of ALL ≥0.9 pairs
    val exhaustive = TextOps.dedupJaccardDf(docs, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(exhaustive === Seq((1L, 2L)),
      "exactly the borderline pair must clear the threshold")

    // star pipeline: two-hub candidates → exact verify → components
    val verified = TextOps.exactJaccardOnCandidates(
      sh, TextOps.starEdges(buckets), 0.9)
    val got = GraphOps.clusterSizes(
      GraphOps.connectedComponents(spark,
        verified.select("doc_a", "doc_b"), "spec:text-shadow", 25), "n")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 2L)), // one cluster, id 1, two docs
      "star CC must recover the shadowed borderline cluster {1, 2}")
  }

  test("bm25_search: scores reconcile with a driver-side BM25 recompute") {
    val terms = Seq("spark", "merge")
    val wc = TextOps.wordCountsOf(
      graft.core.Catalog.documents(spark, Sf0001).select("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val dl = wc.groupBy(_._1).map { case (d, xs) => d -> xs.map(_._3).sum }
    val nDocs = dl.size.toLong
    val mass = dl.values.sum
    val avgdl = mass.toDouble / nDocs
    val dfs = terms.map(t => t -> wc.count(_._2 == t).toLong).toMap
    val expected = wc.filter(x => terms.contains(x._2))
      .groupBy(_._1).map { case (d, xs) =>
        d -> xs.map { case (_, t, c) =>
          val idf = math.log(1.0 + (nDocs - dfs(t) + 0.5) / (dfs(t) + 0.5))
          idf * (c * 2.2) / (c + 1.2 * (0.25 + 0.75 * dl(d) / avgdl))
        }.sum
      }
    val got = TextOps.bm25Search(spark, Sf0001, terms, k = 15).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(got.nonEmpty)
    got.foreach { case (d, score) =>
      assert((score - expected(d)).abs <= 1e-6, s"score of doc $d")
    }
    // ranked best-first, ties on doc_id; top-k really is the max subset
    val all = expected.toSeq.sortBy { case (d, s) => (-s, d) }.take(got.length)
    assert(got.map(_._1).toSeq === all.map(_._1))
    // a two-term match must outrank structure: some doc matches both terms
    assert(TextOps.bm25Search(spark, Sf0001, terms, k = 15).collect()
      .exists(_.getLong(1) == 2L))
  }

  test("doc_novelty: micro-averaged df=1 share reconciles per source") {
    val sh = TextOps.shinglesOf(
      graft.core.Catalog.documents(spark, Sf0001).select("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val dfh = sh.groupBy(_._2).map { case (h, xs) => h -> xs.length }
    val perDoc = sh.groupBy(_._1).map { case (d, xs) =>
      d -> (xs.count(x => dfh(x._2) == 1).toLong, xs.length.toLong) }
    val src = graft.core.Catalog.documents(spark, Sf0001)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val expected = perDoc.toSeq.groupBy(x => src(x._1)).map { case (s, xs) =>
      s -> (xs.map(_._2._1).sum.toDouble / xs.map(_._2._2).sum) }
    val got = TextOps.docNovelty(spark, Sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert((r.getDouble(4) - expected(r.getString(0))).abs <= 1e-6,
        s"novelty of ${r.getString(0)}")
    }
  }

  test("quality_funnel: monotone survivors, frac anchored, gates bite") {
    val rows = TextOps.qualityFunnel(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L))
    val counts = rows.map(_._3)
    // monotone non-increasing; final stage equals quality_apply's yield
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    assert(counts.last ===
      TextOps.qualityApply(spark, Sf0001, 0.8, 150, 0.02).count())
    assert(rows.head._4 === 1.0)
    rows.foreach { case (_, _, n, frac) =>
      assert((frac - n.toDouble / counts.head).abs <= 1e-6)
    }
  }

  test("embed_outliers: integer deviation ranks match a driver recompute") {
    val vecs = graft.core.Catalog.embeddings(spark, Sf0001)
      .selectExpr("vec_id", "label", "cast(embedding as array<double>) v")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Double](2).map(x => math.floor(x * 1e3 + 0.5).toLong)))
    val expected = vecs.groupBy(_._2).toSeq.flatMap { case (label, xs) =>
      val n = xs.length.toLong
      val dims = xs.head._3.length
      val sums = (0 until dims).map(d => xs.map(_._3(d)).sum)
      xs.toSeq.map { case (id, _, m) =>
        val d2 = (0 until dims).map { d =>
          val dev = m(d) * n - sums(d); dev * dev }.sum
        (label, id, d2, n)
      }.sortBy(x => (-x._3, x._2)).take(3).zipWithIndex
        .map { case ((l, id, d2, nn), i) =>
          ((l, i + 1L), (id, math.sqrt(d2.toDouble) / nn / 1e3)) }
    }.toMap
    val got = VectorOps.embedOutliers(spark, Sf0001, 3).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (id, dist) = expected((r.getInt(0), r.getLong(1)))
      assert(r.getLong(2) === id, s"rank ${r.getLong(1)} of ${r.getInt(0)}")
      assert((r.getDouble(3) - dist).abs <= 1e-6)
    }
  }

  test("ann_pq_topk: full driver-side PQ recompute matches; codebook self-codes") {
    val (m, ksub, dims) = (8, 16, 64)
    val sw = dims / m
    val vecs = graft.core.Catalog.embeddings(spark, Sf0001)
      .selectExpr("vec_id", "cast(embedding as array<double>) v").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Double](1).map(x => math.floor(x * 1e3 + 0.5).toLong)))
      .sortBy(_._1)
    val cb = vecs.filter(_._1 < ksub) // cid == vec_id
    def subDist(a: Seq[Long], b: Seq[Long], s: Int): Long =
      (s * sw until (s + 1) * sw).map(d => (a(d) - b(d)) * (a(d) - b(d))).sum
    def codesOf(v: Seq[Long]): Seq[Int] = (0 until m).map { s =>
      cb.map { case (cid, cv) => (subDist(v, cv, s), cid.toInt) }.min._2 }
    // codebook vectors code to themselves (their subvector IS a centroid)
    cb.foreach { case (cid, cv) =>
      (0 until m).foreach(s => assert(subDist(cv, cb(codesOf(cv)(s))._2, s) === 0L)) }
    val q = vecs.find(_._1 == 0L).get._2
    val adc = (0 until m).map(s => cb.map { case (cid, cv) =>
      (s, cid.toInt) -> subDist(q, cv, s) }).flatten.toMap
    val expected = vecs.filter(_._1 != 0L).map { case (id, v) =>
      val score = (0 until m).map(s => adc((s, codesOf(v)(s)))).sum
      (id, BigDecimal(math.sqrt(score.toDouble) / 1e3)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (id, d) => (d, id) }.take(10)
    val got = VectorOps.annPqTopk(spark, Sf0001, 0, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === expected)
  }

  test("funnel_windowed: deadline shrinks stages; reconciles with a driver scan") {
    val w = 86400L * 1000000000L
    val e = graft.core.Catalog.events(spark, Sf0001)
      .select(col("user_id"), col("ts"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byUser = e.groupBy(_._1)
    def firstReach(u: Long): Seq[Option[Long]] = {
      val evs = byUser(u)
      val t0 = evs.filter(_._3 == "view").map(_._2).minOption
      val t1 = t0.flatMap(t => evs.filter(x => x._3 == "click" &&
        x._2 >= t && x._2 <= t0.get + w).map(_._2).minOption)
      val t2 = t1.flatMap(t => evs.filter(x => x._3 == "purchase" &&
        x._2 >= t && x._2 <= t0.get + w).map(_._2).minOption)
      Seq(t0, t1, t2)
    }
    val expected = (0 until 3).map(i =>
      byUser.keys.count(u => firstReach(u)(i).isDefined).toLong)
    val got = EventOps.funnelWindowed(spark, Sf0001).collect()
      .map(_.getLong(2)).toSeq
    assert(got === expected)
    // the deadline must actually bite relative to the unbounded cascade
    val unbounded = EventOps.funnel(spark, Sf0001).collect()
      .map(_.getLong(2)).toSeq
    assert(got.zip(unbounded).forall { case (a, b) => a <= b })
    assert(got.zip(got.tail).forall { case (a, b) => a >= b })
    assert(got.last < unbounded.last, "window must drop some conversions")
  }

  test("events_rfm: quartile cells conserve users; driver recompute agrees") {
    val per = graft.core.Catalog.events(spark, Sf0001)
      .selectExpr("user_id", "ts div 1000000000 as s", "event_type",
        "cast(floor(value * 1e6 + 0.5) as long) as vm")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1).map { case (u, xs) =>
        (u, xs.map(_._2).max, xs.length.toLong,
          xs.filter(_._3 == "purchase").map(_._4).sum)
      }.toSeq
    def quartile(sorted: Seq[Long], n: Int): Map[Long, Long] = {
      // ntile semantics: earlier groups take the extra rows
      val total = sorted.length
      val base = total / n; val extra = total % n
      val bounds = (0 until n).scanLeft(0) { (acc, i) =>
        acc + base + (if (i < extra) 1 else 0) }
      sorted.zipWithIndex.map { case (u, i) =>
        u -> (bounds.indexWhere(_ > i).toLong) }.toMap
    }
    val rq = quartile(per.sortBy(x => (x._2, x._1)).map(_._1), 4)
    val fq = quartile(per.sortBy(x => (x._3, x._1)).map(_._1), 4)
    val mq = quartile(per.sortBy(x => (x._4, x._1)).map(_._1), 4)
    val expected = per.groupBy(x => (rq(x._1), fq(x._1), mq(x._1)))
      .map { case (k, xs) =>
        k -> (xs.size.toLong, xs.map(_._4).sum.toDouble / 1e6) }
    val got = EventOps.eventsRfm(spark, Sf0001, 4).collect()
    assert(got.map(_.getLong(3)).sum === per.length.toLong)
    got.foreach { r =>
      val (nu, sv) = expected((r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(r.getLong(3) === nu,
        s"cell (${r.getLong(0)},${r.getLong(1)},${r.getLong(2)})")
      assert((r.getDouble(4) - sv).abs <= 1e-9)
    }
  }

  test("tfidf_pairs: driver replay of the df-capped cosine agrees") {
    val wc = TextOps.wordCounts(spark, Sf0001)
      .select("doc_id", "tok", "c").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val nDocs = wc.map(_._1).distinct.length
    val dfTab = wc.groupBy(_._2).view.mapValues(_.length.toLong)
      .filter(_._2 <= 64L).toMap
    val w = wc.flatMap { case (d, t, c) =>
      dfTab.get(t).map { df =>
        (d, t, BigInt(math.floor(
          c * math.log(nDocs.toDouble / df) * 1e6 + 0.5).toLong))
      }
    }.filter(_._3 > 0)
    val norms = w.groupBy(_._1).view
      .mapValues(_.map(x => x._3 * x._3).sum).toMap
    val byTok = w.groupBy(_._2)
    val dots = scala.collection.mutable.Map.empty[(Long, Long), BigInt]
    byTok.values.foreach { xs =>
      for (a <- xs; b <- xs if a._1 < b._1)
        dots((a._1, b._1)) = dots.getOrElse((a._1, b._1), BigInt(0)) +
          a._3 * b._3
    }
    val expected = dots.toSeq.flatMap { case ((da, db), dot) =>
      val sim = dot.toDouble / math.sqrt(
        norms(da).toDouble * norms(db).toDouble)
      if (sim >= 0.3) Some((da, db,
        BigDecimal(sim).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble))
      else None
    }.sortBy(x => (x._1, x._2))
    val got = TextOps.tfidfPairs(spark, Sf0001, 0.3, 64L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(p => (p._1, p._2)) === expected.map(p => (p._1, p._2)))
    got.zip(expected).foreach { case ((_, _, g), (_, _, e)) =>
      assert((g - e).abs <= 1e-6) }
    assert(got.nonEmpty)
  }

  test("mm_audio_window: frames tile the signal; only tail windows pad") {
    val got = graft.operators.MultimodalOps
      .audioWindowQuery(spark, Sf0001, 400, 160).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (doc, ws) =>
      val n = ws.head._2
      val sorted = ws.sortBy(_._4)
      assert(sorted.map(_._4) === (0L until ws.head._3).toArray.toSeq,
        s"doc $doc win indexes")
      // every sample < n is inside some window; windows advance by hop
      sorted.foreach { case (_, ns, _, i, st, en, padded) =>
        assert(st === i * 160 && en === st + 400)
        assert(padded === (en > ns), s"doc $doc win $i")
      }
      val last = sorted.last
      assert(last._6 >= n, s"doc $doc: last window must reach the end")
      // non-tail windows never pad
      sorted.dropRight(1).foreach { w =>
        assert(!w._7 || w._6 > n, s"doc $doc interior pad") }
    }
  }

  test("series_theil_sen: driver median-of-slopes replay agrees") {
    val grid = graft.operators.SeriesOps.densifyGrid(spark, Sf0001,
      "events.purchase", graft.operators.SeriesOps.From,
      graft.operators.SeriesOps.Until).collect()
      .zipWithIndex.collect { case (r, i) if !r.isNullAt(1) =>
        (i.toLong, math.floor(r.getDouble(1) * 1e6 + 0.5).toLong) }
    val slopes = (for {
      a <- grid; b <- grid if a._1 < b._1
    } yield (b._2 - a._2).toDouble / (b._1 - a._1).toDouble / 1e6).sorted
    val m = slopes.length
    val med = if (m % 2 == 1) slopes(m / 2)
      else (slopes(m / 2 - 1) + slopes(m / 2)) / 2.0
    val r = graft.operators.SeriesOps.seriesTheilSen(spark, Sf0001,
      "events.purchase", graft.operators.SeriesOps.From,
      graft.operators.SeriesOps.Until).collect().head
    assert(r.getString(0) === "events.purchase")
    assert(r.getLong(1) === grid.length.toLong)
    assert(r.getLong(2) === m.toLong)
    val exp = BigDecimal(med)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert((r.getDouble(3) - exp).abs <= 1e-6)
  }

  test("doc_keyphrases: integer-weight ranks replay; no float rank flips") {
    val wc = TextOps.wordCounts(spark, Sf0001)
      .select("doc_id", "tok", "c").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val n = wc.map(_._1).distinct.length
    val dfTab = wc.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val expected = wc.groupBy(_._1).toSeq.flatMap { case (d, xs) =>
      xs.toSeq.map { case (_, t, c) =>
        (t, math.floor(c * math.log(n.toDouble / dfTab(t)) * 1e6 + 0.5)
          .toLong)
      }.sortBy { case (t, wq) => (-wq, t) }.take(3).zipWithIndex
        .map { case ((t, wq), i) => (d, i.toLong + 1, t, wq) }
    }.toSeq.sortBy(x => (x._1, x._2))
    val got = TextOps.docKeyphrases(spark, Sf0001, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3))).toSeq
    assert(got.map(x => (x._1, x._2, x._3)) ===
      expected.map(x => (x._1, x._2, x._3)))
    got.zip(expected).foreach { case ((_, _, _, tf), (_, _, _, wq)) =>
      assert((tf - wq.toDouble / 1e6).abs <= 1e-9) }
  }

  test("embed_silhouette: integer centroid-distance replay agrees") {
    val rows = graft.core.Catalog.embeddings(spark, Sf0001)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).toArray.map(v =>
          math.floor(v.toDouble * 1e6 + 0.5).toLong)))
    val cent = rows.groupBy(_._2).view.mapValues { xs =>
      val dims = xs.head._3.length
      Array.tabulate(dims) { i =>
        val s = xs.map(_._3(i)).sum
        math.floor(s.toDouble / xs.length + 0.5).toLong
      }
    }.toMap
    val per = rows.map { case (_, lab, v) =>
      def d2(c: Array[Long]) =
        v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
      val a = math.sqrt(d2(cent(lab)).toDouble) / 1e6
      val b = math.sqrt(cent.filter(_._1 != lab).values
        .map(d2).min.toDouble) / 1e6
      val sq = if (math.max(a, b) > 0)
        math.floor((b - a) / math.max(a, b) * 1e6 + 0.5).toLong else 0L
      (lab, sq)
    }
    val expected = per.groupBy(_._1).view.mapValues { xs =>
      (xs.length.toLong, BigDecimal(
        xs.map(_._2).sum.toDouble / 1e6 / xs.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    val got = VectorOps.embedSilhouette(spark, Sf0001).collect()
    assert(got.map(_.getInt(0)).toSet === expected.keySet)
    got.foreach { r =>
      val (nv, ms) = expected(r.getInt(0))
      assert(r.getLong(1) === nv)
      assert((r.getDouble(2) - ms).abs <= 1e-6, s"label ${r.getInt(0)}")
    }
  }

  test("dedup_cluster_sizes: histogram conserves the cluster table") {
    val clusters = TextOps.dedupClusters(spark, Sf0001, 0.9).collect()
      .map(r => r.getLong(1))
    val expected = clusters
      .groupBy(n => 63 - java.lang.Long.numberOfLeadingZeros(n))
      .map { case (b, xs) =>
        b.toLong -> (xs.length.toLong, xs.sum, xs.min, xs.max) }
    val got = TextOps.dedupClusterSizes(spark, Sf0001, 0.9).collect()
    assert(got.map(_.getLong(0)).toSet === expected.keySet)
    got.foreach { r =>
      val (nc, nd, mn, mx) = expected(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
        ((nc, nd, mn, mx)), s"bucket ${r.getLong(0)}")
    }
    assert(got.map(_.getLong(1)).sum === clusters.length.toLong)
  }

  test("token_pmi_pairs: driver bigram-PMI replay agrees") {
    val texts = graft.core.Catalog.documents(spark, Sf0001)
      .selectExpr("regexp_replace(lower(trim(text)), '\\\\s+', ' ') as t")
      .collect().map(_.getString(0))
    val uni = scala.collection.mutable.Map.empty[String, Long]
    val bg = scala.collection.mutable.Map.empty[(String, String), Long]
    texts.foreach { t =>
      val w = t.split(" ", -1)
      w.foreach(x => uni(x) = uni.getOrElse(x, 0L) + 1)
      w.sliding(2).filter(_.length == 2).foreach { p =>
        val k = (p(0), p(1)); bg(k) = bg.getOrElse(k, 0L) + 1 }
    }
    val total = uni.values.sum
    val expected = bg.toSeq.filter(_._2 >= 5).map { case ((a, b), cab) =>
      val pmi = math.log(
        (BigInt(cab) * BigInt(total)).toDouble /
          (BigInt(uni(a)) * BigInt(uni(b))).toDouble)
      (a, b, cab, math.floor(pmi * 1e6 + 0.5).toLong)
    }.sortBy { case (a, b, _, q) => (-q, a, b) }.take(20)
      .sortBy(x => (x._1, x._2))
    val got = TextOps.tokenPmiPairs(spark, Sf0001, 5, 20).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got.map(x => (x._1, x._2, x._3)) ===
      expected.map(x => (x._1, x._2, x._3)))
    got.zip(expected).foreach { case ((_, _, _, p), (_, _, _, q)) =>
      assert((p - q.toDouble / 1e6).abs <= 1e-9) }
    assert(got.nonEmpty)
  }

  test("shingle_df_hist conserves shingle occurrences; buckets log2-exact") {
    val dfs = TextOps.shingles(spark, Sf0001)
      .groupBy("h").count().collect().map(_.getLong(1))
    val got = TextOps.shingleDfHist(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.map(_._2).sum === dfs.length.toLong)
    assert(got.map(_._3).sum === dfs.sum)
    got.foreach { case (b, _, _, mn, mx) =>
      assert(63 - java.lang.Long.numberOfLeadingZeros(mn) === b.toInt)
      assert(63 - java.lang.Long.numberOfLeadingZeros(mx) === b.toInt)
    }
  }

  test("embed_knn_degree_hist conserves vectors; buckets are log2-exact") {
    val n = graft.core.Catalog.embeddings(spark, Sf0001).count()
    val got = VectorOps.embedKnnDegreeHist(spark, Sf0001, 16, 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._2).sum === n)
    got.foreach { case (b, _, mn, mx) =>
      if (b == -1L) assert(mn === 0L && mx === 0L)
      else {
        assert(63 - java.lang.Long.numberOfLeadingZeros(mn) === b.toInt)
        assert(63 - java.lang.Long.numberOfLeadingZeros(mx) === b.toInt)
      }
    }
    // the LSH tables at (16, 6) must actually connect this corpus
    assert(got.exists(_._1 >= 0))
  }

  test("mmr_topk: greedy replay agrees; selection is diversity-aware") {
    val rows = graft.core.Catalog.embeddings(spark, Sf0001)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var ab = 0.0; var aa = 0.0; var bb = 0.0; var i = 0
      while (i < a.length) { ab += a(i)*b(i); aa += a(i)*a(i)
        bb += b(i)*b(i); i += 1 }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    val q = rows.find(_._1 == 0L).get._2
    val sims = rows.filter(_._1 != 0L).map { case (id, v) =>
      (id, math.floor(cos(v, q) * 1e6 + 0.5).toLong, v) }
    val pool = sims.sortBy(x => (-x._2, x._1)).take(50)
    val sd = (for { a <- pool; b <- pool if a._1 < b._1 } yield
      (a._1, b._1) -> math.floor(cos(a._3, b._3) * 1e6 + 0.5).toLong).toMap
    def sdOf(x: Long, y: Long) =
      sd.getOrElse((x min y, x max y), 0L)
    var sel = Vector.empty[(Long, Long, Long)]
    var rem = pool.map(p => (p._1, p._2)).toVector
    while (sel.length < 5) {
      val scoredRem = rem.map { case (id, sq) =>
        val ms = if (sel.isEmpty) 0L else sel.map(s => sdOf(id, s._1)).max
        (id, sq, ms)
      }
      val pick = scoredRem.minBy { case (id, sq, ms) => (-(sq - ms), id) }
      sel :+= pick
      rem = rem.filterNot(_._1 == pick._1)
    }
    val got = VectorOps.mmrTopk(spark, Sf0001, 0, 5, 50).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(got.map(_._2).toSeq === sel.map(_._1))
    got.zip(sel).foreach { case ((_, _, s, m), (_, sq, ms)) =>
      assert((s - sq / 1e6).abs <= 1e-9 && (m - ms / 1e6).abs <= 1e-9)
    }
    // diversification must actually bite: the MMR set differs from the
    // plain top-5 unless the pool is already diverse — assert the
    // penalty was nonzero for at least one late pick
    assert(sel.drop(1).exists(_._3 > 0L))
  }

  test("embed_centroid_shift: parity-split centroid replay agrees") {
    val rows = graft.core.Catalog.embeddings(spark, Sf0001)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).toArray.map(v =>
          math.floor(v.toDouble * 1e6 + 0.5).toLong)))
    def centOf(xs: Array[(Long, Int, Array[Long])]) = {
      val dims = xs.head._3.length
      (Array.tabulate(dims) { i =>
        math.floor(xs.map(_._3(i)).sum.toDouble / xs.length + 0.5).toLong
      }, xs.length.toLong)
    }
    val expected = rows.groupBy(_._2).collect {
      case (lab, xs) if xs.exists(_._1 % 2 == 0) && xs.exists(_._1 % 2 == 1) =>
        val (ce, ne) = centOf(xs.filter(_._1 % 2 == 0))
        val (co, no) = centOf(xs.filter(_._1 % 2 == 1))
        val d2 = ce.zip(co).map { case (a, b) => (a - b) * (a - b) }.sum
        lab -> (ne, no, BigDecimal(math.sqrt(d2.toDouble) / 1e6)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = VectorOps.embedCentroidShift(spark, Sf0001).collect()
    assert(got.map(_.getInt(0)).toSet === expected.keySet)
    got.foreach { r =>
      val (ne, no, sh) = expected(r.getInt(0))
      assert((r.getLong(1), r.getLong(2)) === ((ne, no)))
      assert((r.getDouble(3) - sh).abs <= 1e-6, s"label ${r.getInt(0)}")
    }
  }

  test("index_doc_keyphrases == doc_keyphrases (one scoring definition)") {
    val a = TextOps.docKeyphrases(spark, Sf0001, 3).collect().toSeq
    val b = graft.streaming.FeatureIndex
      .indexedDocKeyphrases(spark, Sf0001, 3).collect().toSeq
    assert(a === b)
  }

  test("vocab_growth: first-seen-doc cumulative vocab replay agrees") {
    val wc = TextOps.wordCounts(spark, Sf0001)
      .select("doc_id", "tok", "c").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val ids = wc.map(_._1).distinct.sorted
    val n = ids.length
    val cuts = ids.zipWithIndex.collect {
      case (d, i) if ((i + 1) * 10) / n > (i * 10) / n => (d, (i + 1).toLong)
    }
    val firstSeen = wc.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val perDoc = wc.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val got = TextOps.vocabGrowth(spark, Sf0001, 10).collect()
    assert(got.length === cuts.length)
    got.zip(cuts).foreach { case (r, (cut, nd)) =>
      assert((r.getLong(0), r.getLong(1)) === ((nd, cut)))
      val toks = perDoc.filter(_._1 <= cut).values.sum
      val voc = firstSeen.values.count(_ <= cut).toLong
      assert(r.getLong(2) === toks && r.getLong(3) === voc, s"cut $cut")
      val ttr = BigDecimal(voc.toDouble / toks)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert((r.getDouble(4) - ttr).abs <= 1e-9)
    }
    // the last checkpoint covers the whole corpus
    assert(got.last.getLong(0) === n.toLong)
  }

  /** The driver-side mirror of [[TextOps.piiInjectedDocs]]'s closed-form
    * synthesis — every 7th doc gains an email + IPv4, every 5th a phone. */
  private def injectPii(docId: Long, text: String): String = {
    val em = if (docId % 7 == 0)
      s" contact user$docId@example.com from 10.0.${docId % 256}.1" else ""
    val ph = if (docId % 5 == 0)
      f" call 555-${docId % 1000}%03d-${docId % 10000}%04d" else ""
    text + em + ph
  }

  test("pii_stats: driver regex replay agrees per source (injected view)") {
    val docs = graft.core.Catalog.documents(spark, Sf0001)
      .select("source", "text", "doc_id").collect()
      .map(r => (r.getString(0), injectPii(r.getLong(2), r.getString(1))))
    def cnt(re: String, s: String): Long = {
      val m = java.util.regex.Pattern.compile(re).matcher(s)
      var n = 0L; while (m.find()) n += 1; n
    }
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}"
    val ip = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
    val expected = docs.groupBy(_._1).map { case (src, xs) =>
      val hits = xs.map { case (_, t) =>
        (cnt(email, t), cnt(phone, t), cnt(ip, t)) }
      src -> (xs.length.toLong,
        hits.count(h => h._1 + h._2 + h._3 > 0).toLong,
        hits.map(_._1).sum, hits.map(_._2).sum, hits.map(_._3).sum)
    }
    val got = TextOps.piiStats(spark, Sf0001).collect()
    assert(got.map(_.getString(0)).toSet === expected.keySet)
    got.foreach { r =>
      val (nd, pd, em, ph, ipc) = expected(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5),
        r.getLong(6)) === ((nd, pd, em, ph, ipc)), r.getString(0))
      val rate = math.floor(pd.toDouble / nd * 1e6 + 0.5) / 1e6
      assert((r.getDouble(3) - rate).abs <= 1e-9)
    }
    // the injection makes the positive path real: every pattern class
    // must register actual hits (the shipped fixtures alone have zero)
    assert(got.map(_.getLong(4)).sum > 0, "no email hits — vacuous face")
    assert(got.map(_.getLong(5)).sum > 0, "no phone hits — vacuous face")
    assert(got.map(_.getLong(6)).sum > 0, "no IPv4 hits — vacuous face")
  }

  test("pii_redact: one pinned redaction per pattern class") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail me at jane.doe+x@corp-mail.io today"),
      (2L, "hotline +1 800-555-0199 or 212 555 0142"),
      (3L, "peer at 192.168.001.200 port 8080"),
      (4L, "no pii here at all"),
      (5L, "alice@ex.co saw 10.1.2.3 call 555-123-4567 twice: 555-123-4567"))
      .toDF("doc_id", "text")
    val got = TextOps.piiRedactOver(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // doc 4 carries no PII: the no-op path must NOT emit a row
    assert(!got.contains(4L))
    // one pinned positive per class, exact redacted text via md5
    assert(got(1L) === ((1L, 0L, 0L,
      md5hex("mail me at [EMAIL] today"))))
    // "+1 800-555-0199": the +?ddd[- ]ddd[- ]dddd window anchors at
    // "800-555-0199" (the "+1 " prefix fails the 3-digit head)
    assert(got(2L) === ((0L, 2L, 0L,
      md5hex("hotline +1 [PHONE] or [PHONE]"))))
    assert(got(3L) === ((0L, 0L, 1L,
      md5hex("peer at [IP] port 8080"))))
    // sequential email → phone → IP composition over one doc, with a
    // repeated phone proving global (all-occurrence) replacement
    assert(got(5L) === ((1L, 2L, 1L,
      md5hex("[EMAIL] saw [IP] call [PHONE] twice: [PHONE]"))))
  }

  test("event_mix_drift: driver KL replay per day agrees") {
    val ev = graft.core.Catalog.events(spark, Sf0001)
      .selectExpr("(ts div 1000000000) div 86400 as day", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val dt = ev.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val overall = ev.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nn = ev.length.toLong
    val expected = ev.map(_._1).distinct.sorted.map { day =>
      val cells = dt.filter(_._1._1 == day)
      val nd = cells.values.sum
      val s = cells.map { case ((_, t), cd) =>
        cd * math.log((cd * nn).toDouble / (nd * overall(t)).toDouble)
      }.sum
      val klu = BigDecimal(s / nd * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      (day, nd, BigDecimal(klu.toDouble / 1e6)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = EventOps.eventMixDrift(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(x => (x._1, x._2)) === expected.map(x => (x._1, x._2)))
    got.zip(expected).foreach { case ((_, _, a), (_, _, b)) =>
      assert((a - b).abs <= 2e-6) } // ±1 micro-nat on the float sum order
    assert(got.exists(_._3 > 0.0))
  }

  test("event_seasonality: hour-of-day counts and shares conserve events") {
    val ev = graft.core.Catalog.events(spark, Sf0001)
      .selectExpr("event_type", "pmod((ts div 1000000000) div 3600, 24) as h")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byType = ev.groupBy(_._1)
    val got = EventOps.eventSeasonality(spark, Sf0001).collect()
    assert(got.map(_.getLong(2)).sum === ev.length.toLong)
    got.foreach { r =>
      val (t, h, n, share) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val xs = byType(t)
      assert(n === xs.count(_._2 == h).toLong, s"($t,$h)")
      val exp = BigDecimal(n.toDouble / xs.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert((share - exp).abs <= 1e-9, s"share ($t,$h)")
    }
  }

  test("user_value_deciles: ntile segments conserve users and value") {
    val per = graft.core.Catalog.events(spark, Sf0001)
      .selectExpr("user_id",
        """case when event_type = 'purchase' and value is not null
          |then cast(floor(value * 1e6 + 0.5) as long) else 0L end as vm"""
          .stripMargin.replace("\n", " "))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (u, xs) => (u, xs.map(_._2).sum) }.toSeq
    val sorted = per.sortBy(x => (x._2, x._1))
    val total = sorted.length; val base = total / 10; val extra = total % 10
    val bounds = (0 until 10).scanLeft(0) { (acc, i) =>
      acc + base + (if (i < extra) 1 else 0) }
    val decOf = sorted.zipWithIndex.map { case ((u, _), i) =>
      u -> bounds.indexWhere(_ > i).toLong }.toMap
    val expected = per.groupBy(x => decOf(x._1)).map { case (d, xs) =>
      d -> (xs.size.toLong, xs.map(_._2).sum, xs.map(_._2).min,
        xs.map(_._2).max) }
    val got = EventOps.userValueDeciles(spark, Sf0001, 10).collect()
    assert(got.map(_.getLong(1)).sum === per.length.toLong)
    got.foreach { r =>
      val (nu, sv, mn, mx) = expected(r.getLong(0))
      assert(r.getLong(1) === nu, s"decile ${r.getLong(0)}")
      assert((r.getDouble(2) - sv.toDouble / 1e6).abs <= 1e-6)
      assert((r.getDouble(3) - mn.toDouble / 1e6).abs <= 1e-6)
      assert((r.getDouble(4) - mx.toDouble / 1e6).abs <= 1e-6)
    }
  }

  test("mips_topk: brute-force dot-product replay agrees") {
    val rows = graft.core.Catalog.embeddings(spark, Sf0001)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val q = rows.find(_._1 == 0L).get._2.map(_.toDouble)
    val scores = rows.filter(_._1 != 0L).map { case (id, v) =>
      (id, v.map(_.toDouble).zip(q).foldLeft(0.0) { case (s, (a, b)) =>
        s + a * b })
    }
    val want = scores.sortBy { case (id, s) => (-s, id) }.take(10)
      .map { case (id, s) => id -> BigDecimal(s)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble }
      .sortBy(_._1)
    val got = VectorOps.mipsTopk(spark, Sf0001, 0, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.map(_._1) === want.map(_._1).toSeq)
    got.zip(want).foreach { case ((_, g), (_, w)) =>
      assert((g - w).abs <= 1e-6) }
  }

  test("event_path_topk: driver session-path replay agrees") {
    val ev = graft.core.Catalog.events(spark, Sf0001)
      .selectExpr("user_id", "ts div 1000000000 as s", "event_id",
        "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val paths = ev.groupBy(_._1).values.flatMap { xs =>
      val sorted = xs.sortBy(x => (x._2, x._3))
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer.empty[String])
      var prev = Option.empty[Long]
      sorted.foreach { case (_, s, _, t) =>
        if (prev.exists(p => s - p > 3600)) sessions +=
          scala.collection.mutable.ArrayBuffer.empty[String]
        sessions.last += t; prev = Some(s)
      }
      sessions.map(_.take(8).mkString(">"))
    }.toSeq
    val expected = paths.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val got = EventOps.eventPathTopk(spark, Sf0001, 3600, 8, 20).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === expected)
  }

  test("user_activity_hist: buckets are ⌊log2 n⌋, populations conserve users") {
    val perUser = graft.core.Catalog.events(spark, Sf0001)
      .groupBy("user_id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(1))
    val expected = perUser.groupBy(n => 63 - java.lang.Long.numberOfLeadingZeros(n))
      .map { case (b, xs) => b.toLong -> (xs.length.toLong, xs.min, xs.max) }
    val got = EventOps.userActivityHist(spark, Sf0001).collect()
    assert(got.map(_.getLong(1)).sum === perUser.length.toLong)
    got.foreach { r =>
      val (nu, lo, hi) = expected(r.getLong(0))
      assert(r.getLong(1) === nu && r.getLong(2) === lo && r.getLong(3) === hi,
        s"bucket ${r.getLong(0)}")
      // the bucket bound really is the power-of-two band
      assert(lo >= (1L << r.getLong(0)) && hi < (2L << r.getLong(0)))
    }
  }

  test("lang_id_margin: confidence is the exact micro-averaged top-vote share") {
    val wc = TextOps.wordCountsOf(
      graft.core.Catalog.documents(spark, Sf0001)
        .select("doc_id", "text", "source"), Seq("source"))
    // wordCountsOf(carry = source) columns: (doc_id, source, tok, c)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    def vote(tok: String): Int = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      md5.charAt(0).toInt % 5
    }
    val perDoc = wc.groupBy(x => (x._1, x._2)).map { case ((_, src), xs) =>
      val votes = Array.fill(5)(0L)
      xs.foreach { case (_, _, tok, c) => votes(vote(tok)) += c }
      (src, votes.max, votes.sum)
    }
    val expected = perDoc.groupBy(_._1).map { case (src, xs) =>
      src -> (xs.size.toLong, xs.map(_._2).sum, xs.map(_._3).sum) }
    val got = TextOps.langIdMargin(spark, Sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (nd, top, tot) = expected(r.getString(0))
      assert(r.getLong(1) === nd && r.getLong(2) === top && r.getLong(3) === tot,
        s"votes of ${r.getString(0)}")
      assert((r.getDouble(4) - top.toDouble / tot).abs <= 1e-6)
    }
  }

  test("event_cooccurrence: jaccard from exact cells; symmetric pair set") {
    val cells = graft.core.Catalog.events(spark, Sf0001)
      .select(col("user_id"), expr("ts div 1000000000 div 86400").as("day"),
        col("event_type"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byType = cells.groupBy(_._3).map { case (t, xs) => t -> xs.length }
    val got = EventOps.eventCoOccurrence(spark, Sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      assert(ta < tb, "pairs are canonical (type_a < type_b)")
      val both = cells.filter(_._3 == ta).map(c => (c._1, c._2)).toSet
        .intersect(cells.filter(_._3 == tb).map(c => (c._1, c._2)).toSet)
        .size
      assert(r.getLong(4) === both.toLong, s"n_both of ($ta, $tb)")
      assert(r.getLong(2) === byType(ta).toLong)
      assert(r.getLong(3) === byType(tb).toLong)
      val jac = both.toDouble / (byType(ta) + byType(tb) - both)
      assert((r.getDouble(5) - jac).abs <= 1e-6, s"jaccard of ($ta, $tb)")
    }
  }

  test("ann_ivfpq_topk: PQ scores agree with ann_pq_topk; set ⊆ probed cells") {
    val ivfpq = VectorOps.annIvfPqTopk(spark, Sf0001, 0, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(ivfpq.length === 10)
    // same ADC scoring as the unpruned PQ path (both rank on the
    // Lloyd-trained codebook since r14): any id both return must carry
    // the identical approx distance
    val pq = VectorOps.annPqTopkTrained(spark, Sf0001, 0, 50).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    ivfpq.foreach { case (id, d) =>
      pq.get(id).foreach(dd => assert(dd === d, s"ADC distance of vec $id"))
    }
    // distances are the displayed rank order (ties on vec_id)
    assert(ivfpq.map(_._2).toSeq === ivfpq.map(_._2).sorted.toSeq)
  }

  test("source_similarity: driver-recomputed jaccard on distinct source shingles") {
    val got = TextOps.sourceSimilarity(spark, Sf0001).collect()
    assert(got.nonEmpty)
    val sh = TextOps.shingles(spark, Sf0001)
      .join(graft.core.Catalog.documents(spark, Sf0001)
        .select("doc_id", "source"), "doc_id")
      .select("source", "h").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySrc = sh.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSet }
    got.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b, "canonical pair order")
      val inter = bySrc(a).intersect(bySrc(b)).size
      assert(r.getLong(2) === inter.toLong, s"n_common of ($a, $b)")
      val jac = inter.toDouble / (bySrc(a).size + bySrc(b).size - inter)
      assert((r.getDouble(3) - jac).abs <= 1e-6, s"jaccard of ($a, $b)")
    }
  }

  test("index_ann_ivfpq_topk equals the session-built ann_ivfpq_topk") {
    val session = VectorOps.annIvfPqTopk(spark, Sf0001, 0, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val indexed = graft.streaming.FeatureIndex
      .indexedAnnIvfPqTopk(spark, Sf0001, 0, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(indexed === session)
  }

  test("embed_covariance: driver recompute of the flagged pairs' moments") {
    val got = VectorOps.embedCovariance(spark, Sf0001, 10).collect()
    assert(got.length === 10)
    val vecs = graft.core.Catalog.embeddings(spark, Sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(_.getSeq[Double](1).map(v => math.floor(v * 1e3 + 0.5).toLong))
    val n = vecs.length.toLong
    got.foreach { r =>
      val (d1, d2) = (r.getLong(0).toInt, r.getLong(1).toInt)
      assert(d1 < d2, "canonical dim order")
      val (a, b) = (vecs.map(_(d1)), vecs.map(_(d2)))
      val covS = n * a.zip(b).map { case (x, y) => x * y }.sum -
        a.sum * b.sum
      assert((r.getDouble(2) - covS.toDouble / (n * n) / 1e6).abs <= 5e-7,
        s"cov of ($d1, $d2)")
      val v1 = n * a.map(x => x * x).sum - a.sum * a.sum
      val v2 = n * b.map(x => x * x).sum - b.sum * b.sum
      val corr = covS / math.sqrt(v1.toDouble * v2.toDouble)
      assert((r.getDouble(3) - corr).abs <= 5e-7, s"corr of ($d1, $d2)")
      assert(r.getDouble(3).abs <= 1.0 + 1e-9)
    }
    // ranked by |corr| descending
    val cs = got.map(_.getDouble(3).abs).toSeq
    assert(cs === cs.sorted.reverse)
  }

  test("vocab_zipf: a single fit row with a negative, explanatory slope") {
    val r = TextOps.vocabZipf(spark, Sf0001, 100).collect()
    assert(r.length === 1)
    // the word-soup fixture's whole vocabulary is < topR — the fit then
    // covers all of it (sf0.01+ corpora fill the full top-100)
    val n = r.head.getLong(0)
    assert(n > 10 && n <= 100, s"fit over the available vocabulary, got $n")
    val (slope, r2) = (r.head.getDouble(1), r.head.getDouble(3))
    assert(slope < 0, s"Zipf slope must be negative, got $slope")
    assert(r2 > 0 && r2 <= 1.0, s"r2 must be a valid share, got $r2")
  }

  test("event_pagerank: a probability-like vector over all types, mass sane") {
    val got = EventOps.eventPagerank(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val types = graft.core.Catalog.events(spark, Sf0001)
      .select("event_type").distinct().count()
    assert(got.length === types.toInt, "one rank per event type")
    got.foreach { case (t, p) => assert(p > 0 && p < 1, s"rank of $t") }
    // integer floor-divisions only ever LOSE mass: total ≤ 1, and the
    // damped base alone guarantees ≥ 0.15 of it survives
    val mass = got.map(_._2).sum
    assert(mass <= 1.0 + 1e-6 && mass >= 0.15, s"total rank mass $mass")
    // deterministic: a second run is bit-identical
    val again = EventOps.eventPagerank(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq === again.toSeq)
  }

  private def normWords(text: String): Array[String] =
    text.toLowerCase.trim.replaceAll("\\s+", " ").split(" ", -1)

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("chunk_documents covers every word; starts stride apart; last hits the end") {
    val docs = graft.core.Catalog.documents(spark, Sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> normWords(r.getString(1)).length).toMap
    val chunks = TextOps.chunkDocuments(spark, Sf0001, 64, 48).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(chunks.map(_._1).toSet === docs.keySet)
    chunks.groupBy(_._1).foreach { case (id, xs) =>
      val n = docs(id).toLong
      val sorted = xs.sortBy(_._2)
      // chunk indexes are 0..k contiguous, starts stride apart
      assert(sorted.map(_._2).toSeq === sorted.indices.map(_.toLong))
      sorted.foreach { case (_, idx, start, cw, h) =>
        assert(start === idx * 48)
        assert(cw === math.min(64L, n - start), s"chunk words doc=$id idx=$idx")
        assert(h.length === 32)
      }
      // the final chunk reaches the end of the doc; no start begins past it
      val last = sorted.last
      assert(last._3 + last._4 === n)
      assert(sorted.size === 1L + math.max(0L, (n - 64 + 47) / 48).max(0L))
    }
  }

  test("dsir_weights matches a driver-side scalar recount") {
    val target = Set("src0", "src1", "src2")
    val docs = graft.core.Catalog.documents(spark, Sf0001)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // bucket masses target-vs-rest
    val nt = Array.fill(16)(0L); val nr = Array.fill(16)(0L)
    def bucket(w: String): Int = md5Hex(w).charAt(0).toInt % 16
    docs.foreach { case (_, src, text) =>
      normWords(text).foreach { w =>
        if (target(src)) nt(bucket(w)) += 1 else nr(bucket(w)) += 1
      }
    }
    val tn = nt.sum; val rn = nr.sum
    val lr = Array.tabulate(16)(b =>
      math.log((nt(b) + 1.0) / (tn + 16.0)) -
        math.log((nr(b) + 1.0) / (rn + 16.0)))
    // per-doc micro-nat weights, then per-source mean
    val perDoc = docs.map { case (id, src, text) =>
      val ws = normWords(text)
      val s = ws.map(w => lr(bucket(w))).sum
      (src, math.rint(s / ws.length * 1e6).toLong)
    }
    val expect = perDoc.groupBy(_._1).map { case (src, xs) =>
      src -> (xs.length.toLong,
        BigDecimal(xs.map(_._2).sum / (xs.length * 1e6))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = TextOps.dsirWeights(spark, Sf0001, target.toSeq.sorted).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (src, (n, w)) =>
      assert(got(src)._1 === n, s"n_docs of $src")
      // the engine sums c·lr per (doc, distinct word); the scalar replay
      // sums per occurrence — same value, different float order, so the
      // micro-rounded per-doc longs can differ by 1 ulp-of-rounding
      assert((got(src)._2 - w).abs <= 1e-5, s"weight of $src")
    }
    // the target distribution scores itself above the rest on average
    val (tSrc, rSrc) = expect.partition(e => target(e._1))
    val tMean = tSrc.map(_._2._2).sum / tSrc.size
    val rMean = rSrc.map(_._2._2).sum / rSrc.size
    assert(tMean > rMean, s"target mean $tMean vs rest $rMean")
  }

  test("semdedup pairs are exactly the same-cell cosine-band pairs") {
    val emb = graft.core.Catalog.embeddings(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    val cents = VectorOps.ivfSeedCentroids(spark, Sf0001, 16)
    val cell = VectorOps.ivfAssign(
      graft.core.Catalog.embeddings(spark, Sf0001)
        .withColumn("vecd", col("embedding").cast("array<double>")),
      cents).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var i = 0; var ab = 0.0; var aa = 0.0; var bb = 0.0
      while (i < a.length) { ab += a(i)*b(i); aa += a(i)*a(i); bb += b(i)*b(i); i += 1 }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    val ids = emb.keys.toArray.sorted
    val expect = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      if cell(a) == cell(b) && cos(emb(a), emb(b)) >= 0.4
    } yield (cell(a), a, b)).toSet
    val got = VectorOps.semDedup(spark, Sf0001, 16, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(t => (t._1, t._2, t._3)).toSet ===
      expect.map(t => (t._1, t._2, t._3)))
    got.foreach { case (_, a, b, sim) =>
      assert((sim - cos(emb(a), emb(b))).abs <= 1e-5)
    }
  }

  test("ann_sq8_topk matches a driver-side scalar replay of the SQ8 chain") {
    val emb = graft.core.Catalog.embeddings(spark, Sf0001).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x * 1e3 + 0.5).toLong).toArray)
      .toMap
    val dims = emb.head._2.length
    val mn = Array.tabulate(dims)(d => emb.values.map(_(d)).min)
    val span = Array.tabulate(dims)(d =>
      math.max(emb.values.map(_(d)).max - mn(d), 1L))
    val codes = emb.map { case (id, mv) =>
      id -> Array.tabulate(dims)(d =>
        math.floor((mv(d) - mn(d)) * 255.0 / span(d) + 0.5).toLong)
    }
    val q = 0L
    val cand = codes.collect { case (id, c) if id != q =>
      val qc = codes(q)
      (id, c.indices.map(i => { val d = c(i) - qc(i); d * d }).sum)
    }.toSeq.sortBy(t => (t._2, t._1)).take(30).map(_._1)
    val expect = cand.map { id =>
      val d2 = emb(id).indices
        .map(i => { val d = emb(id)(i) - emb(q)(i); d * d }).sum
      (id, BigDecimal(math.sqrt(d2.toDouble) / 1e3)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(t => (t._2, t._1)).take(10)
    val got = VectorOps.annSq8Topk(spark, Sf0001, 0, 10, 30).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === expect)
  }

  test("event_attribution matches a driver-side last-touch replay") {
    val ev = graft.core.Catalog.events(spark, Sf0001)
      .selectExpr("event_id", "user_id", "event_type",
        "ts div 1000000000 as s", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    val touches = Set("view", "click")
    val byUser = ev.groupBy(_._2)
    val credited = byUser.values.flatMap { es =>
      val ordered = es.sortBy(e => (e._4, e._1))
      var lastTouch: Option[(Long, String)] = None
      ordered.flatMap { case (_, _, typ, s, v) =>
        val out = if (typ == "purchase") {
          val ch = lastTouch match {
            case Some((ts, t)) if s - ts <= 86400 => t
            case _ => "none"
          }
          Some((ch, v))
        } else None
        if (touches(typ)) lastTouch = Some((s, typ))
        out
      }
    }
    val expect = credited.toSeq.groupBy(_._1).map { case (ch, xs) =>
      val micro = xs.flatMap(_._2).map(v => math.floor(v * 1e6 + 0.5).toLong)
      ch -> (xs.size.toLong,
        BigDecimal(micro.sum / 1e6)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = EventOps.eventAttribution(spark, Sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got === expect)
  }

  test("ann_range_search equals the brute-force cosine band") {
    val emb = graft.core.Catalog.embeddings(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var i = 0; var ab = 0.0; var aa = 0.0; var bb = 0.0
      while (i < a.length) { ab += a(i)*b(i); aa += a(i)*a(i); bb += b(i)*b(i); i += 1 }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    val q = emb(0L)
    val expect = emb.collect {
      case (id, v) if id != 0L && cos(v, q) >= 0.25 => id
    }.toSet
    val got = VectorOps.annRangeSearch(spark, Sf0001, 0, 0.25).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.map(_._1).toSet === expect)
    got.foreach { case (id, sim) =>
      assert((sim - cos(emb(id), q)).abs <= 1e-5)
    }
  }

  /** Driver-side (user, sorted events) replay shared by the session and
    * funnel latency specs. */
  private def eventsByUser: Map[Long, Seq[(Long, Long, String)]] =
    graft.core.Catalog.events(spark, Sf0001)
      .selectExpr("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
      .map { case (u, es) =>
        u -> es.map(e => (e._2, e._3, e._4)).sortBy(e => (e._1, e._2)).toSeq
      }

  test("session_stats: bucket histogram conserves sessions and durations") {
    // driver-side sessionize at second resolution, gap > 3600
    val sessions = eventsByUser.values.flatMap { es =>
      val secs = es.map(e => (e._1 / 1000000000L, e._2)).sortBy(identity)
      val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
      var cur = scala.collection.mutable.ArrayBuffer.empty[Long]
      var prev = Long.MinValue
      secs.foreach { case (s, _) =>
        if (cur.nonEmpty && s - prev > 3600) { out += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer.empty[Long] }
        cur += s; prev = s
      }
      if (cur.nonEmpty) out += cur.toSeq
      out
    }.toSeq
    val expect = sessions
      .map(s => (math.min(s.length, 10).toLong, s.max - s.min))
      .groupBy(_._1)
      .map { case (b, xs) => b -> (xs.size.toLong, xs.map(_._2).sum) }
    val got = EventOps.sessionStats(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expect)
    // avg = total / n at 6 dp
    EventOps.sessionStats(spark, Sf0001).collect().foreach { r =>
      val want = BigDecimal(r.getLong(2).toDouble / r.getLong(1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) === want)
    }
  }

  test("funnel_time_to_convert: deltas replay the first-reach cascade") {
    val reaches = eventsByUser.values.flatMap { es =>
      def firstAtOrAfter(typ: String, t: Long): Option[Long] =
        es.collectFirst { case (ts, _, et) if et == typ && ts >= t => ts }
      for (t0 <- es.collectFirst { case (ts, _, "view") => ts })
        yield (t0, firstAtOrAfter("click", t0).map { t1 =>
          (t1, firstAtOrAfter("purchase", t1))
        })
    }.toSeq
    val c1 = reaches.collect { case (t0, Some((t1, _))) => (t1 - t0) / 1000 }
    val c2 = reaches.collect { case (_, Some((t1, Some(t2)))) => (t2 - t1) / 1000 }
    val got = EventOps.funnelTimeToConvert(spark, Sf0001).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.length === 2)
    def avg6(us: Seq[Long]): Double =
      BigDecimal(us.sum.toDouble / (us.size * 1e6))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0) === (("view->click", c1.size.toLong, avg6(c1))))
    assert(got(1) === (("click->purchase", c2.size.toLong, avg6(c2))))
  }

  test("event_markov_entropy: micro-nat entropy over replayed transitions") {
    val trans = eventsByUser.values.flatMap { es =>
      val ordered = es.map(e => (e._1 / 1000000000L, e._2, e._3))
        .sortBy(e => (e._1, e._2)).map(_._3)
      ordered.zip(ordered.drop(1))
    }.toSeq
    val expect = trans.groupBy(_._1).map { case (from, xs) =>
      val counts = xs.groupBy(_._2).values.map(_.size.toLong).toSeq
      val n = counts.sum
      val h = math.log(n.toDouble) -
        counts.map(c => c * math.log(c.toDouble)).sum / n
      val unats = BigDecimal(h * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      from -> (n, counts.size.toLong, unats / 1e6)
    }
    val got = EventOps.markovEntropy(spark, Sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.keySet === expect.keySet)
    got.foreach { case (from, (n, k, h)) =>
      val (en, ek, eh) = expect(from)
      assert(n === en && k === ek, s"counts for $from")
      assert((h - eh).abs <= 1e-6, s"entropy for $from")
    }
    // entropy is bounded by ln(#destinations)
    got.foreach { case (_, (_, k, h)) =>
      assert(h >= 0 && h <= math.log(k.toDouble) + 1e-9)
    }
  }

  test("gopher_rules: per-source fails replay; rules actually discriminate") {
    val docs = graft.core.Catalog.documents(spark, Sf0001)
      .selectExpr("source", "lower(trim(text)) as t").collect()
      .map(r => (r.getString(0),
        r.getString(1).split("\\s+").filter(_.nonEmpty).toSeq))
    val stop = Set("the", "a", "of", "to", "and", "in", "is", "it")
    val expect = docs.groupBy(_._1).map { case (src, ds) =>
      val rules = ds.map { case (_, ws) =>
        val words = ws.size.toLong
        val types = ws.distinct.size.toLong
        val lenMass = ws.map(_.length.toLong).sum
        val stopTypes = ws.distinct.count(stop).toLong
        (words < 50 || words > 100000,
          lenMass < words * 3 || lenMass > words * 10,
          stopTypes < 2,
          types * 5 < words)
      }
      src -> (ds.size.toLong,
        rules.count(_._1).toLong, rules.count(_._2).toLong,
        rules.count(_._3).toLong, rules.count(_._4).toLong,
        rules.count(r => !r._1 && !r._2 && !r._3 && !r._4).toLong)
    }
    val got = TextOps.gopherRules(spark, Sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(got === expect)
    // the gate must bite somewhere and pass somewhere
    assert(got.values.map(_._6).sum > 0)
    assert(got.values.map(v => v._2 + v._3 + v._4 + v._5).sum > 0)
  }

  test("embed_threshold_sweep: one-pass counts equal per-threshold neardup runs") {
    val got = VectorOps.embedThresholdSweep(spark, Sf0001).collect()
      .map(r => r.getDouble(0) -> r.getLong(1))
    assert(got.map(_._1).toSeq === Seq(0.3, 0.35, 0.4, 0.45, 0.5))
    // monotone non-increasing in the threshold
    got.map(_._2).sliding(2).foreach {
      case Array(a, b) => assert(a >= b)
      case _ =>
    }
    // each count equals the registered near-dup plan's pair count there
    got.foreach { case (t, n) =>
      assert(n === VectorOps.embedNearDupLsh(spark, Sf0001, t).count(),
        s"count at $t")
    }
  }

  test("mm_phash_dedup groups replay the stub-bit arithmetic; keepers are minima") {
    val docs = graft.core.Catalog.documents(spark, Sf0001)
      .selectExpr("doc_id",
        "cast(octet_length(cast(text as binary)) as bigint) as n").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def blocks(n: Long): (Long, Long, Long, Long) = {
      def block(b: Int) = (0 until 16).map { r =>
        if ((n * (16 * b + r + 1)) % 997 >= 498) 1L << r else 0L
      }.sum
      (block(0), block(1), block(2), block(3))
    }
    val expect = docs.groupBy(d => blocks(d._2))
      .collect { case (k, ds) if ds.length >= 2 =>
        k -> (ds.length.toLong, ds.map(_._1).min)
      }
    val got = MultimodalOps.phashDedup(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ->
        (r.getLong(4), r.getLong(5))).toMap
    assert(got === expect)
    assert(got.nonEmpty) // equal-length payloads exist in the fixture
  }

  test("mm_phash_clusters/apply replay a brute-force closure over the " +
      "hamming<=3 pair graph; exact copies cluster with near-dups") {
    // brute-force union-find over ALL pairs with hamming <= 3 (including
    // 0 — exact copies must land in their near-dups' components, which
    // is why the engine unions the collision stars into the pair graph)
    val docs = graft.core.Catalog.documents(spark, Sf0001)
      .selectExpr("doc_id",
        "cast(octet_length(cast(text as binary)) as bigint) as n").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def blocks(n: Long): Seq[Long] = (0 until 4).map { b =>
      (0 until 16).map { r =>
        if ((n * (16 * b + r + 1)) % 997 >= 498) 1L << r else 0L
      }.sum
    }
    val hs = docs.map { case (id, n) => (id, blocks(n)) }
    val parent = scala.collection.mutable.Map(hs.map(h => h._1 -> h._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (i <- hs.indices; j <- (i + 1) until hs.length) {
      val ham = hs(i)._2.zip(hs(j)._2)
        .map { case (a, b) => java.lang.Long.bitCount(a ^ b) }.sum
      if (ham <= 3) {
        val (ra, rb) = (find(hs(i)._1), find(hs(j)._1))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    val comp = hs.map(h => h._1 -> find(h._1))
    // the engine's CC (and the recursive-CTE oracle) label only nodes
    // that appear in an edge — singleton components never surface
    val expectClusters = comp.groupBy(_._2).view
      .mapValues(_.length.toLong).filter(_._2 >= 2).toMap
    val gotClusters = MultimodalOps.phashClusters(spark, Sf0001, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotClusters === expectClusters)
    // a multi-member cluster exists, and at least one contains an exact
    // pair (same full hash) AND a strictly-near pair — the spectrum is
    // genuinely closed, not two disjoint families relabeled
    assert(gotClusters.exists(_._2 >= 2))
    val byComp = comp.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val hashOf = hs.toMap
    assert(byComp.values.exists { members =>
      val pairs = for (a <- members; b <- members if a < b) yield
        hashOf(a).zip(hashOf(b))
          .map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      pairs.exists(_ == 0) && pairs.exists(h => h > 0 && h <= 3)
    })
    // apply = complement of the non-keepers, keeper = component min
    val removed = comp.filter { case (id, root) => id != root }.map(_._1).toSet
    val kept = MultimodalOps.phashDedupApply(spark, Sf0001, 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === docs.map(_._1).toSet -- removed)
    // size histogram = the same components in floor(log2 size) buckets
    val expectHist = expectClusters.values.groupBy(v =>
      63 - java.lang.Long.numberOfLeadingZeros(v))
      .view.mapValues(xs => (xs.size.toLong, xs.sum, xs.min, xs.max)).toMap
    val gotHist = MultimodalOps.phashClusterSizes(spark, Sf0001, 3)
      .collect().map(r => r.getLong(0).toInt ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(gotHist === expectHist)
  }

  test("span_excise replays the brute-force rewrite; full and partial " +
      "excisions both live on the fixture") {
    val n = 13
    val docs = graft.core.Catalog.documents(spark, Sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), normWords(r.getString(1)).toSeq))
    val grams = docs.flatMap { case (id, ws) =>
      (0 to ws.length - n).map(p => (id, p, ws.slice(p, p + n).mkString(" ")))
    }
    val df = grams.map(g => (g._1, g._3)).distinct.groupBy(_._2)
      .view.mapValues(_.size).toMap
    val expect = docs.flatMap { case (id, ws) =>
      val dupStarts = (0 to ws.length - n)
        .filter(p => df(ws.slice(p, p + n).mkString(" ")) >= 2)
      if (dupStarts.isEmpty) None else {
        val covered = dupStarts.flatMap(p => p until p + n).toSet
        val kept = ws.zipWithIndex.collect {
          case (w, i) if !covered.contains(i) => w
        }
        Some(id -> (ws.length.toLong, dupStarts.size.toLong,
          covered.size.toLong, md5Hex(kept.mkString(" "))))
      }
    }.toMap
    val got = TextOps.spanExcise(spark, Sf0001, n).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(got === expect)
    assert(got.nonEmpty)
    // both excision regimes live on the fixture: full (exact copies ->
    // empty rewrite, md5('')) and partial (a surviving remainder)
    val emptyMd5 = md5Hex("")
    assert(got.values.exists(_._4 == emptyMd5))
    assert(got.values.exists { case (nw, _, nr, _) => nr < nw })
  }

  test("span_excise merges overlapping grams and excises MULTIPLE " +
      "disjoint runs from one document") {
    import spark.implicits._
    // doc 1 holds TWO duplicated 3-gram runs (shared with docs 2 and 3
    // respectively) separated by unique filler; the runs overlap within
    // themselves (a b c / b c d -> one merged 4-word run each side)
    val docs = Seq(
      (1L, "a b c d u1 u2 u3 u4 x y z w"),
      (2L, "p1 a b c d p2"),
      (3L, "q1 x y z w q2")).toDF("doc_id", "text")
    val got = TextOps.spanExciseDocs(docs, 3)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // doc 1: dup gram starts at 0,1 (a b c / b c d) and 8,9 (x y z /
    // y z w) -> covered {0..3} U {8..11}, TWO disjoint runs, kept
    // "u1 u2 u3 u4"; docs 2 and 3 each lose their middle 4-word run
    assert(got(1L) === ((12L, 4L, 8L, md5Hex("u1 u2 u3 u4"))))
    assert(got(2L) === ((6L, 2L, 4L, md5Hex("p1 p2"))))
    assert(got(3L) === ((6L, 2L, 4L, md5Hex("q1 q2"))))
  }

  test("sketch_kll_levels equals a sequential KLL simulation; " +
      "deterministic-compaction rank-error bound holds") {
    val cap = 64
    // the REAL streaming semantics: push one item at a time, flush any
    // level that reaches capacity (sort, promote even 1-based sorted
    // positions, clear) — the operator's binary-counter closed form
    // must equal this fold exactly
    val items = graft.core.Catalog.documents(spark, Sf0001)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val levels = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long)])
    items.foreach { case (id, x) =>
      levels(0) += ((x, id))
      var h = 0
      while (h < levels.length && levels(h).length >= cap) {
        val sorted = levels(h).sortBy(identity).toIndexedSeq
        if (levels.length == h + 1)
          levels += scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        levels(h + 1) ++= sorted.zipWithIndex.collect {
          case (v, i) if (i + 1) % 2 == 0 => v
        }
        levels(h).clear()
        h += 1
      }
    }
    val expect = levels.zipWithIndex.flatMap { case (buf, h) =>
      buf.sorted.zipWithIndex.map { case ((x, id), s) =>
        (h.toLong, s.toLong + 1) -> (1L << h, x, id)
      }
    }.toMap
    val got = TextOps.sketchKllLevels(spark, Sf0001, cap, 12).collect()
      .map(r => (r.getLong(0), r.getLong(2)) ->
        (r.getLong(1), r.getLong(3), r.getLong(4))).toMap
    assert(got === expect)
    assert(got.keys.map(_._1).max >= 3) // a real hierarchy, not one level
    // rank-error: per-flush even-keep displaces a rank query by at most
    // the level's weight; F_h = N div (cap * 2^h) flushes at level h
    val n = items.length
    val bound = (0 until 12).map(h => (n / (cap << h)).toLong * (1L << h)).sum
    val retained = got.toSeq.map { case ((_, _), (w, x, _)) => (w, x) }
    items.map(_._2).distinct.foreach { q =>
      val exact = items.count(_._2 <= q).toLong
      val est = retained.collect { case (w, x) if x <= q => w }.sum
      assert(math.abs(est - exact) <= bound,
        s"rank error ${math.abs(est - exact)} > $bound at q=$q")
    }
    // the quantile face: mass conservation (sum of retained weights =
    // N exactly) and every estimated quantile's TRUE rank within the
    // same deterministic-compaction bound of its target
    assert(retained.map(_._1).sum === n.toLong)
    TextOps.sketchKllQuantiles(spark, Sf0001, cap, 12).collect()
      .foreach { r =>
        val (target, estQ, exactQ) =
          (r.getLong(3), r.getLong(4), r.getLong(5))
        assert(exactQ === items.map(_._2).sorted.apply(target.toInt - 1))
        val below = items.count(_._2 < estQ).toLong
        val atOrBelow = items.count(_._2 <= estQ).toLong
        assert(atOrBelow >= target - bound && below < target + bound,
          s"est quantile $estQ true-rank window [$below,$atOrBelow] " +
            s"vs target $target +- $bound")
      }
  }

  test("unigram_lm_train/apply replay the brute-force Viterbi-EM; the " +
      "E-step genuinely reallocates usage off the seed") {
    val maxPiece = 4
    val big = 1000000000000000L
    // word counts from the fixture (the trainer's working set)
    val words = graft.core.Catalog.documents(spark, Sf0001)
      .select("text").collect()
      .flatMap(r => normWords(r.getString(0)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    // seed: all substrings len 1..4 with occurrence mass; chars + top-24
    val cand = words.toSeq.flatMap { case (w, c) =>
      for (p <- w.indices; l <- 1 to math.min(maxPiece, w.length - p))
        yield (w.substring(p, p + l), c)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val seed = cand.filter(_._1.length == 1) ++
      cand.filter(_._1.length >= 2).toSeq
        .sortBy { case (p, c) => (-c, p) }.take(24)
    def costs(usage: Map[String, Long]): Map[String, Long] = {
      val n = usage.values.map(_ + 1).sum
      usage.map { case (p, c) =>
        p -> math.floor(math.log(n.toDouble / (c + 1)) * 1e6 + 0.5).toLong
      }
    }
    def viterbi(w: String, nllu: Map[String, Long]): Seq[String] = {
      val L = w.length
      val best = Array.fill(L + 1)(big * 100); best(0) = 0L
      val par = Array.fill(L + 1)(-1)
      for (i <- 1 to L) {
        // ascending j (descending piece length): first strict improvement
        // wins, later equal costs do NOT replace (smallest-j tie-break)
        for (k <- math.min(maxPiece, i) to 1 by -1) {
          val j = i - k
          val c = best(j) + nllu.getOrElse(w.substring(j, i), big)
          if (c < best(i)) { best(i) = c; par(i) = j }
        }
      }
      var i = L
      val ps = Seq.newBuilder[String]
      while (i > 0) { ps += w.substring(par(i), i); i = par(i) }
      ps.result()
    }
    def usageUnder(nllu: Map[String, Long]): Map[String, Long] = {
      val u = scala.collection.mutable.Map(seed.keys.map(_ -> 0L).toSeq: _*)
      words.foreach { case (w, c) =>
        viterbi(w, nllu).foreach(p => u(p) += c)
      }
      u.toMap
    }
    val v0 = costs(seed)
    val u1 = usageUnder(v0)
    val v1 = costs(u1)
    val u2 = usageUnder(v1)
    val v2 = costs(u2)
    val expect = (seed.map { case (p, c) => (0L, p) -> (c, v0(p)) } ++
      u1.map { case (p, c) => (1L, p) -> (c, v1(p)) } ++
      u2.map { case (p, c) => (2L, p) -> (c, v2(p)) }).toMap
    val got = TextOps.unigramLmTrain(spark, Sf0001, 24, 2).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got === expect)
    // the E-step genuinely reallocated: some seed piece lost all usage,
    // some multi-char piece survives in the Viterbi paths
    assert(u1.exists { case (p, c) => c == 0 && seed(p) > 0 })
    assert(u1.exists { case (p, c) => p.length > 1 && c > 0 })
    // apply: per-doc word/piece mass under the FINAL costs
    val expectApply = graft.core.Catalog.documents(spark, Sf0001)
      .select("doc_id", "text").collect()
      .map { r =>
        val ws = normWords(r.getString(1))
        r.getLong(0) -> (ws.length.toLong,
          ws.map(w => viterbi(w, v2).length.toLong).sum)
      }.toMap
    val gotApply = TextOps.unigramLmApply(spark, Sf0001, 24, 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(gotApply === expectApply)
  }

  test("mm_phash_incremental replays the brute-force admission: every " +
      "verdict is a new asset's best hamming<=3 match vs indexed/earlier") {
    val docs = graft.core.Catalog.documents(spark, Sf0001)
      .selectExpr("doc_id",
        "cast(octet_length(cast(text as binary)) as bigint) as n").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def blocks(n: Long): Seq[Long] = (0 until 4).map { b =>
      (0 until 16).map { r =>
        if ((n * (16 * b + r + 1)) % 997 >= 498) 1L << r else 0L
      }.sum
    }
    def md5bucket(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 4), 16) % 10
    }
    val hs = docs.map { case (id, n) => (id, blocks(n), md5bucket(id) >= 8) }
    // brute force: for each NEW asset, best (hamming, id) incumbent among
    // ALL indexed assets and smaller-id batch assets within hamming <= 3
    // (including 0 — exact copies reject at admission)
    val expect = hs.filter(_._3).flatMap { case (nid, nh, _) =>
      val cands = hs.filter { case (oid, _, oNew) =>
        oid != nid && (!oNew || oid < nid)
      }.map { case (oid, oh, _) =>
        (oh.zip(nh).map { case (a, b) => java.lang.Long.bitCount(a ^ b) }
          .sum.toLong, oid)
      }.filter(_._1 <= 3)
      if (cands.isEmpty) None else Some(nid -> cands.min)
    }.toMap
    val got = MultimodalOps.phashIncremental(spark, Sf0001, 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(1))).toMap
    assert(got === expect)
    // non-vacuous: verdicts exist, and both incumbency branches are live
    // (an indexed incumbent and an earlier-batch incumbent)
    assert(got.nonEmpty)
    val isNew = hs.map(h => h._1 -> h._3).toMap
    assert(got.values.exists { case (_, dupOf) => !isNew(dupOf) })
  }

  test("event_intervals: per-type gap quantiles replay the sorted interpolation") {
    val gaps = eventsByUser.values.flatMap { es =>
      es.map(e => (e._3, e._1 / 1000000000L, e._2)).groupBy(_._1).toSeq
        .flatMap { case (typ, xs) =>
          val ss = xs.map(x => (x._2, x._3)).toSeq.sortBy(identity).map(_._1)
          ss.zip(ss.drop(1)).map { case (a, b) => (typ, b - a) }
        }
    }.toSeq
    val expect = gaps.groupBy(_._1).flatMap { case (typ, xs) =>
      val sorted = xs.map(_._2).sorted
      Seq(0.5, 0.9, 0.99).map { p =>
        val h = p * (sorted.length - 1)
        val lo = math.floor(h).toInt; val hi = math.ceil(h).toInt
        val q = sorted(lo).toDouble +
          (sorted(hi) - sorted(lo)).toDouble * (h - lo)
        (typ, p) -> BigDecimal(q)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    val got = EventOps.eventIntervals(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(got.keySet === expect.keySet)
    got.foreach { case (k, q) =>
      assert((q - expect(k)).abs <= 1e-6, s"quantile at $k")
    }
  }

  test("embed_pca_project replays the integer power iteration end to end") {
    val emb = graft.core.Catalog.embeddings(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(2),
        r.getSeq[Float](1).map(v =>
          math.floor(v.toDouble * 1e6 + 0.5).toLong).toArray))
    val dims = emb.head._3.length
    val n = emb.length
    val mu = Array.tabulate(dims) { i =>
      math.floor(emb.map(_._3(i)).sum.toDouble / n + 0.5).toLong
    }
    var x = Array.fill(dims)(1000L)
    for (_ <- 1 to 8) {
      val scs = emb.map { case (_, _, em) =>
        em.zip(x).map { case (e, xi) => e * xi }.sum -
          mu.zip(x).map { case (m, xi) => m * xi }.sum
      }
      val y = Array.tabulate(dims) { i =>
        val ys = emb.zip(scs).map { case ((_, _, em), s) =>
          BigInt(em(i)) * BigInt(s)
        }.sum
        val ss = scs.map(BigInt(_)).sum
        ys - BigInt(mu(i)) * ss
      }
      val maxabs = y.map(_.abs).max.toDouble
      x = y.map(v => math.floor(v.toDouble * 1000.0 / maxabs + 0.5).toLong)
    }
    val muX = mu.zip(x).map { case (m, xi) => m * xi }.sum
    val projs = emb.map { case (_, label, em) =>
      label -> (em.zip(x).map { case (e, xi) => e * xi }.sum - muX)
    }
    val expect = projs.groupBy(_._1).map { case (label, xs) =>
      val ps = xs.map(_._2)
      def r6(v: Double) = BigDecimal(v)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      label -> (ps.length.toLong,
        r6(ps.map(BigInt(_)).sum.toDouble / (ps.length * 1e9)),
        r6(ps.min / 1e9), r6(ps.max / 1e9))
    }
    val got = VectorOps.embedPcaProject(spark, Sf0001, 8).collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got.keySet === expect.keySet)
    got.foreach { case (label, (nn, avg, lo, hi)) =>
      val (en, ea, el, eh) = expect(label)
      assert(nn === en, s"n for $label")
      assert((avg - ea).abs <= 1e-6 && (lo - el).abs <= 1e-6
        && (hi - eh).abs <= 1e-6, s"stats for $label")
    }
    // the direction must separate SOMETHING: label means are not all equal
    assert(got.values.map(_._2).toSet.size > 1)
  }

  test("source_kl: non-negative, zero iff the source matches the corpus mix") {
    val got = TextOps.sourceKl(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    // KL is non-negative up to the micro-nat rounding
    got.foreach { case (src, _, kl) => assert(kl >= -1e-6, s"kl for $src") }
    // driver replay on raw tokens
    val docs = graft.core.Catalog.documents(spark, Sf0001)
      .selectExpr("source", "lower(trim(text)) as t").collect()
      .map(r => (r.getString(0), r.getString(1).split("\\s+").filter(_.nonEmpty)))
    val st = docs.flatMap { case (s, ws) => ws.map(w => (s, w)) }
      .groupBy(identity).map { case ((s, w), xs) => (s, w, xs.length.toLong) }
    val cf = st.groupBy(_._2).map { case (w, xs) => w -> xs.map(_._3).sum }
    val ns = st.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._3).sum }
    val nn = cf.values.sum
    val expect = st.groupBy(_._1).map { case (src, xs) =>
      val n = ns(src)
      val sum = xs.map { case (_, w, c) =>
        c * math.log((c * nn).toDouble / (n * cf(w)).toDouble)
      }.sum
      val klu = BigDecimal(sum / n * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      src -> (n, klu / 1e6)
    }
    got.foreach { case (src, n, kl) =>
      assert(n === expect(src)._1, s"n_tokens for $src")
      assert((kl - expect(src)._2).abs <= 2e-6, s"kl for $src")
    }
  }

  test("event_user_overlap: jaccard replays the distinct user sets") {
    val cells = graft.core.Catalog.events(spark, Sf0001)
      .select("user_id", "event_type").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sets = cells.groupBy(_._2).map { case (t, xs) => t -> xs.map(_._1).toSet }
    val types = sets.keys.toSeq.sorted
    val expect = (for {
      a <- types; b <- types if a < b
      inter = (sets(a) & sets(b)).size
    } yield (a, b) -> (inter.toLong,
      BigDecimal(inter.toDouble / (sets(a).size + sets(b).size - inter))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toMap
    val got = EventOps.eventUserOverlap(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got === expect)
  }

  test("embed_centroid_distances: exact integer centroid geometry") {
    val emb = graft.core.Catalog.embeddings(spark, Sf0001).collect()
      .map(r => (r.getInt(2), r.getSeq[Float](1).map(v =>
        math.floor(v.toDouble * 1e6 + 0.5).toLong).toArray))
    val cents = emb.groupBy(_._1).map { case (l, xs) =>
      val dims = xs.head._2.length
      l -> Array.tabulate(dims) { i =>
        math.floor(xs.map(_._2(i)).sum.toDouble / xs.length + 0.5).toLong
      }
    }
    val labels = cents.keys.toSeq.sorted
    val expect = (for {
      a <- labels; b <- labels if a < b
      d2 = cents(a).zip(cents(b)).map { case (x, y) =>
        (x - y) * (x - y)
      }.sum
    } yield (a, b) -> BigDecimal(math.sqrt(d2.toDouble) / 1e6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
    val got = VectorOps.embedCentroidDistances(spark, Sf0001).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got.keySet === expect.keySet)
    got.foreach { case (k, d) => assert((d - expect(k)).abs <= 1e-6, s"dist $k") }
    // distances are positive: no two class centroids coincide in the fixture
    assert(got.values.forall(_ > 0))
  }

  test("bigram_logprob: per-source NLL replays the string-bigram LM") {
    val docs = graft.core.Catalog.documents(spark, Sf0001)
      .selectExpr("doc_id", "source", "lower(trim(text)) as t").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split("\\s+").filter(_.nonEmpty).toSeq))
    val perDoc = docs.collect { case (id, src, ws) if ws.size >= 2 =>
      (id, src, ws.zip(ws.drop(1)).groupBy(identity)
        .map { case (bg, xs) => bg -> xs.size.toLong })
    }
    val corpus = perDoc.flatMap(_._3).groupBy(_._1)
      .map { case (bg, xs) => bg -> xs.map(_._2).sum }
    val n = corpus.values.sum.toDouble
    val expect = perDoc.groupBy(_._2).map { case (src, ds) =>
      val nllus = ds.map { case (_, _, counts) =>
        val tot = counts.values.sum
        val s = counts.map { case (bg, c) =>
          c * -math.log(corpus(bg) * 1.0 / n)
        }.sum
        BigDecimal(s / tot * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }
      src -> (ds.size.toLong,
        BigDecimal(nllus.sum / (ds.size * 1e6))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = TextOps.bigramLogprob(spark, Sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet === expect.keySet)
    got.foreach { case (src, (nd, nll)) =>
      assert(nd === expect(src)._1, s"n_docs for $src")
      assert((nll - expect(src)._2).abs <= 2e-6, s"avg_nll for $src")
    }
  }

  test("dedup_incremental agrees with the full LSH face on the batch split") {
    // the new-batch flag: md5 bucket of doc_id (4 hex digits mod 10) >= 8
    val isNew = graft.core.Catalog.documents(spark, Sf0001)
      .selectExpr("doc_id",
        "(CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS LONG) % 10 >= 8) AS nw")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val full = TextOps.dedupMinhashLsh(spark, Sf0001, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // expected rejections from the full verified pair set: the new (or
    // larger-id when both new) member of every pair with a new member
    val expectRejected = full.flatMap { case (a, b) =>
      (isNew(a), isNew(b)) match {
        case (true, true)   => Some(math.max(a, b))
        case (false, true)  => Some(b)
        case (true, false)  => Some(a)
        case (false, false) => None
      }
    }.toSet
    val got = TextOps.dedupIncremental(spark, Sf0001, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSet === expectRejected)
    assert(expectRejected.nonEmpty)
    got.foreach { case (id, dupOf, jac) =>
      assert(isNew(id), s"rejected doc $id is not in the new batch")
      assert(!isNew(dupOf) || dupOf < id,
        s"incumbent $dupOf of $id is neither indexed nor earlier-batch")
      assert(jac >= 0.9 && jac <= 1.0)
    }
    // stats reconcile: per-source rejected counts sum to the verdict rows
    val stats = TextOps.dedupIncrementalStats(spark, Sf0001, 0.9).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(stats.map(_._3).sum === got.length.toLong)
    assert(stats.map(_._2).sum === isNew.count(_._2).toLong)
  }

  test("pack_sequences_bpe packs exactly the bpe_apply lengths") {
    val lens = TextOps.bpeApply(spark, Sf0001, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val packed = TextOps.packSequencesBpe(spark, Sf0001, 2048, 8, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // every document is packed exactly once, and token mass is conserved
    assert(packed.map(_._3).sum === lens.size.toLong)
    assert(packed.map(_._4).sum === lens.values.sum)
    // per-shard seqs are contiguous from 0 (concat-and-split numbering)
    packed.groupBy(_._1).foreach { case (shard, rows) =>
      val seqs = rows.map(_._2).sorted.toSeq
      assert(seqs === (0L until seqs.length.toLong).toSeq,
        s"shard $shard seq numbering")
    }
    // BPE lengths differ from the regex proxy, so the two packers must
    // genuinely disagree somewhere on this corpus
    val proxy = TextOps.packSequences(spark, Sf0001, 2048, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(proxy.map(_._4).sum !== packed.map(_._4).sum)
    // the utilization rollup reconciles: same shard token mass, and
    // ceil-chunks never undercounts the packer's seq groups (a chunk
    // holding only a spilled tail has no doc START, so >= not ==)
    val eff = TextOps.packEfficiencyBpe(spark, Sf0001, 2048, 8, 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    packed.groupBy(_._1).foreach { case (shard, rows) =>
      assert(eff(shard)._1 === rows.map(_._4).sum, s"shard $shard mass")
      assert(eff(shard)._2 >= rows.map(_._2).max + 1, s"shard $shard chunks")
    }
  }

  test("embed_dedup_incremental agrees with the full neardup face") {
    val isNew = graft.core.Catalog.embeddings(spark, Sf0001)
      .selectExpr("vec_id",
        "(CAST(conv(substring(md5(CAST(vec_id AS STRING)), 1, 4), 16, 10) AS LONG) % 10 >= 8) AS nw")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val full = VectorOps.embedNearDupLsh(spark, Sf0001, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expectRejected = full.flatMap { case (a, b) =>
      (isNew(a), isNew(b)) match {
        case (true, true)   => Some(math.max(a, b))
        case (false, true)  => Some(b)
        case (true, false)  => Some(a)
        case (false, false) => None
      }
    }.toSet
    val got = VectorOps.embedDedupIncremental(spark, Sf0001, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSet === expectRejected)
    assert(expectRejected.nonEmpty)
    got.foreach { case (id, dupOf, sim) =>
      assert(isNew(id))
      assert(!isNew(dupOf) || dupOf < id)
      assert(sim >= 0.4 && sim <= 1.0)
    }
  }

  test("mm_audio_rms_real frames reconcile with the decoded stream") {
    val frames = MultimodalOps.audioRmsReal(spark, Sf0001, 32).collect()
    val decoded = MultimodalOps.decodeAudioReal(spark, Sf0001).collect()
      .map(d => d.doc_id -> d.n_samples).toMap
    // per doc: frame count = ceil(n/32), sample counts sum to n, frames
    // are full except the tail, every energy is a positive sum of squares
    frames.groupBy(_.doc_id).foreach { case (id, fs) =>
      val n = decoded(id)
      assert(fs.length.toLong === (n + 31) / 32, s"doc $id frame count")
      assert(fs.map(_.n).sum === n, s"doc $id sample mass")
      val sorted = fs.sortBy(_.frame)
      assert(sorted.init.forall(_.n == 32L), s"doc $id non-tail frames")
      assert(sorted.map(_.frame).toSeq ===
        (0L until sorted.length.toLong).toSeq)
      assert(fs.forall(_.energy > 0L))
    }
  }

  test("mm_audio_zcr_real counts sign changes of the decoded samples") {
    val frames = MultimodalOps.audioZcrReal(spark, Sf0001, 32).collect()
    // brute replay: synthesize the same PCM stream per doc and count
    // in-frame sign changes directly — agreement with the operator
    // proves the real WAV roundtrip reproduced every sample's sign
    val docs = graft.core.Catalog.documents(spark, Sf0001)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = docs.flatMap { case (id, nChars) =>
      val n = (64 + nChars % 256).toInt
      val s = (0 until n).map(i => ((id * 31 + i.toLong * 131) % 65536) - 32768)
      (0 until (n + 31) / 32).map { fi =>
        val start = fi * 32
        val end = math.min(n, start + 32)
        val c = (start + 1 until end)
          .count(i => (s(i) < 0) != (s(i - 1) < 0)).toLong
        ((id, fi.toLong), (math.max(end - start - 1, 0).toLong, c))
      }
    }.toMap
    assert(frames.length === expected.size)
    frames.foreach { f =>
      val (np, c) = expected((f.doc_id, f.frame))
      assert(f.n_pairs === np && f.crossings === c,
        s"doc ${f.doc_id} frame ${f.frame}")
    }
    // the alternating synthesis signal crosses zero in most frames —
    // non-vacuous both ways
    assert(frames.exists(_.crossings > 0))
    assert(frames.forall(f => f.crossings <= f.n_pairs))
  }

  test("shardAssign partitions the corpus into balanced stable shards") {
    val rows = TextOps.shardAssign(spark, Sf0001, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = graft.core.Catalog.documents(spark, Sf0001).count()
    assert(rows.map(_._1).toSeq === (0L until 8L).toSeq)
    assert(rows.map(_._2).sum === total)
    // md5 balance: no shard more than 2x the mean (a content-derived
    // or sequential key would skew far worse)
    val mean = total.toDouble / 8
    rows.foreach { case (sh, n, chars, srcs) =>
      assert(n < 2 * mean, s"shard $sh holds $n of $total")
      assert(chars > 0 && srcs > 0)
    }
  }

  test("contamination_para replays a driver-side shared-segment recount") {
    val rows = graft.core.Catalog.documents(spark, Sf0001)
      .selectExpr("doc_id", "source",
        "regexp_replace(lower(trim(text)), '\\\\s+', ' ') AS t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val segs = rows.flatMap { case (id, src, t) =>
      val w = t.split(" ", -1)
      (0 until (w.length + 9) / 10)
        .map(i => (id, src, w.slice(i * 10, i * 10 + 10).mkString(" ")))
        .distinct
    }
    val bench = Set("src12", "src18")
    val benchSegs = segs.collect { case (_, s, t) if bench(s) => t }.toSet
    val expect = segs.filter(x => !bench(x._2))
      .filter(x => benchSegs(x._3))
      .groupBy(_._1).map { case (id, xs) => id -> xs.size.toLong }
    val got = TextOps.contaminationPara(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === expect)
    assert(got.nonEmpty, "planted cross-source dups must flag something")
  }

  test("embed_dedup_incremental_stats reconciles with the verdict rows") {
    val labels = graft.core.Catalog.embeddings(spark, Sf0001)
      .selectExpr("vec_id", "label",
        "(CAST(conv(substring(md5(CAST(vec_id AS STRING)), 1, 4), 16, 10) AS LONG) % 10 >= 8) AS nw")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    val rejected = VectorOps.embedDedupIncremental(spark, Sf0001, 0.4)
      .collect().map(_.getLong(0)).toSet
    val expect = labels.filter(_._3).groupBy(_._2).map { case (l, xs) =>
      l -> ((xs.size.toLong, xs.count(x => rejected(x._1)).toLong))
    }
    val got = VectorOps.embedDedupIncrementalStats(spark, Sf0001, 0.4)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got === expect)
    assert(got.values.map(_._2).sum === rejected.size.toLong)
  }

  test("batch_vocab_drift replays a driver-side OOV recount") {
    val rows = graft.core.Catalog.documents(spark, Sf0001)
      .selectExpr("doc_id", "source",
        "(CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS LONG) % 10 >= 8) AS nw",
        "regexp_replace(lower(trim(text)), '\\\\s+', ' ') AS t")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2),
        r.getString(3).split(" ", -1).toSeq))
    val indexedVocab = rows.filter(!_._3).flatMap(_._4).toSet
    val expect = rows.filter(_._3).groupBy(_._2).map { case (src, ds) =>
      val toks = ds.flatMap(_._4)
      val oov = toks.filterNot(indexedVocab)
      src -> ((toks.size.toLong, toks.distinct.size.toLong,
        oov.size.toLong, oov.distinct.size.toLong))
    }
    val got = TextOps.batchVocabDrift(spark, Sf0001).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === expect)
    // the shared vocabulary is tiny, so drift exists but is small
    assert(got.values.map(_._1).sum > 0)
  }

  test("para_dedup_apply replays the first-occurrence keep exactly") {
    // driver-side re-segmentation: non-overlapping 10-word windows over
    // the normalized text, tail kept — the op's documented paragraph unit
    val segs = graft.core.Catalog.documents(spark, Sf0001)
      .selectExpr("doc_id", "regexp_replace(lower(trim(text)), '\\\\s+', ' ') as t")
      .collect()
      .flatMap { r =>
        val id = r.getLong(0)
        r.getString(1).split(" ", -1).grouped(10).zipWithIndex
          .map { case (w, i) => (id, i, w.mkString(" ")) }
      }
    // valuesIterator, not Map.map: a tuple-producing lambda over a Map
    // would rebuild a Map and collapse winners that share a doc_id
    val winner = segs.groupBy(_._3).valuesIterator.map { xs =>
      xs.map { case (d, s, _) => (d, s) }.min
    }.toSet
    val expect = segs.groupBy(_._1).map { case (id, xs) =>
      id -> ((xs.size.toLong,
        xs.count { case (d, s, _) => winner((d, s)) }.toLong))
    }
    val got = TextOps.paraDedupApply(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(got === expect)
    // every doc survives as a row; planted duplicates mean SOME segment
    // instances lose (kept < total), but each distinct text keeps one
    val (tot, kept) = (got.values.map(_._1).sum, got.values.map(_._2).sum)
    assert(kept < tot && kept === winner.size)
  }

  test("para_dedup_incremental replays a driver-side first-seen recount") {
    val isNew = graft.core.Catalog.documents(spark, Sf0001)
      .selectExpr("doc_id",
        "(CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS LONG) % 10 >= 8) AS nw")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val segs = graft.core.Catalog.documents(spark, Sf0001)
      .selectExpr("doc_id", "regexp_replace(lower(trim(text)), '\\\\s+', ' ') AS t")
      .collect().flatMap { r =>
        val id = r.getLong(0)
        val w = r.getString(1).split(" ", -1)
        (0 until (w.length + 9) / 10).map(i =>
          (id, w.slice(i * 10, i * 10 + 10).mkString(" ")))
      }
    val inIndex = segs.collect { case (d, t) if !isNew(d) => t }.toSet
    val firstNew = segs.filter(s => isNew(s._1)).groupBy(_._2)
      .map { case (t, xs) => t -> xs.map(_._1).min }
    val expect = segs.filter(s => isNew(s._1)).groupBy(_._1)
      .map { case (id, xs) =>
        id -> ((xs.size.toLong, xs.count { case (_, t) =>
          inIndex(t) || firstNew(t) < id }.toLong))
      }
    val got = TextOps.paraDedupIncremental(spark, Sf0001, 0.5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === expect)
    // the fixture's planted dups put some re-crawl mass in the batch
    assert(got.values.map(_._2).sum > 0)
  }

  test("bpe_fertility reconciles with the bpe_apply per-doc ledger") {
    val src = graft.core.Catalog.documents(spark, Sf0001)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val apply = TextOps.bpeApply(spark, Sf0001, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = apply.groupBy(t => src(t._1)).map { case (s, xs) =>
      s -> ((xs.size.toLong, xs.map(_._2).sum, xs.map(_._3).sum))
    }
    val got = TextOps.bpeFertility(spark, Sf0001, 3).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expect)
    // 3 merge rounds leave most words character-split: fertility > 1
    got.keys.foreach { s =>
      val (_, w, b) = got(s); assert(b > w, s"fertility at source $s") }
  }

  test("para_dup_stats: duplicated mass is positive and bounded per source") {
    val rows = TextOps.paraDupStats(spark, Sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val srcs = graft.core.Catalog.documents(spark, Sf0001)
      .select("source").distinct.collect().map(_.getString(0)).toSet
    assert(rows.keySet === srcs)
    rows.values.foreach { case (t, d) => assert(t > 0 && d >= 0 && d <= t) }
    // the fixture plants exact dups, so duplicated paragraphs exist
    assert(rows.values.map(_._2).sum > 0)
  }

  test("para_dup_top returns df-descending duplicated paragraph texts") {
    val rows = TextOps.paraDupTop(spark, Sf0001, 15).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.nonEmpty && rows.length <= 15)
    assert(rows.forall(_._1 >= 2))
    assert(rows.map(_._1).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    // each listed paragraph is at most the window width
    assert(rows.forall(_._2.split(" ", -1).length <= 10))
  }

  test("sketchCmsTopk: estimate >= exact, and exact matches topTerms") {
    // width 16 < the fixture's 31-token vocabulary: collisions certain,
    // the overcount path is LIVE
    val rows = TextOps.sketchCmsTopk(spark, Sf0001, 4, 16, 20).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 20)
    // the count-min one-sided guarantee: never an undercount
    rows.foreach { case (tok, exact, est, over) =>
      assert(est >= exact, tok)
      assert(over === est - exact, tok)
    }
    // the probe set IS the exact top-20 (same ordering contract)
    val top = TextOps.topTerms(spark, Sf0001, 20).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.map(r => (r._1, r._2)).toSeq === top.toSeq)
    assert(rows.exists(_._4 > 0))
    // width 512 >> vocab: every cell is exclusive, estimates are EXACT —
    // the other side of the accuracy contract (ε shrinks with width)
    val wide = TextOps.sketchCmsTopk(spark, Sf0001, 4, 512, 20).collect()
    wide.foreach(r => assert(r.getLong(2) === r.getLong(1), r.getString(0)))
  }

  test("contaminationBloom never false-negatives and flags every " +
      "exactly-contaminated doc") {
    val rows = TextOps.contaminationBloom(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (doc, n, flagged, exact, fp) =>
      assert(flagged >= exact, s"doc $doc: bloom false negative")
      assert(flagged <= n && fp === flagged - exact, s"doc $doc")
    }
    // both paths are live on the fixture: true contamination is caught
    // and the 8192-slot filter produces some false positives
    assert(rows.exists(_._4 > 0))
    assert(rows.exists(_._5 > 0))
    // exact cross-check: per-doc shared-shingle counts vs an independent
    // join on the raw shingle table
    val docsMeta = graft.core.Catalog.documents(spark, Sf0001)
      .select("doc_id", "source")
    val sh = TextOps.shingles(spark, Sf0001).join(docsMeta, "doc_id")
    val isBench = col("source").isin("src12", "src18")
    val bench = sh.where(isBench).select("s").distinct()
    val expected = sh.where(!isBench).select("doc_id", "s")
      .join(bench, Seq("s"))
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = rows.map(r => r._1 -> r._4).toMap
    expected.foreach { case (doc, n) =>
      assert(got.getOrElse(doc, 0L) === n, s"doc $doc exact count")
    }
  }

  // ———————— round-17 wave 2: streaming replays + KMV sketches ————————

  private def md5hexOf(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** First 10 md5 hex digits as a 40-bit long — the engine's
    * `conv(substring(md5(x), 1, 10), 16, 10)` decode. */
  private def hash40(s: String): Long =
    java.lang.Long.parseLong(md5hexOf(s).substring(0, 10), 16)

  private def rawEvents(): Array[(Long, String, Long, Long)] =
    graft.core.Catalog.events(spark, Sf0001)
      .where(col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"),
        expr("ts div 1000000000").as("s"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

  /** The earliest-anchored greedy chain, brute-forced: event_id -> admitted. */
  private def greedyChain(ev: Array[(Long, String, Long, Long)],
                          horizon: Long): Map[Long, Boolean] =
    ev.groupBy(e => (e._1, e._2)).flatMap { case (_, occ) =>
      var last = Long.MinValue / 4
      occ.sortBy(e => (e._3, e._4)).map { e =>
        val adm = e._3 > last + horizon
        if (adm) last = e._3
        e._4 -> adm
      }
    }

  test("streamDedupReplay: verdicts replay the brute-force greedy chain; " +
      "drops, first admissions and re-admissions all live") {
    val H = 172800L
    val got = EventOps.streamDedupReplay(spark, Sf0001, H).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    val ev = rawEvents()
    val expected = greedyChain(ev, H)
    assert(got.length === ev.length)
    got.foreach { case (_, _, _, id, adm) =>
      assert(adm === expected(id), s"event $id") }
    // per-key firsts are always admitted; both branches live; at least
    // one RE-admission (an admitted occurrence that is not its key's
    // first — the watermark-eviction path the streaming op state-churns)
    val firsts = ev.groupBy(e => (e._1, e._2)).values
      .map(_.minBy(e => (e._3, e._4))._4).toSet
    firsts.foreach(id => assert(expected(id), s"first $id must admit"))
    assert(got.exists(!_._5))
    assert(got.exists(r => r._5 && !firsts(r._4)))
    // chain invariant: admitted occurrences of one key are > H apart
    got.filter(_._5).groupBy(r => (r._1, r._2)).values.foreach { adm =>
      val ss = adm.map(_._3).sorted
      ss.zip(ss.tail).foreach { case (a, b) => assert(b - a > H) }
    }
  }

  test("streamDedupReplayDf: random streams (seeded) replay the greedy " +
      "chain — clustered gaps straddle the horizon") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val h = 100L
    // 60 random keys, 1-40 occurrences each; gaps drawn tight around the
    // horizon (0..250 vs h=100) so admissions, drops, chained anchors
    // and exact-boundary gaps (s == last + h must DROP: strict >) all
    // occur; duplicate timestamps within a key exercise the
    // (s, event_id) tiebreak
    var eid = 0L
    val rows = (1L to 60L).flatMap { key =>
      var t = rnd.nextInt(1000).toLong
      (0 until 1 + rnd.nextInt(40)).flatMap { _ =>
        t += (if (rnd.nextInt(5) == 0) h else rnd.nextInt(250).toLong)
        val copies = 1 + rnd.nextInt(2) // occasional equal-ts pair
        (0 until copies).map { _ =>
          eid += 1
          (key, if (key % 2 == 0) "a" else "b", t, eid)
        }
      }
    }
    val got = EventOps.streamDedupReplayDf(
        rows.toDF("user_id", "event_type", "s", "event_id"), h)
      .collect()
      .map(r => (r.getLong(3), r.getBoolean(4))).toMap
    val expected = rows.groupBy(e => (e._1, e._2)).flatMap { case (_, occ) =>
      var last = Long.MinValue / 4
      occ.sortBy(e => (e._3, e._4)).map { e =>
        val adm = e._3 > last + h
        if (adm) last = e._3
        e._4 -> adm
      }
    }
    assert(got.size === rows.size)
    assert(got === expected)
    // the tight-gap regimes really occurred
    assert(got.values.exists(identity) && got.values.exists(!_))
  }

  test("streamAdmissionReplay: index anti-join + chain replay; both " +
      "index branches live") {
    val (h, idxDays) = (172800L, 3)
    val got = EventOps.streamAdmissionReplay(spark, Sf0001, h, idxDays)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5)))
    val ev = rawEvents()
    val cut = ev.map(_._3 / 86400).min + idxDays
    val index = ev.filter(_._3 / 86400 < cut).map(e => (e._1, e._2)).toSet
    val stream = ev.filter(_._3 / 86400 >= cut)
    val chain = greedyChain(stream, h)
    assert(got.length === stream.length)
    got.foreach { case (u, t, _, id, inIdx, adm) =>
      assert(inIdx === index((u, t)), s"event $id in_index")
      assert(adm === (!index((u, t)) && chain(id)), s"event $id admitted")
    }
    assert(got.exists(_._5) && got.exists(!_._5))
    assert(got.exists(_._6) && got.exists(!_._6))
  }

  test("streamLateEvents: lateness replays the running-max watermark " +
      "under the md5 disorder; both branches live, disorder-bounded") {
    val (dis, delay) = (172800L, 86400L)
    val got = EventOps.streamLateEvents(spark, Sf0001, dis, delay).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    val ev = graft.core.Catalog.events(spark, Sf0001)
      .select(col("event_id"), expr("ts div 1000000000").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val arrivals = ev.map { case (id, s) =>
      (id, s, s + hash40(id.toString) % (2 * dis) - dis)
    }.sortBy(a => (a._3, a._1))
    var wm = Long.MinValue
    val expected = arrivals.map { case (id, s, arr) =>
      val lateBy = if (wm == Long.MinValue) 0L
        else math.max(0L, wm - delay - s)
      wm = math.max(wm, s)
      (id, s, arr, lateBy)
    }
    assert(got.length === ev.length)
    got.zip(expected).foreach { case ((gid, gs, garr, glate, gflag), e) =>
      assert((gid, gs, garr, glate) === e)
      assert(gflag === (glate > 0))
      assert(glate <= 2 * dis) // disorder bound: lateness can't exceed it
    }
    assert(got.exists(_._5) && got.exists(!_._5))
  }

  test("streamRateLimitReplay: milli-token balances replay the exact " +
      "integer bucket; bursts rejected, refills re-admit") {
    val (cap, refill) = (2000L, 86400L)
    val got = EventOps.streamRateLimitReplay(spark, Sf0001, 2, refill)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    val ev = rawEvents()
    val expected = ev.groupBy(e => (e._1, e._2)).toSeq
      .flatMap { case (_, occ) =>
        var (last, tok) = (-1L, cap)
        occ.sortBy(e => (e._3, e._4)).map { e =>
          val refilled = math.min(cap, tok + (e._3 - last) * 1000 / refill)
          val adm = refilled >= 1000
          tok = if (adm) refilled - 1000 else refilled
          last = e._3
          e._4 -> ((tok, adm))
        }
      }.toMap
    assert(got.length === ev.length)
    got.foreach { case (_, _, _, id, tok, adm) =>
      assert((tok, adm) === expected(id), s"event $id") }
    // both verdicts live; a rejected event exists with a later
    // admission for the same key (the refill path, not just exhaustion)
    assert(got.exists(_._6) && got.exists(!_._6))
    val readmitAfterReject = got.groupBy(r => (r._1, r._2)).values.exists {
      rows =>
        val sorted = rows.sortBy(r => (r._3, r._4))
        sorted.zipWithIndex.exists { case (r, i) =>
          !r._6 && sorted.drop(i + 1).exists(_._6) }
    }
    assert(readmitAfterReject)
    // balance invariant: always within [0, cap - 1000] after an
    // admission, [0, cap) after a rejection... and never negative
    got.foreach { case (_, _, _, _, tok, adm) =>
      assert(tok >= 0 && tok <= (if (adm) cap - 1000 else cap)) }
  }

  test("streamBacklogReplay: the Lindley recursion replays over the " +
      "global window grid; backlogged and drained windows both live") {
    val w = 21600L
    val got = EventOps.streamBacklogReplay(spark, Sf0001, w).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val ev = rawEvents().map(e => (e._2, e._3 / w))
    val (w0, w1) = (ev.map(_._2).min, ev.map(_._2).max)
    val nW = w1 - w0 + 1
    val types = ev.map(_._1).distinct.sorted
    val arr = ev.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = types.flatMap { t =>
      val c = (ev.count(_._1 == t) + nW - 1) / nW
      var bl = 0L
      (w0 to w1).map { wi =>
        val a = arr.getOrElse((t, wi), 0L)
        bl = math.max(0L, bl + a - c)
        (t, wi * w, a, c, bl)
      }
    }
    assert(got.toSeq === expected)
    // grid completeness: every type covers every window exactly once
    assert(got.length === (types.length * nW).toInt)
    assert(got.exists(_._5 > 0) && got.exists(_._5 === 0L))
    // conservation lower bound: the final backlog can never be less
    // than total arrivals minus total possible service (Lindley's
    // recursion only ever clips UP to zero)
    types.foreach { t =>
      val rows = got.filter(_._1 == t).sortBy(_._2)
      val c = rows.head._4
      assert(rows.last._5 >= rows.map(_._3).sum - c * nW)
      // capacity really is ceil(mean): one window's service covers the
      // mean load, so c*nW >= total arrivals > (c-1)*nW
      assert(c * nW >= rows.map(_._3).sum && rows.map(_._3).sum > (c - 1) * nW)
    }
  }

  test("sketchKmvDistinct: bottom-k replays the md5 order statistics; " +
      "the __all__ union equals the merge of the per-type samples") {
    val k = 8
    val got = EventOps.sketchKmvDistinct(spark, Sf0001, k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val du = rawEvents().map(e => (e._2, e._1)).distinct
    val groups = du.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct).toMap +
      ("__all__" -> du.map(_._2).distinct)
    val expected = groups.toSeq.flatMap { case (t, users) =>
      users.map(u => (u, hash40(u.toString))).sortBy(p => (p._2, p._1))
        .take(k).zipWithIndex
        .map { case ((_, h), i) => (t, i + 1L, h, users.length.toLong) }
    }.toSet
    assert(got.toSet === expected)
    // mergeability: bottom-k of the UNIONED per-type samples is exactly
    // the __all__ sketch (any corpus-wide minimum is also a minimum of
    // its own type's sample) — the property that lets shards merge
    val merged = got.filter(_._1 != "__all__").map(_._3).distinct
      .sorted.take(k).toSeq
    assert(merged === got.filter(_._1 == "__all__").sortBy(_._2).map(_._3)
      .toSeq)
    // consumer-side estimate sanity: (k-1) / (kth / 2^40) lands within
    // a factor 3 of exact at k=8 (the statistic itself is exact-compared)
    got.groupBy(_._1).foreach { case (t, rows) =>
      val kth = rows.maxBy(_._2)._3.toDouble / math.pow(2.0, 40)
      val est = (k - 1) / kth
      val exact = rows.head._4.toDouble
      assert(est > exact / 3 && est < exact * 3, s"$t: est $est vs $exact")
    }
  }

  test("sketchAmsF2: signed sums replay the md5-parity signs; the " +
      "mean-of-squares estimate lands within factor 3 of exact F2") {
    val rows = 8
    val got = EventOps.sketchAmsF2(spark, Sf0001, rows).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val counts = rawEvents().groupBy(e => (e._2, e._1)).view
      .mapValues(_.length.toLong).toMap
    def sgn(u: Long, j: Int): Long =
      1L - 2L * (Integer.parseInt(md5hexOf(u.toString)
        .charAt(j - 1).toString, 16) % 2)
    val types = counts.keys.map(_._1).toSeq.distinct.sorted
    val expected = (for {
      t <- types; j <- 1 to rows
      sj = counts.collect { case ((tt, u), c) if tt == t =>
        sgn(u, j) * c }.sum
      f2 = counts.collect { case ((tt, _), c) if tt == t => c * c }.sum
    } yield (t, j.toLong, sj, f2)).toSet
    assert(got.toSet === expected)
    assert(got.length === types.length * rows)
    // estimator sanity: E[S_j^2] = F2; mean over 8 rows within factor 3
    got.groupBy(_._1).foreach { case (t, rs) =>
      val est = rs.map(r => r._3.toDouble * r._3).sum / rs.length
      val exact = rs.head._4.toDouble
      assert(est > exact / 3 && est < exact * 3, s"$t: $est vs $exact")
    }
  }

  test("sketchAmsJoin: per-row products replay brute-force; the join-size " +
      "estimate lands within factor 3 of the exact inner product") {
    val rows = 8
    val got = EventOps.sketchAmsJoin(spark, Sf0001, rows).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val counts = rawEvents().groupBy(e => (e._2, e._1)).view
      .mapValues(_.length.toLong).toMap
    def sgn(u: Long, j: Int): Long =
      1L - 2L * (Integer.parseInt(md5hexOf(u.toString)
        .charAt(j - 1).toString, 16) % 2)
    val types = counts.keys.map(_._1).toSeq.distinct.sorted
    def sj(t: String, j: Int): Long =
      counts.collect { case ((tt, u), c) if tt == t => sgn(u, j) * c }.sum
    val users = counts.keys.map(_._2).toSeq.distinct
    val expected = (for {
      a <- types; b <- types if a < b; j <- 1 to rows
      dot = sj(a, j) * sj(b, j)
      exact = users.map(u => counts.getOrElse((a, u), 0L) *
        counts.getOrElse((b, u), 0L)).sum
    } yield (a, b, j.toLong, dot, exact)).toSet
    assert(got.toSet === expected)
    assert(got.length === types.length * (types.length - 1) / 2 * rows)
    got.groupBy(r => (r._1, r._2)).foreach { case (p, rs) =>
      val est = rs.map(_._4.toDouble).sum / rs.length
      val exact = rs.head._5.toDouble
      assert(est > exact / 3 && est < exact * 3, s"$p: $est vs $exact")
    }
  }

  test("sketchKmvSetops: theta and common-below-theta replay brute-force; " +
      "estimates bracket the exact intersections") {
    val k = 8
    val got = EventOps.sketchKmvSetops(spark, Sf0001, k).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val du = rawEvents().map(e => (e._2, e._1)).distinct
    val types = du.map(_._1).distinct.sorted
    val samples = types.map { t =>
      t -> du.filter(_._1 == t).map(_._2).distinct
        .map(u => hash40(u.toString)).sorted.take(k)
    }.toMap
    val expected = (for {
      a <- types; b <- types if a < b
      theta = math.min(samples(a).max, samples(b).max)
      common = samples(a).toSet.intersect(samples(b).toSet)
        .count(_ < theta).toLong
      exact = du.filter(_._1 == a).map(_._2)
        .intersect(du.filter(_._1 == b).map(_._2)).distinct.length.toLong
    } yield (a, b, theta, common, exact)).toSet
    assert(got.toSet === expected)
    assert(got.length === types.length * (types.length - 1) / 2)
    // each sample holds at most k-1 hashes strictly below its own theta
    got.foreach { case (_, _, _, common, _) => assert(common <= k - 1) }
    // consumer-side estimate sanity where the sample evidence is strong
    got.filter(_._4 >= 4).foreach { case (a, b, theta, common, exact) =>
      val est = common / (theta.toDouble / math.pow(2.0, 40))
      assert(est > exact / 4 && est < exact * 4, s"$a-$b: $est vs $exact")
    }
  }

  test("sketchCountSketch: signed-cell median replays brute force, wide " +
      "width is exact, error is two-sided") {
    val rows = TextOps.sketchCountSketch(spark, Sf0001, 5, 16, 20).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 20)
    rows.foreach { case (t, ex, est, err) => assert(err === est - ex, t) }
    // the probe set IS the exact top-20 (the CMS ordering contract)
    val top = TextOps.topTerms(spark, Sf0001, 20).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.map(r => (r._1, r._2)).toSeq === top.toSeq)
    // brute-force replay: signed cells from one digest per token (6-hex
    // slices: bucket = slice mod width, sign = slice's top bit), then
    // the exact integer median of the 5 signed row reads
    val tc = TextOps.wordCounts(spark, Sf0001)
      .groupBy("tok").agg(sum("c").as("cnt")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def sliceOf(hx: String, j: Int): Long =
      java.lang.Long.parseLong(hx.substring(6 * j, 6 * j + 6), 16)
    def signOf(hx: String, j: Int): Long =
      if (Integer.parseInt(hx.charAt(6 * j).toString, 16) >= 8) 1L else -1L
    val cells = scala.collection.mutable.Map.empty[(Int, Long), Long]
    for ((t, c) <- tc; j <- 0 until 5) {
      val hx = md5hexOf(t)
      val key = (j, sliceOf(hx, j) % 16)
      cells(key) = cells.getOrElse(key, 0L) + signOf(hx, j) * c
    }
    rows.foreach { case (t, _, est, _) =>
      val hx = md5hexOf(t)
      val ests = (0 until 5).map(j =>
        signOf(hx, j) * cells((j, sliceOf(hx, j) % 16))).sorted
      assert(est === ests(2), t)
    }
    // two-sided at width 16 (31 tokens in 16 buckets): collisions are
    // live and signed cancellation makes UNDER-counts possible — the
    // contract difference from count-min's one-sided overcount
    assert(rows.exists(_._4 != 0L))
    // width 4096 >> vocab: all 5 rows exclusive, the median is exact
    val wide = TextOps.sketchCountSketch(spark, Sf0001, 5, 4096, 20)
      .collect()
    wide.foreach(r => assert(r.getLong(2) === r.getLong(1), r.getString(0)))
  }

  test("mixTemperature: quotas replay integer brute force and the " +
      "tempered mix is flatter than the raw one") {
    val rows = TextOps.mixTemperature(spark, Sf0001, 1000000L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val docs = graft.core.Catalog.documents(spark, Sf0001)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).length.toLong))
    val bySrc = docs.groupBy(_._1).view
      .mapValues(ts => (ts.length.toLong, ts.map(_._2).sum)).toMap
    val totTok = bySrc.values.map(_._2).sum
    def tw(n: Long): Long = math.floor(math.sqrt(n.toDouble)).toLong
    val totW = bySrc.values.map(v => tw(v._2)).sum
    assert(rows.map(_._1).toSet === bySrc.keySet)
    rows.foreach { case (s, nd, nt, w, rq, tq) =>
      assert((nd, nt) === bySrc(s), s)
      assert(w === tw(nt), s)
      assert(w * w <= nt && (w + 1) * (w + 1) > nt, s) // integer sqrt
      assert(rq === nt * 1000000L / totTok, s)
      assert(tq === w * 1000000L / totW, s)
    }
    // flattening: the biggest source is tempered DOWN, the smallest UP,
    // and ordering is preserved (sqrt is monotone)
    val big = rows.maxBy(_._3); val small = rows.minBy(_._3)
    assert(big._6 <= big._5)
    assert(small._6 >= small._5)
    for (a <- rows; b <- rows if a._3 < b._3) assert(a._4 <= b._4)
  }

  test("sampleWeighted: priorities replay BIGINT brute force, tau is " +
      "the (k+1)-th, k >= corpus keeps all with tau 0") {
    val docs = graft.core.Catalog.documents(spark, Sf0001)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def prio(id: Long, w: Long): Long = {
      val u = java.lang.Long.parseLong(
        md5hexOf(id.toString).substring(0, 8), 16)
      (w * 4294967296L) / (u + 1)
    }
    val ranked = docs.map { case (id, w) => (id, w, prio(id, w)) }
      .sortBy { case (id, _, p) => (-p, id) }
    val got = TextOps.sampleWeighted(spark, Sf0001, 64).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.length === 64 && docs.length > 65)
    val expTau = ranked(64)._3
    got.zip(ranked.take(64)).zipWithIndex.foreach {
      case (((rnk, id, w, p, tau), (eid, ew, ep)), i) =>
        assert(rnk === i + 1 && id === eid && w === ew && p === ep &&
          tau === expTau, s"rank ${i + 1}")
    }
    // weight-proportional: the sample over-represents heavy docs
    val sampleMean = got.map(_._3).sum.toDouble / got.length
    val corpusMean = docs.map(_._2).sum.toDouble / docs.length
    assert(sampleMean > corpusMean)
    // k >= corpus: everything is kept and the threshold is 0
    val all = TextOps.sampleWeighted(spark, Sf0001, docs.length + 10)
      .collect()
    assert(all.length === docs.length)
    assert(all.forall(_.getLong(4) === 0L))
  }

  test("unigramLmScore: doc scores replay the frozen-vocab Viterbi " +
      "path costs and agree with the apply face") {
    val got = TextOps.unigramLmScore(spark, Sf0001, 24, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    got.foreach { case (d, np, snl, mnl) =>
      assert(np > 0 && snl >= 0 && mnl === snl / np, d)
    }
    // piece counts agree with the apply face row for row
    val ap = TextOps.unigramLmApply(spark, Sf0001, 24, 2).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got.map(r => (r._1, r._2)).toMap === ap)
    // brute-force: JVM Viterbi at the trained round-2 costs (smallest-
    // predecessor tie convention), doc rollup over the word counts
    val costs = TextOps.unigramLmTrain(spark, Sf0001, 24, 2)
      .where(col("rnd") === 2).select("piece", "nllu").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val wc = TextOps.wordCounts(spark, Sf0001)
      .select("doc_id", "tok", "c").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val Big = 1000000000000000L
    def vit(tok: String): (Long, Long) = {
      val n = tok.length
      val best = Array.fill(n + 1)(0L)
      val par = Array.fill(n + 1)(-1)
      for (i <- 1 to n) {
        var m = Long.MaxValue; var pj = -1
        for (j <- math.max(0, i - 4) to (i - 1)) {
          val c = best(j) + costs.getOrElse(tok.substring(j, i), Big)
          if (c < m) { m = c; pj = j }
        }
        best(i) = m; par(i) = pj
      }
      var i = n; var np = 0L
      while (i > 0) { np += 1; i = par(i) }
      (np, best(n))
    }
    val perWord = wc.map(_._2).distinct.map(t => t -> vit(t)).toMap
    val expected = wc.groupBy(_._1).view.mapValues { rows =>
      (rows.map { case (_, t, c) => c * perWord(t)._1 }.sum,
        rows.map { case (_, t, c) => c * perWord(t)._2 }.sum)
    }.toMap
    got.foreach { case (d, np, snl, _) =>
      assert((np, snl) === expected(d), d)
    }
  }

  test("annLshMultiprobeTopk: probes are a candidate superset of " +
      "single-probe on the same quarter-size index and recall recovers") {
    val multi = VectorOps.annLshMultiprobeTopk(spark, Sf0001, 0, 10, 4, 6, 64)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(multi.length === 10)
    val exact = VectorOps.cosineTopk(spark, Sf0001, 0, 10)
      .collect().map(_.getLong(0)).toSet
    val single4 = VectorOps.annLshTopk(spark, Sf0001, 0, 10, 4, 6, 64)
      .collect().map(_.getLong(0)).toSet
    val single16 = VectorOps.annLshTopk(spark, Sf0001, 0, 10, 16, 6, 64)
      .collect().map(_.getLong(0)).toSet
    val multiIds = multi.map(_._1).toSet
    def recall(ids: Set[Long]): Double =
      (ids & exact).size.toDouble / exact.size
    // probes substitute for tables: on the SAME 4-table index the
    // Hamming-1 ring can only add candidates, so recall is monotone...
    assert(recall(multiIds) >= recall(single4),
      s"multi ${recall(multiIds)} vs single4 ${recall(single4)}")
    // ...and the quarter-size multiprobe index reaches at least the
    // full 16-table single-probe recall on this fixture
    assert(recall(multiIds) >= recall(single16),
      s"multi ${recall(multiIds)} vs single16 ${recall(single16)}")
    // candidate-set superset pin (the structural claim behind the
    // recall monotonicity): single-probe candidates at (4, 6) are a
    // subset of the multiprobe candidates — the query's own bucket is
    // the flip-distance-0 probe
    val singleCand = VectorOps.lshCandidateIds(spark, Sf0001, 0, 4, 6)
      .collect().map(_.getLong(0)).toSet
    val multiCand = VectorOps
      .lshMultiprobeCandidateIds(spark, Sf0001, 0, 4, 6)
      .collect().map(_.getLong(0)).toSet
    assert(singleCand.subsetOf(multiCand))
    assert(multiCand.size > singleCand.size,
      "Hamming-1 probes add candidates on this fixture")
  }

  test("sketchDgimWindow: closed-form state equals the one-item-at-a-" +
      "time DGIM fold; window estimate within half the oldest bucket") {
    val got = EventOps.sketchDgimWindow(spark, Sf0001, 7).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8)))
    assert(got.nonEmpty)
    val ev = graft.core.Catalog.events(spark, Sf0001)
      .select("event_type", "ts", "event_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val nowTs = ev.map(_._2).max
    val t0 = nowTs - 7L * 86400L * 1000000000L
    val byType = got.groupBy(_._1)
    assert(byType.keySet === ev.map(_._1).toSet)
    byType.foreach { case (t, rows) =>
      val arr = ev.filter(_._1 == t).sortBy(e => (e._2, e._3))
      // the REAL DGIM maintenance, one arrival at a time: prepend a
      // size-1 bucket, then cascade-merge the two OLDEST same-size
      // buckets whenever a third appears (merged bucket keeps the
      // newer one's newest timestamp)
      val b = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      for ((_, ts, _) <- arr) {
        b.insert(0, (1L, ts))
        var s = 1L
        var cont = true
        while (cont) {
          val is = b.indices.filter(i => b(i)._1 == s)
          if (is.length >= 3) {
            val i2 = is(is.length - 2)
            val merged = (s * 2, b(i2)._2)
            b.remove(i2 + 1); b.remove(i2)
            b.insert(i2, merged)
            s *= 2
          } else cont = false
        }
      }
      val sim = b.toSeq.zipWithIndex.map { case ((sz, ts), i) =>
        (i + 1L, sz, ts) }
      assert(rows.sortBy(_._2).map(r => (r._2, r._3, r._4)).toSeq === sim,
        s"$t: closed form vs streaming fold")
      // mass conservation + audit columns replay
      val n = arr.length.toLong
      val exact = arr.count(_._2 > t0).toLong
      val inSizes = sim.filter(_._3 > t0).map(_._2)
      val est = inSizes.sum - inSizes.max / 2
      rows.foreach { case (_, _, _, bts, inw, nt, ws, exw, de) =>
        assert(nt === n && ws === t0 && exw === exact && de === est, t)
        assert(inw === (if (bts > t0) 1L else 0L), t)
      }
      // the DGIM guarantee: only the oldest in-window bucket straddles
      assert(math.abs(est - exact) <= inSizes.max / 2, s"$t bound")
    }
  }

  test("sketchHllSetops: union is register max, exact cardinalities " +
      "replay, inclusion-exclusion estimate lands near exact") {
    val got = EventOps.sketchHllSetops(spark, Sf0001, 6).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8), r.getLong(9), r.getLong(10)))
    assert(got.nonEmpty && got.forall(_._3 === 64L))
    got.foreach { case (a, b, _, _, ra, rb, ru, _, _, _, _) =>
      assert(ru === math.max(ra, rb), s"$a-$b")
    }
    val du = graft.core.Catalog.events(spark, Sf0001)
      .where(col("user_id").isNotNull)
      .select("event_type", "user_id").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def regRank(u: Long): (Long, Long) = {
      val hx = md5hexOf(u.toString)
      val reg = java.lang.Long.parseLong(hx.substring(0, 2), 16) % 64
      val field = hx.substring(2, 14)
      val lz = field.takeWhile(_ == '0').length
      val rank =
        if (lz == 12) 49L
        else {
          val nz = Integer.parseInt(field.charAt(lz).toString, 16)
          val extra = if (nz >= 8) 0 else if (nz >= 4) 1
            else if (nz >= 2) 2 else 3
          4L * lz + extra + 1
        }
      (reg, rank)
    }
    val types = du.map(_._1).distinct.sorted
    val sets = du.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val regs = sets.map { case (t, us) =>
      t -> us.groupBy(u => regRank(u)._1).view
        .mapValues(_.map(u => regRank(u)._2).max).toMap
    }
    val m = 64
    def est(rm: Map[Long, Long]): Double = {
      val sumPow = rm.values.map(r => math.pow(2.0, -r.toDouble)).sum +
        (m - rm.size)
      val raw = 0.709 * m * m / sumPow
      val zeros = m - rm.size
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    }
    for (a <- types; b <- types if a < b) {
      val rows = got.filter(r => r._1 == a && r._2 == b)
      assert(rows.map(_._4).toSet === (regs(a).keySet ++ regs(b).keySet),
        s"$a-$b registers")
      val inter = (sets(a) & sets(b)).size.toLong
      val union = (sets(a) | sets(b)).size.toLong
      rows.foreach { case (_, _, _, reg, ra, rb2, _, na, nb, ie, ue) =>
        assert(ra === regs(a).getOrElse(reg, 0L), s"$a-$b reg $reg a")
        assert(rb2 === regs(b).getOrElse(reg, 0L), s"$a-$b reg $reg b")
        assert(na === sets(a).size.toLong && nb === sets(b).size.toLong)
        assert(ie === inter && ue === na + nb - inter, s"$a-$b exacts")
      }
      // union registers = elementwise max -> the union estimate, and
      // inclusion-exclusion recovers the intersection within HLL noise
      val uRegs = (regs(a).keySet ++ regs(b).keySet).map(r =>
        r -> math.max(regs(a).getOrElse(r, 0L), regs(b).getOrElse(r, 0L)))
        .toMap
      val eI = est(regs(a)) + est(regs(b)) - est(uRegs)
      assert(math.abs(eI - inter) <= math.max(4.0, 0.35 * union),
        s"$a-$b: I-E $eI vs exact $inter")
    }
  }
}
