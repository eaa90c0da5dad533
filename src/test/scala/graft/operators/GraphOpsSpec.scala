package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Randomized (fixed-seed) adversarial coverage for the iterative graph
  * machinery: components must match a union-find ground truth on graphs
  * with long chains, stars, and isolated pairs — shapes where a bounded
  * or buggy propagation diverges first. */
class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.toSeq.map(k => k -> find(k)).toMap
  }

  private def components(pairs: Seq[(Long, Long)], key: String): Map[Long, Long] = {
    import spark.implicits._
    GraphOps.connectedComponents(spark,
        pairs.toDF("a", "b"), cacheKey = key)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("components == union-find on random graphs (chains, stars, noise)") {
    for (seed <- Seq(1, 7)) {
      val rnd = new scala.util.Random(seed)
      // a chain (the O(diameter) worst case — rounds, and therefore CI
      // time, scale with its length) ...
      val chainIds = rnd.shuffle((0L until 20L).toVector)
      val chain = chainIds.sliding(2).map(s => (s(0), s(1))).toSeq
      // ... a star, and random noise edges over a separate id space
      val star = (1 to 10).map(i => (1000L, 1000L + i))
      val noise = Seq.fill(40)((2000L + rnd.nextInt(30), 2000L + rnd.nextInt(30)))
        .filter(p => p._1 != p._2).map(p => (p._1.toLong, p._2.toLong))
      val pairs = rnd.shuffle(chain ++ star ++ noise)
      val got = components(pairs, s"graphspec:$seed")
      assert(got === unionFind(pairs), s"seed $seed")
      // the chain must have collapsed to ONE label: its minimum id
      assert(chainIds.map(got).distinct === Vector(chainIds.min), s"seed $seed")
    }
  }

  test("a 200-diameter chain converges inside the registered round budget") {
    // the round-4 weak mark: min-label propagation is O(diameter) rounds,
    // so a duplicate CHAIN longer than the round budget made the query
    // throw. Star contraction is O(log n) rounds independent of diameter —
    // this chain needs ~8 rounds, far inside the registered 25.
    val rnd = new scala.util.Random(13)
    val ids = rnd.shuffle((0L until 201L).toVector)
    val chain = ids.sliding(2).map(s => (s(0), s(1))).toSeq
    val got = components(rnd.shuffle(chain), "graphspec:diam200")
    assert(got.size === 201)
    assert(got.values.toSet === Set(ids.min))
  }

  test("non-convergence within the safety rail throws, never silently returns") {
    import spark.implicits._
    // a 2000-chain cannot star-contract to a fixpoint in 2 rounds
    val chain = (0L until 2000L).sliding(2).map(s => (s.head, s.last)).toSeq
    intercept[IllegalStateException] {
      GraphOps.connectedComponents(spark, chain.toDF("a", "b"),
        cacheKey = "graphspec:rail", maxIters = 2).collect()
    }
  }

  test("randomized pre-bucketed sessionize parity (gaps around the bucket edge)") {
    import spark.implicits._
    for (seed <- Seq(3, 11)) {
      val rnd = new scala.util.Random(seed)
      val base = 1704067200L
      // events clustered around midnights with gaps straddling gapSeconds
      val events = (0 until 12).flatMap { u =>
        var t = base + rnd.nextInt(7200)
        (0 until 50 + rnd.nextInt(100)).map { i =>
          t += (if (rnd.nextBoolean()) rnd.nextInt(3000) else 3601 + rnd.nextInt(90000))
          (u.toLong, t, i.toLong)
        }
      }
      val e = events.toDF("user_id", "s", "event_id")
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq
      assert(rows(EventOps.sessionizePreBucketedDf(e, 3600)) ===
        rows(EventOps.sessionizeDf(e, 3600)), s"seed $seed")
    }
  }
}
