package graft.streaming

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties pinning the space-saving invariants of
  * [[StreamOps.foldHeavyHitters]] (Metwally et al., ICDT 2005) for
  * ARBITRARY streams and arbitrary micro-batch splits — the guarantees
  * the streaming spec checks on one fixture, proven over random ones:
  *
  *   1. capacity bound: the summary never exceeds `capacity` entries;
  *   2. bracketing: for every tracked item,
  *      `count − err <= true count <= count`;
  *   3. guaranteed presence: any item with true count > N / capacity
  *      is in the summary;
  *   4. batch-split invariance of the guarantees (NOT of the exact
  *      summary — space-saving is order-sensitive by design): folding
  *      the same stream in any two-batch split still satisfies 1–3.
  */
object HeavyHittersPropSpec extends Properties("HeavyHitters") {

  private val capGen = Gen.chooseNum(1, 12)
  // skewed item ids so heavy hitters actually exist: ids drawn from a
  // small range collide often
  private val streamGen: Gen[List[Long]] =
    Gen.listOf(Gen.chooseNum(0L, 24L))

  private def checkInvariants(items: Seq[Long], cap: Int,
                              m: Map[Long, (Long, Long)]): Boolean = {
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val capOk = m.size <= cap
    val bracketOk = m.forall { case (k, (c, e)) =>
      val t = exact.getOrElse(k, 0L)
      c >= t && c - e <= t
    }
    val presenceOk = exact.forall { case (k, t) =>
      t <= items.size.toLong / cap || m.contains(k)
    }
    capOk && bracketOk && presenceOk
  }

  property("capacity, bracketing, and presence hold on one batch") =
    forAll(streamGen, capGen) { (items, cap) =>
      checkInvariants(items,
        cap, StreamOps.foldHeavyHitters(Map.empty, items, cap))
    }

  property("guarantees survive any two-batch split") =
    forAll(streamGen, capGen, Gen.chooseNum(0, 100)) { (items, cap, cut) =>
      val k = if (items.isEmpty) 0 else cut % (items.size + 1)
      val (b1, b2) = items.splitAt(k)
      val m = StreamOps.foldHeavyHitters(
        StreamOps.foldHeavyHitters(Map.empty, b1, cap), b2, cap)
      checkInvariants(items, cap, m)
    }

  property("counts are exact while the summary never filled") =
    forAll(streamGen, capGen) { (items, cap) =>
      val m = StreamOps.foldHeavyHitters(Map.empty, items, cap)
      val distinct = items.distinct.size
      distinct > cap || m.forall { case (k, (c, e)) =>
        e == 0L && c == items.count(_ == k).toLong
      }
    }
}
