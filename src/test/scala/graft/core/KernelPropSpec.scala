package graft.core

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties pinning kernel invariants (SURVEY §5.2).
  * Runs under sbt's native ScalaCheck test framework. */
object KernelPropSpec extends Properties("Kernel") {

  private val stepGen = Gen.oneOf(1L, 60L, 300L, 3600L)
  private val tsGen = Gen.chooseNum(-100000L, 100000L)
  private val pointGen: Gen[(Long, Option[Double])] = for {
    ts <- tsGen
    v <- Gen.option(Gen.chooseNum(-1e6, 1e6))
  } yield (ts, v)
  private val pointsGen = Gen.listOf(pointGen)

  property("align idempotent, floor within one step") =
    forAll(tsGen, stepGen) { (ts, step) =>
      val a = Kernel.align(ts, step)
      a <= ts && ts - a < step && Kernel.align(a, step) == a
    }

  property("alignUntil = align + step, strictly above input") =
    forAll(tsGen, stepGen) { (ts, step) =>
      Kernel.alignUntil(ts, step) == Kernel.align(ts, step) + step &&
        Kernel.alignUntil(ts, step) > ts
    }

  property("compact idempotent") =
    forAll(pointsGen, stepGen) { (pts, step) =>
      val once = Kernel.compact(step, pts)
      val flat = once.flatten.map { case (t, v) => (t, Option(v)) }
      Kernel.compact(step, flat) == once
    }

  property("compact input-order insensitive") =
    forAll(pointsGen, stepGen) { (pts, step) =>
      Kernel.compact(step, pts.reverse) == Kernel.compact(step, pts)
    }

  property("compact sorted/aligned/dedup'd/contiguous runs") =
    forAll(pointsGen, stepGen) { (pts, step) =>
      val runs = Kernel.compact(step, pts)
      val runsOk = runs.forall { run =>
        run.nonEmpty &&
          run.forall { case (t, _) => Kernel.align(t, step) == t } &&
          run.sliding(2).forall {
            case Seq((a, _), (b, _)) => b == a + step
            case _ => true
          }
      }
      val allTs = runs.flatten.map(_._1)
      val discontiguous = runs.sliding(2).forall {
        case Seq(r1, r2) => r2.head._1 > r1.last._1 + step
        case _ => true
      }
      runsOk && allTs == allTs.sorted && allTs.distinct == allTs && discontiguous
    }

  property("aggregate bounded by known min/max (except sum)") = {
    val vsGen = Gen.nonEmptyListOf(Gen.option(Gen.chooseNum(-1e3, 1e3)))
    forAll(vsGen, Gen.oneOf(Kernel.ValidAggregationMethods.toSeq)) { (vs, m) =>
      val known = vs.flatten
      val r = Kernel.aggregate(m, vs)
      if (known.isEmpty) r.isEmpty
      else if (m == "sum") r.isDefined
      else r.get >= known.min - 1e-9 && r.get <= known.max + 1e-9
    }
  }

  property("aggregateSeries length = ceil(n/factor)") = {
    val vsGen = Gen.listOf(Gen.option(Gen.chooseNum(-1e3, 1e3)))
    forAll(vsGen, Gen.chooseNum(1, 10)) { (vs, factor) =>
      Kernel.aggregateSeries("sum", 60, 60L * factor, vs).length ==
        (vs.length + factor - 1) / factor
    }
  }

  property("merge keeps known values and the grid shape") = {
    val seriesGen = for {
      start <- Gen.chooseNum(0L, 1000L)
      n <- Gen.chooseNum(1, 20)
      vs <- Gen.listOfN(n, Gen.option(Gen.chooseNum(-1e3, 1e3)))
    } yield Kernel.TimeSeriesData(start, start + 60L * n, 60L, vs.toIndexedSeq)
    forAll(seriesGen, seriesGen) { (a, b) =>
      val m = a.merge(b)
      m.values.length == a.values.length &&
        a.values.zip(m.values).forall { case (orig, merged) =>
          orig.isEmpty || merged == orig
        }
    }
  }

  property("globToRegex: * never crosses a dot") =
    forAll(Gen.alphaLowerStr.suchThat(_.nonEmpty), Gen.alphaLowerStr.suchThat(_.nonEmpty)) { (a, b) =>
      val re = Kernel.globToRegex("x.*")
      Prop(s"x.$a".matches(re) && !s"x.$a.$b".matches(re))
    }
}
