package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Unit spec for the pure kernel, porting the reference's behavioral cases
  * (graphite-project/ceres `tests/test_ceres.py`: ModuleFunctionsTest,
  * TimeSeriesDataTest, CeresNodeTest.compact coverage). */
class KernelSpec extends AnyFunSuite {

  // —— align / alignUntil (CeresNode.read ≈L470, compact ≈L605) ——

  test("align floors to the step grid") {
    assert(Kernel.align(1200, 60) === 1200)
    assert(Kernel.align(1259, 60) === 1200)
    assert(Kernel.align(1261, 60) === 1260)
    assert(Kernel.align(0, 60) === 0)
  }

  test("align floors toward -inf for negative timestamps (Python % semantics)") {
    assert(Kernel.align(-1, 60) === -60)
    assert(Kernel.align(-60, 60) === -60)
    assert(Kernel.align(-61, 60) === -120)
  }

  test("align rejects non-positive step") {
    intercept[IllegalArgumentException] { Kernel.align(100, 0) }
  }

  test("alignUntil always rounds UP one full step, even when already aligned") {
    // ceres: untilTime = untilTime - (untilTime % timeStep) + timeStep —
    // an aligned until still moves up one step (the read window includes it).
    assert(Kernel.alignUntil(1200, 60) === 1260)
    assert(Kernel.alignUntil(1201, 60) === 1260)
    assert(Kernel.alignUntil(1259, 60) === 1260)
  }

  // —— aggregate (ceres.py `def aggregate` ≈L930) ——

  private val vs: Seq[Option[Double]] =
    Seq(Some(1.0), None, Some(2.0), Some(6.0), None)

  test("aggregate dispatches all five methods, skipping missing values") {
    assert(Kernel.aggregate("average", vs) === Some(3.0))
    assert(Kernel.aggregate("sum", vs) === Some(9.0))
    assert(Kernel.aggregate("last", vs) === Some(6.0))
    assert(Kernel.aggregate("max", vs) === Some(6.0))
    assert(Kernel.aggregate("min", vs) === Some(1.0))
  }

  test("aggregate of all-missing yields None") {
    Kernel.ValidAggregationMethods.foreach { m =>
      assert(Kernel.aggregate(m, Seq(None, None)) === None)
      assert(Kernel.aggregate(m, Seq.empty) === None)
    }
  }

  test("aggregate raises on an invalid method (InvalidAggregationMethod)") {
    intercept[IllegalArgumentException] { Kernel.aggregate("median", vs) }
  }

  // —— aggregateSeries (≈L955) ——

  test("aggregateSeries chunks positionally by factor = new/old") {
    val in = (1 to 6).map(i => Some(i.toDouble))
    assert(Kernel.aggregateSeries("sum", 60, 180, in) ===
      Seq(Some(6.0), Some(15.0)))
    assert(Kernel.aggregateSeries("average", 60, 120, in) ===
      Seq(Some(1.5), Some(3.5), Some(5.5)))
  }

  test("aggregateSeries trailing partial chunk is aggregated, not dropped") {
    val in = (1 to 5).map(i => Some(i.toDouble))
    assert(Kernel.aggregateSeries("sum", 60, 180, in) ===
      Seq(Some(6.0), Some(9.0)))
  }

  test("aggregateSeries all-None chunks yield None") {
    assert(Kernel.aggregateSeries("sum", 60, 120, Seq(None, None, Some(3.0))) ===
      Seq(None, Some(3.0)))
  }

  test("aggregateSeries rejects non-multiple steps") {
    intercept[IllegalArgumentException] {
      Kernel.aggregateSeries("sum", 60, 90, vs)
    }
  }

  // —— compact (CeresNode.compact ≈L605) ——

  test("compact aligns, sorts, and drops missing values") {
    val out = Kernel.compact(60, Seq(
      (1261L, Some(2.0)), (1199L, Some(1.0)), (1330L, None)))
    assert(out === Seq(Seq((1140L, 1.0)), Seq((1260L, 2.0))))
  }

  test("compact duplicate aligned timestamps: max value survives (tuple sort)") {
    // reference sorts (ts, value) tuples then overwrites duplicates in order
    val out = Kernel.compact(60, Seq(
      (1205L, Some(5.0)), (1201L, Some(9.0)), (1259L, Some(7.0))))
    assert(out === Seq(Seq((1200L, 9.0))))
  }

  test("compact splits non-contiguous points into separate runs") {
    val out = Kernel.compact(60, Seq(
      (1200L, Some(1.0)), (1260L, Some(2.0)), (1500L, Some(3.0))))
    assert(out === Seq(Seq((1200L, 1.0), (1260L, 2.0)), Seq((1500L, 3.0))))
  }

  test("compact of nothing is empty") {
    assert(Kernel.compact(60, Seq.empty) === Seq.empty)
    assert(Kernel.compact(60, Seq((1L, None))) === Seq.empty)
  }

  // —— TimeSeriesData.merge (≈L870) ——

  private def tsd(start: Long, step: Long, vs: Option[Double]*) =
    Kernel.TimeSeriesData(start, start + step * vs.length, step, vs.toIndexedSeq)

  test("merge fills only own None slots (self-precedence)") {
    val a = tsd(1200, 60, Some(1.0), None, Some(3.0))
    val b = tsd(1200, 60, Some(9.0), Some(2.0), Some(9.0))
    assert(a.merge(b).values === IndexedSeq(Some(1.0), Some(2.0), Some(3.0)))
  }

  test("merge aligns other's timestamps to own grid") {
    val a = tsd(1200, 60, None, None)
    val b = tsd(1230, 60, Some(5.0), Some(6.0)) // 1230→1200, 1290→1260
    assert(a.merge(b).values === IndexedSeq(Some(5.0), Some(6.0)))
  }

  test("merge silently skips out-of-range timestamps") {
    val a = tsd(1200, 60, None, None)
    val b = tsd(900, 60, Some(1.0), Some(2.0))
    assert(a.merge(b).values === IndexedSeq(None, None))
  }

  test("merge must not clobber slot 0 from a just-before-window timestamp") {
    // startTime not step-aligned: other ts 1190 aligns to 1180 < startTime
    // 1210; Long division would truncate (1180-1210)/60 to 0 — guarded.
    val a = Kernel.TimeSeriesData(1210, 1330, 60, IndexedSeq(None, None))
    val b = Kernel.TimeSeriesData(1190, 1250, 60, IndexedSeq(Some(7.0)))
    assert(a.merge(b).values === IndexedSeq(None, None))
  }

  test("timestamps materialize exactly (end-start)/step points") {
    val a = tsd(1200, 60, Some(1.0), None, Some(3.0))
    assert(a.timestamps === Seq(1200L, 1260L, 1320L))
    assert(a.points.length === 3)
  }

  // —— globToRegex (CeresTree.find ≈L210; Python fnmatch semantics) ——

  private def matches(glob: String, s: String): Boolean =
    s.matches(Kernel.globToRegex(glob))

  test("* matches within one path segment only (never across '.')") {
    assert(matches("events.*", "events.click"))
    assert(!matches("events.*", "events.a.b"))
    assert(!matches("events.*", "metrics.click"))
  }

  test("? matches exactly one non-dot character") {
    assert(matches("events.clic?", "events.click"))
    assert(!matches("events.clic?", "events.clic"))
    assert(!matches("events.clic?", "events.clic."))
  }

  test("[seq] character classes pass through") {
    assert(matches("events.[cv]iew", "events.view"))
    assert(!matches("events.[cv]iew", "events.diew"))
  }

  test("[!seq] negation translates to Java [^seq]") {
    assert(matches("events.[!pv]lick", "events.click"))
    assert(!matches("events.[!pv]iew", "events.view"))
    assert(!matches("events.[!pv]iew", "events.piew"))
  }

  test("leading ^ inside a class is a literal, not negation") {
    assert(matches("x[^a]y", "x^y"))
    assert(matches("x[^a]y", "xay"))
    assert(!matches("x[^a]y", "xby"))
  }

  test("] first in a class (after optional !) is a literal member") {
    assert(matches("x[]a]y", "x]y"))
    assert(matches("x[]a]y", "xay"))
    assert(!matches("x[]a]y", "xby"))
    assert(!matches("x[!]a]y", "x]y"))
    assert(!matches("x[!]a]y", "xay"))
    assert(matches("x[!]a]y", "xby"))
  }

  test("ranges still work inside classes") {
    assert(matches("x[a-c]y", "xby"))
    assert(!matches("x[a-c]y", "xdy"))
  }

  test("braces are literals (reference glob has no {a,b} alternation)") {
    assert(matches("a{b,c}d", "a{b,c}d"))
    assert(!matches("a{b,c}d", "abd"))
  }

  test("regex metacharacters in metric names are escaped") {
    assert(matches("a+b", "a+b"))
    assert(!matches("a+b", "aab"))
    assert(matches("a(1)", "a(1)"))
  }

  test("unclosed [ is a literal bracket") {
    assert(matches("a[b", "a[b"))
  }
}
