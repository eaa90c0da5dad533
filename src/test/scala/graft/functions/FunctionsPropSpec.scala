package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.{DotProduct, RollingHash}
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** ScalaCheck properties for the native expressions (interpreted eval path;
  * the DataFrame/codegen path is covered by GraftFunctionsSpec — Spark's
  * eval/codegen contract then ties the two together). */
object FunctionsPropSpec extends Properties("GraftFunctions") {

  private val vecGen: Gen[Array[Double]] =
    Gen.chooseNum(0, 96).flatMap(n =>
      Gen.containerOfN[Array, Double](n, Gen.chooseNum(-1e3, 1e3)))

  property("DotProduct == sequential left-fold of products") =
    forAll(vecGen, vecGen) { (a, b) =>
      val expr = DotProduct(
        Literal.create(a, ArrayType(DoubleType)),
        Literal.create(b, ArrayType(DoubleType)))
      val got = expr.eval(InternalRow.empty).asInstanceOf[Double]
      val n = math.min(a.length, b.length)
      var expect = 0.0
      var i = 0
      while (i < n) { expect += a(i) * b(i); i += 1 }
      java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(expect)
    }

  property("DotProduct is symmetric") =
    forAll(vecGen, vecGen) { (a, b) =>
      def run(x: Array[Double], y: Array[Double]) =
        DotProduct(Literal.create(x, ArrayType(DoubleType)),
          Literal.create(y, ArrayType(DoubleType)))
          .eval(InternalRow.empty).asInstanceOf[Double]
      // commutative per element and fold order only reorders additions of
      // the SAME products — symmetric up to bit equality
      java.lang.Double.doubleToLongBits(run(a, b)) ==
        java.lang.Double.doubleToLongBits(run(b, a))
    }

  // printable-ASCII + BMP letters + ASTRAL code points (4-byte UTF-8):
  // the hash is defined over Unicode code points, so supplementary-plane
  // characters must round-trip exactly like SQL's ascii(substr(...))
  private val pieceGen: Gen[String] = Gen.frequency(
    9 -> Gen.alphaNumChar.map(_.toString), 2 -> Gen.const(" "),
    1 -> Gen.oneOf("é", "ß", "中", "𝄞", "😀"))
  private val strGen: Gen[String] = Gen.chooseNum(0, 200).flatMap(n =>
    Gen.listOfN(n, pieceGen).map(_.mkString))

  private val B = GraftFunctions.HashBase
  private val M = GraftFunctions.HashMod

  /** Naive reference: hash every CODE-POINT window from scratch (shared by
    * the unit spec — the single source of truth for the expected
    * semantics). */
  def naiveMinHash(s: String, w: Int): Long = {
    val cps = s.codePoints().toArray
    if (cps.isEmpty) 0L
    else (0 to math.max(0, cps.length - w)).map { i =>
      cps.slice(i, math.min(i + w, cps.length))
        .foldLeft(0L)((h, c) => (h * B + c) % M)
    }.min
  }

  property("RollingMinHash == naive per-window polynomial min") =
    forAll(strGen, Gen.chooseNum(1, 8)) { (s, w) =>
      RollingHash.compute(UTF8String.fromString(s), w, B, M) == naiveMinHash(s, w)
    }

  /** Naive reference for [[org.apache.spark.sql.graft.WordNgram]]: FNV-1a
    * per word (byte-level), then the direct (non-rolling) polynomial per
    * window on 2^64 wraparound. */
  def naiveWordNgrams(s: String, n: Int, base: Long): Seq[Long] = {
    def fnv(w: String): Long =
      w.getBytes("UTF-8").foldLeft(0xcbf29ce484222325L)((h, b) =>
        (h ^ (b & 0xFFL)) * 0x100000001b3L)
    val whs = s.split(" ", -1).map(fnv)
    if (whs.length < n) Seq.empty
    else (0 to whs.length - n).map(i =>
      whs.slice(i, i + n).foldLeft(0L)((acc, wh) => acc * base + wh))
  }

  private val wordsGen: Gen[String] =
    Gen.chooseNum(0, 30).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf("a", "bb", "key", "sort", "δword", "x1"))
        .map(_.mkString(" ")))

  property("WordNgram rolling hashes == direct per-window polynomials") =
    forAll(wordsGen, Gen.chooseNum(1, 14)) { (s, n) =>
      val base = GraftFunctions.WordGramBase
      val got = org.apache.spark.sql.graft.WordNgram
        .compute(UTF8String.fromString(s), n, base).toLongArray.toSeq
      got == naiveWordNgrams(s, n, base)
    }

  property("RollingMinHash is shift-invariant on shared windows") =
    forAll(strGen.suchThat(_.length >= 6)) { s =>
      // appending a prefix/suffix can only ADD candidate windows, so the
      // min over the superstring is <= the min over the substring
      val sub = RollingHash.compute(UTF8String.fromString(s), 5, B, M)
      val sup = RollingHash.compute(UTF8String.fromString("xy" + s + "zw"), 5, B, M)
      sup <= sub
    }

  /** Naive reference for [[org.apache.spark.sql.graft.Winnow]]: hash every
    * code-point window from scratch, take each winnow window's min, dedupe
    * and sort. */
  def naiveWinnow(s: String, w: Int, win: Int): Seq[Long] = {
    val cps = s.codePoints().toArray
    def poly(xs: Array[Int]): Long = xs.foldLeft(0L)((h, c) => (h * B + c) % M)
    if (cps.isEmpty) Seq(0L)
    else if (cps.length < w) Seq(poly(cps))
    else {
      val hs = (0 to cps.length - w).map(i => poly(cps.slice(i, i + w)))
      val ww = math.min(win, hs.length)
      (0 to hs.length - ww).map(j => hs.slice(j, j + ww).min)
        .distinct.sorted
    }
  }

  private def winnow(s: String, w: Int, win: Int): Seq[Long] =
    org.apache.spark.sql.graft.Winnow
      .compute(UTF8String.fromString(s), w, win, B, M).toLongArray.toSeq

  property("Winnow == naive window-minima set, sorted distinct") =
    forAll(strGen, Gen.chooseNum(1, 8), Gen.chooseNum(1, 10)) { (s, w, win) =>
      winnow(s, w, win) == naiveWinnow(s, w, win)
    }

  property("Winnow with a window covering all positions == [RollingMinHash]") =
    forAll(strGen, Gen.chooseNum(1, 8)) { (s, w) =>
      winnow(s, w, 100000) ==
        Seq(RollingHash.compute(UTF8String.fromString(s), w, B, M))
    }

  property("Winnow guarantee: a shared run of width+win-1 chars shares a fingerprint") =
    forAll(strGen, strGen, Gen.chooseNum(1, 6), Gen.chooseNum(1, 6)) {
      (prefix, suffix, w, win) =>
        // the MOSS coverage theorem (Schleimer et al. 2003 §2): any common
        // substring of length >= w + win - 1 spans at least one COMPLETE
        // winnow window in both documents, whose minimum is selected in both
        val core = "SHAREDCOREsharedcore0123456789".take(w + win - 1) +
          "SHAREDCOREsharedcore0123456789".take(math.max(0, w + win - 1 - 30))
        val a = winnow(prefix + core + suffix, w, win)
        val b = winnow(suffix.reverse + core + prefix.reverse, w, win)
        a.toSet.intersect(b.toSet).nonEmpty
    }
}
