package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper for [[RollingWinnow]] — top-level object so generated
  * Java code calls a static forwarder (see [[RollingHash]]). */
object Winnow {

  /** Winnowed fingerprint set (Schleimer–Wilkerson–Aiken 2003, the MOSS
    * scheme): the per-position `width`-char Rabin–Karp hashes of `s`
    * ([[RollingHash]]'s polynomial, same base/mod), then the DISTINCT
    * minima of every `win` consecutive position hashes, ascending.
    *
    * Guarantee (the reason winnowing beats "every k-th shingle" sampling):
    * any substring of at least `width + win − 1` chars shared by two
    * documents contributes at least one IDENTICAL fingerprint to both
    * sets, while the expected density is only 2/(win+1) of positions —
    * provably-sufficient coverage at a fraction of the index size.
    *
    * Degenerate inputs mirror [[RollingHash.compute]]: fewer code points
    * than `width` → one hash of the full contents (empty → 0); fewer
    * positions than `win` → a single window over all positions (the
    * result is then exactly `[rolling_minhash]`).
    *
    * One O(len) pass: code points decoded straight off the UTF-8 bytes,
    * position hashes via the O(1) rolling update, window minima via a
    * monotonic deque (amortized O(1) per position), then sort + dedupe of
    * the O(len / win · 2) expected minima. */
  def compute(s: UTF8String, width: Int, win: Int,
              base: Long, mod: Long): UnsafeArrayData = {
    val nBytes = s.numBytes
    if (nBytes == 0) return UnsafeArrayData.fromPrimitiveArray(Array(0L))
    var pow = 1L
    var k = 0
    while (k < width - 1) { pow = pow * base % mod; k += 1 }
    val ring = new Array[Int](width)
    var hs = new Array[Long](16) // position hashes, windows fully inside s
    var np = 0
    var cnt = 0
    var h = 0L
    var i = 0
    while (i < nBytes) {
      val b0 = s.getByte(i) & 0xFF
      var cp = 0
      var len = 1
      if (b0 < 0x80) cp = b0
      else if ((b0 & 0xE0) == 0xC0) { cp = b0 & 0x1F; len = 2 }
      else if ((b0 & 0xF0) == 0xE0) { cp = b0 & 0x0F; len = 3 }
      else { cp = b0 & 0x07; len = 4 }
      var j = 1
      while (j < len && i + j < nBytes) {
        cp = (cp << 6) | (s.getByte(i + j) & 0x3F); j += 1
      }
      i += len
      if (cnt < width) {
        h = (h * base + cp) % mod
      } else {
        h = java.lang.Math.floorMod(
          (h - ring(cnt % width) * pow) * base + cp, mod)
      }
      ring(cnt % width) = cp
      cnt += 1
      if (cnt >= width) {
        if (np == hs.length) {
          val grown = new Array[Long](hs.length * 2)
          System.arraycopy(hs, 0, grown, 0, hs.length)
          hs = grown
        }
        hs(np) = h
        np += 1
      }
    }
    if (cnt < width) return UnsafeArrayData.fromPrimitiveArray(Array(h))
    val w = if (win < np) win else np
    val mins = new Array[Long](np - w + 1)
    val dq = new Array[Int](np) // indices with increasing hash values
    var head = 0
    var tail = 0
    var p = 0
    while (p < np) {
      while (tail > head && hs(dq(tail - 1)) >= hs(p)) tail -= 1
      dq(tail) = p
      tail += 1
      if (dq(head) <= p - w) head += 1
      if (p >= w - 1) mins(p - w + 1) = hs(dq(head))
      p += 1
    }
    java.util.Arrays.sort(mins)
    var distinct = 1
    var q = 1
    while (q < mins.length) {
      if (mins(q) != mins(q - 1)) { mins(distinct) = mins(q); distinct += 1 }
      q += 1
    }
    val out = new Array[Long](distinct)
    System.arraycopy(mins, 0, out, 0, distinct)
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Native Catalyst winnowing fingerprinter: the distinct window-minima of
  * the per-position rolling `width`-char hashes, as one sorted
  * `ARRAY<BIGINT>` per document inside whole-stage codegen.
  *
  * [[RollingMinHash]] is this collapsed to `win = ∞` (one global minimum —
  * a fixed-size fingerprint with no coverage guarantee); winnowing keeps a
  * guaranteed-dense sample instead, which is what substring-level copy
  * DETECTION needs. Same polynomial arithmetic as [[RollingHash]], so the
  * DuckDB oracle reproduces the positions with `ascii(substr(...))`
  * windows and the minima with a framed `min() OVER` window. */
case class RollingWinnow(child: Expression, width: Int, win: Int,
                         base: Long, mod: Long)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(width > 0 && win > 0 && base > 0 && mod > 1,
    s"bad params: $width $win $base $mod")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_winnow_hashes"

  override def nullSafeEval(input: Any): Any =
    Winnow.compute(input.asInstanceOf[UTF8String], width, win, base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.Winnow.compute($c, $width, $win, ${base}L, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): RollingWinnow =
    copy(child = newChild)
}
