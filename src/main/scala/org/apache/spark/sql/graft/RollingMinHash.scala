package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper for [[RollingMinHash]] — a top-level object (no companion
  * class) so scalac emits static forwarders that generated Java code can
  * call directly. */
object RollingHash {

  /** Minimum Rabin–Karp polynomial hash over all `width`-char windows of
    * `s`: `h(i) = Σ_j s(i+j) * base^(width-1-j) mod mod`, advanced with the
    * O(1) rolling update. Shorter-than-width strings hash their full
    * contents (window = whole string); empty → 0.
    *
    * Characters are Unicode CODE POINTS, decoded in one pass straight off
    * the UTF-8 bytes (no String allocation per row) — matching SQL engines'
    * character-indexed `ascii(substr(...))` for ALL characters, astral
    * included, not just the BMP. A ring buffer of the last `width` code
    * points feeds the rolling subtraction. */
  def compute(s: UTF8String, width: Int, base: Long, mod: Long): Long = {
    val nBytes = s.numBytes
    if (nBytes == 0) return 0L
    // base^(width-1) mod mod for the rolling subtraction
    var pow = 1L
    var k = 0
    while (k < width - 1) { pow = pow * base % mod; k += 1 }
    val ring = new Array[Int](width)
    var cnt = 0 // code points consumed so far
    var h = 0L
    var min = Long.MaxValue
    var i = 0
    while (i < nBytes) {
      // decode one UTF-8 code point (input is valid UTF-8: Spark strings)
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
        h = (h * base + cp) % mod // growing prefix hash
      } else {
        h = java.lang.Math.floorMod(
          (h - ring(cnt % width) * pow) * base + cp, mod)
      }
      ring(cnt % width) = cp
      cnt += 1
      if (cnt >= width && h < min) min = h
    }
    if (cnt < width) h else min // short string: hash of the full contents
  }
}

/** Native Catalyst rolling-hash document fingerprint: the minimum
  * Rabin–Karp hash over all `width`-char shingles of a string (the
  * min-selection of winnowing collapsed to one value per document).
  *
  * Replaces an interpreted `transform(sequence(...), i => md5(substr))`
  * pipeline that re-hashed every window from scratch (O(n·width) digest
  * work plus a boxed lambda per window) with an O(n) primitive rolling
  * update inside whole-stage codegen. The polynomial arithmetic is plain
  * modular math, so the DuckDB oracle reproduces it exactly with
  * `ascii(substr(...))` per window and mod-reduced power-of-base literals.
  */
case class RollingMinHash(child: Expression, width: Int, base: Long, mod: Long)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(width > 0 && base > 0 && mod > 1, s"bad params: $width $base $mod")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_rolling_minhash"

  override def nullSafeEval(input: Any): Any =
    RollingHash.compute(input.asInstanceOf[UTF8String], width, base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.RollingHash.compute($c, $width, ${base}L, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): RollingMinHash =
    copy(child = newChild)
}
