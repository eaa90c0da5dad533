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
    * contents (window = whole string); empty → 0. Characters are UTF-16
    * code units == Unicode code points on the BMP, matching SQL engines'
    * character-indexed `ascii(substr(...))`. */
  def compute(s: UTF8String, width: Int, base: Long, mod: Long): Long = {
    val str = s.toString
    val n = str.length
    if (n == 0) return 0L
    val w = math.min(width, n)
    var pow = 1L
    var i = 0
    while (i < w - 1) { pow = pow * base % mod; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = (h * base + str.charAt(i)) % mod; i += 1 }
    var min = h
    i = w
    while (i < n) {
      h = java.lang.Math.floorMod(
        (h - str.charAt(i - w) * pow) * base + str.charAt(i), mod)
      if (h < min) min = h
      i += 1
    }
    min
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
