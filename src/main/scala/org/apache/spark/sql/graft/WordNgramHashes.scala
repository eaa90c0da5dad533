package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper for [[WordNgramHashes]] — top-level object so generated
  * Java code calls a static forwarder (see [[RollingHash]]). */
object WordNgram {

  /** FNV-1a offset basis / prime (64-bit) — the per-word hash. */
  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  /** All word `n`-gram hashes of a space-separated string, in one O(len)
    * pass: FNV-1a per word straight off the UTF-8 bytes (word equality ⟺
    * byte equality — no decoding needed), then a rolling polynomial over
    * the word-hash sequence on natural 2^64 wraparound
    * (`h_next = (h − wh_out·base^(n−1))·base + wh_in`). Fewer than `n`
    * words → empty array. The input is expected single-space separated
    * (the engine normalizes first); an empty string is one empty word,
    * matching `split("", " ")`. */
  def compute(s: UTF8String, n: Int, base: Long): UnsafeArrayData = {
    val nBytes = s.numBytes
    // pass 1 flows into word hashes; words are appended as they close
    var whs = new Array[Long](16)
    var wc = 0
    var h = FnvOffset
    var i = 0
    while (i <= nBytes) {
      if (i == nBytes || s.getByte(i) == ' ') {
        if (wc == whs.length) {
          val grown = new Array[Long](whs.length * 2)
          System.arraycopy(whs, 0, grown, 0, whs.length)
          whs = grown
        }
        whs(wc) = h
        wc += 1
        h = FnvOffset
      } else {
        h = (h ^ (s.getByte(i) & 0xFFL)) * FnvPrime
      }
      i += 1
    }
    if (wc < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    var pow = 1L
    var k = 0
    while (k < n - 1) { pow *= base; k += 1 }
    val out = new Array[Long](wc - n + 1)
    var acc = 0L
    var j = 0
    while (j < wc) {
      if (j < n) acc = acc * base + whs(j)
      else acc = (acc - whs(j - n) * pow) * base + whs(j)
      if (j >= n - 1) out(j - n + 1) = acc
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Native Catalyst word n-gram hasher: one `ARRAY<BIGINT>` of all word
  * `n`-gram hashes per document, computed in a single O(len) pass inside
  * whole-stage codegen.
  *
  * Replaces the interpreted
  * `transform(sequence(...), i -> xxhash64(concat_ws(...)))` pipeline,
  * which allocates and re-hashes an ~n-word STRING per window (O(len·n)
  * bytes touched, one boxed lambda call per window) — for 13-grams that
  * string build dominated the decontamination scan's cost. Here each word
  * is FNV-hashed once off the UTF-8 bytes and windows combine word hashes
  * with an O(1) rolling polynomial on 2^64 wraparound — deterministic on
  * the JVM, and hash identity is all the consumers use (gram equality;
  * the oracle compares the emitted doc-level results via gram STRINGS, so
  * the hash function itself needs no SQL mirror).
  */
case class WordNgramHashes(child: Expression, n: Int, base: Long)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(n > 0 && base % 2 == 1, s"bad params: n=$n base=$base (base must be odd)")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_word_ngram_hashes"

  override def nullSafeEval(input: Any): Any =
    WordNgram.compute(input.asInstanceOf[UTF8String], n, base)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.WordNgram.compute($c, $n, ${base}L)")

  override protected def withNewChildInternal(newChild: Expression): WordNgramHashes =
    copy(child = newChild)
}
