package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two `ARRAY<DOUBLE>` columns.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) are
  * `CodegenFallback`: every element pays an interpreted lambda call plus a
  * boxed java.lang.Double, and the zipped intermediate array is materialized
  * per row. For the embedding operators (SURVEY §2.9 similarity search) the
  * dot product is the innermost loop of an all-pairs join — at 100 TB that
  * interpretation overhead IS the query cost. This expression stays inside
  * whole-stage codegen: a primitive `double` loop over the two `ArrayData`
  * buffers, no allocation, no boxing.
  *
  * Semantics: `Σ a(i)*b(i)` over `i < min(len(a), len(b))`; null array →
  * null; null ELEMENTS are skipped (contribute 0) — embeddings are dense,
  * so this contract never triggers in practice but keeps the expression
  * total. Summation is a sequential left fold, bit-identical to the
  * `aggregate(zip_with(...))` form and to DuckDB's `sum` over an unnested
  * zip — which is what lets the oracle hash-match cosine scores.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}


/** Fused single-pass cosine similarity over two `ARRAY<DOUBLE>` columns.
  *
  * `cosine(a, b) = dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` composed
  * from three [[DotProduct]] calls traverses each array THREE times per
  * pair — and the pair-scoring loop is the innermost cost of every
  * all-pairs/ANN query. This expression computes the three accumulators in
  * ONE traversal and closes with the IDENTICAL IEEE sequence
  * (`ab / (sqrt(aa) * sqrt(bb))` — same operations, same order, same
  * per-term accumulation order), so every score is BIT-IDENTICAL to the
  * composed form and every existing oracle keeps hash-matching; only the
  * traversal count changes.
  *
  * Per-accumulator semantics replicate the composed calls exactly:
  * `aa` folds over `a`'s length (null elements skipped), `bb` over `b`'s,
  * `ab` over the common prefix where both are non-null — for equal-length
  * dense embeddings all three ranges coincide, but the contract stays
  * total for ragged input. Null array → null row, like [[DotProduct]].
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements()
    val nb = y.numElements()
    val n = math.max(na, nb)
    var ab = 0.0
    var aa = 0.0
    var bb = 0.0
    var i = 0
    while (i < n) {
      val av = i < na && !x.isNullAt(i)
      val bv = i < nb && !y.isNullAt(i)
      if (av) { val v = x.getDouble(i); aa += v * v }
      if (bv) { val v = y.getDouble(i); bb += v * v }
      if (av && bv) ab += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    ab / (java.lang.Math.sqrt(aa) * java.lang.Math.sqrt(bb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val n = ctx.freshName("n")
      val ab = ctx.freshName("ab")
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val av = ctx.freshName("av")
      val bv = ctx.freshName("bv")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $n = java.lang.Math.max($na, $nb);
         |double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  boolean $av = $i < $na && !$a.isNullAt($i);
         |  boolean $bv = $i < $nb && !$b.isNullAt($i);
         |  if ($av) { double v = $a.getDouble($i); $aa += v * v; }
         |  if ($bv) { double v = $b.getDouble($i); $bb += v * v; }
         |  if ($av && $bv) { $ab += $a.getDouble($i) * $b.getDouble($i); }
         |}
         |${ev.value} = $ab / (java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Column ⇄ Expression bridge for the graft native expressions. Lives in the
  * `org.apache.spark.sql` package tree because the Column↔Expression
  * conversion (`classic.ExpressionUtils`) and `AbstractDataType` are
  * `private[sql]` — the standard shim for Catalyst extension libraries;
  * public API is `graft.functions.GraftFunctions`. */
object bridge {
  def dotColumn(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def cosineColumn(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSim(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def rollingMinHashColumn(c: Column, width: Int, base: Long, mod: Long): Column =
    ExpressionUtils.column(
      RollingMinHash(ExpressionUtils.expression(c), width, base, mod))

  def wordNgramHashesColumn(c: Column, n: Int, base: Long): Column =
    ExpressionUtils.column(
      WordNgramHashes(ExpressionUtils.expression(c), n, base))

  def rollingWinnowColumn(c: Column, width: Int, win: Int,
                          base: Long, mod: Long): Column =
    ExpressionUtils.column(
      RollingWinnow(ExpressionUtils.expression(c), width, win, base, mod))

  def holtWintersColumn(c: Column, season: Int,
                        alpha: Double, beta: Double, gamma: Double): Column =
    ExpressionUtils.column(
      HoltWinters(ExpressionUtils.expression(c), season, alpha, beta, gamma))

  def holtWintersBandsColumn(c: Column, season: Int,
                             alpha: Double, beta: Double, gamma: Double): Column =
    ExpressionUtils.column(
      HoltWintersBands(ExpressionUtils.expression(c), season, alpha, beta, gamma))
}
