package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StructField, StructType}

/** Static helper for [[HoltWinters]] / [[HoltWintersBands]] — top-level
  * object so generated Java can call it statically (the [[RollingHash]]
  * pattern). */
object HoltWintersRec {

  /** Additive triple-exponential smoothing over one ordered series.
    *
    * Input: the slot values of a densified grid in ts order (null =
    * gap). Output: per slot, the ONE-STEP-AHEAD forecast from the state
    * BEFORE that slot's observation is folded in (null until the first
    * observation has been consumed — there is no history to forecast
    * from). State: level `l`, trend `b`, additive seasonal offsets
    * `s[season]`; a gap leaves the state untouched (the forecast still
    * advances — graphite draws the forecast across gaps).
    *
    * Update (the classic additive Holt–Winters recurrences), with
    * power-of-two smoothing constants so every coefficient is exact in
    * binary and the double recursion is bit-reproducible in any engine
    * that replays the same operation order (the DuckDB oracle's
    * recursive CTE does):
    *   l' = α(v − s[i%m]) + (1−α)(l + b)
    *   b' = β(l' − l) + (1−β) b
    *   s[i%m]' = γ(v − l') + (1−γ) s[i%m]
    * First observation: l = v, b = 0, s untouched (the standard "level
    * starts at the first point" bootstrap; seasonal offsets learn from
    * the residuals of subsequent seasons).
    *
    * The walk ALSO tracks the per-season-slot absolute-residual
    * deviation d (graphite's holtWintersConfidenceBands state):
    * whenever a non-gap slot had a forecast, d[i%m]' = γ|v − f| +
    * (1−γ) d[i%m]; each slot emits the PRIOR d[i%m] next to its
    * forecast, so bands derive from state the observation has not yet
    * touched. */
  def compute(values: ArrayData, season: Int,
              alpha: Double, beta: Double, gamma: Double): ArrayData =
    walk(values, season, alpha, beta, gamma)._1

  /** Forecast + prior deviation per slot as an array of structs. */
  def computeBands(values: ArrayData, season: Int,
                   alpha: Double, beta: Double, gamma: Double): ArrayData = {
    val (f, d) = walk(values, season, alpha, beta, gamma)
    val n = f.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val row = new GenericInternalRow(2)
      if (f.isNullAt(i)) row.setNullAt(0) else row.setDouble(0, f.getDouble(i))
      if (d.isNullAt(i)) row.setNullAt(1) else row.setDouble(1, d.getDouble(i))
      out(i) = row
      i += 1
    }
    new GenericArrayData(out)
  }

  private def walk(values: ArrayData, season: Int, alpha: Double,
                   beta: Double, gamma: Double): (ArrayData, ArrayData) = {
    require(season >= 1, s"season must be >= 1: $season")
    val n = values.numElements()
    val fOut = new Array[Any](n)
    val dOut = new Array[Any](n)
    var l = 0.0
    var b = 0.0
    val s = new Array[Double](season)
    val d = new Array[Double](season)
    var init = false
    var i = 0
    while (i < n) {
      val idx = i % season
      var f = Double.NaN
      if (init) {
        f = l + b + s(idx)
        fOut(i) = java.lang.Double.valueOf(f)
        dOut(i) = java.lang.Double.valueOf(d(idx))
      }
      if (!values.isNullAt(i)) {
        val v = values.getDouble(i)
        if (!init) { l = v; init = true }
        else {
          val lNew = alpha * (v - s(idx)) + (1 - alpha) * (l + b)
          val bNew = beta * (lNew - l) + (1 - beta) * b
          s(idx) = gamma * (v - lNew) + (1 - gamma) * s(idx)
          l = lNew
          b = bNew
          d(idx) = gamma * math.abs(v - f) + (1 - gamma) * d(idx)
        }
      }
      i += 1
    }
    (new GenericArrayData(fOut), new GenericArrayData(dOut))
  }

  private[graft] def checkInput(prettyName: String,
                                dt: DataType): TypeCheckResult = dt match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs ARRAY<DOUBLE>, got $other")
  }
}

/** Native Catalyst Holt–Winters smoother: one call per SERIES (the input
  * is the already-result-sized slot-value array of a densified grid, not
  * per-point rows), returning the per-slot one-step-ahead forecasts.
  *
  * The recursion is inherently sequential — no window/aggregate
  * decomposition exists — so the per-series array pass IS the minimal
  * distributed shape: series are independent (perfect parallelism across
  * metrics), and within a series the O(slots) loop runs where the data
  * is, as primitive double arithmetic, instead of collecting points to
  * the driver. */
case class HoltWinters(child: Expression, season: Int,
                       alpha: Double, beta: Double, gamma: Double)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    HoltWintersRec.checkInput(prettyName, child.dataType)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  override def prettyName: String = "graft_holt_winters"

  override def nullSafeEval(input: Any): Any =
    HoltWintersRec.compute(input.asInstanceOf[ArrayData], season,
      alpha, beta, gamma)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.HoltWintersRec.compute($c, $season, " +
        s"${alpha}D, ${beta}D, ${gamma}D)")

  override protected def withNewChildInternal(newChild: Expression): HoltWinters =
    copy(child = newChild)
}

/** Per-slot (forecast, prior seasonal deviation) structs from the SAME
  * [[HoltWintersRec]] walk — the state the confidence-band and
  * aberration reads derive from (see [[HoltWinters]] for the execution
  * contract). */
case class HoltWintersBands(child: Expression, season: Int,
                            alpha: Double, beta: Double, gamma: Double)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    HoltWintersRec.checkInput(prettyName, child.dataType)

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("f", DoubleType), StructField("dev", DoubleType))),
    containsNull = true)

  override def prettyName: String = "graft_holt_winters_bands"

  override def nullSafeEval(input: Any): Any =
    HoltWintersRec.computeBands(input.asInstanceOf[ArrayData], season,
      alpha, beta, gamma)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.HoltWintersRec.computeBands($c, $season, " +
        s"${alpha}D, ${beta}D, ${gamma}D)")

  override protected def withNewChildInternal(
      newChild: Expression): HoltWintersBands =
    copy(child = newChild)
}
