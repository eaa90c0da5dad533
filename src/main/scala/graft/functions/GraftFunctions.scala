package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{bridge, DotProduct, RollingMinHash}

/** DataFrame + SQL surface for the engine's native expressions.
  *
  * Two entry points:
  *  - [[dot]]: a `Column` combinator for Scala callers (the operators use
  *    this directly — no registration needed).
  *  - [[register]] / [[GraftExtensions]]: SQL-name registration
  *    (`graft_dot`) for `spark.sql(...)` users, injectable at session build
  *    via `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object GraftFunctions {

  /** `Σ a(i)*b(i)` as a whole-stage-codegen expression (see [[DotProduct]]). */
  def dot(a: Column, b: Column): Column = bridge.dotColumn(a, b)

  /** Fused single-pass cosine similarity (see [[CosineSim]]): bit-identical
    * to `dot(a,b)/(sqrt(dot(a,a))*sqrt(dot(b,b)))` with one array traversal
    * instead of three — the all-pairs/ANN inner loop's cost. */
  def cosineSim(a: Column, b: Column): Column = bridge.cosineColumn(a, b)

  /** Default Rabin–Karp parameters: a prime base above the BMP char range
    * step and a large prime modulus keeping every intermediate product in
    * a 64-bit long. Shared with the DuckDB oracle (mod-reduced powers). */
  val HashBase = 257L
  val HashMod = 1000000007L

  /** Minimum rolling polynomial hash over all `width`-char shingles
    * (see [[org.apache.spark.sql.graft.RollingMinHash]]). */
  def rollingMinHash(c: Column, width: Int,
                     base: Long = HashBase, mod: Long = HashMod): Column =
    bridge.rollingMinHashColumn(c, width, base, mod)

  /** Odd 64-bit polynomial base for word-gram combination (FNV prime) —
    * arithmetic wraps mod 2^64, no reduction needed. */
  val WordGramBase = 0x100000001b3L

  /** All word `n`-gram hashes of a space-separated string as one
    * `ARRAY<BIGINT>` (see [[org.apache.spark.sql.graft.WordNgramHashes]]). */
  def wordNgramHashes(c: Column, n: Int,
                      base: Long = WordGramBase): Column =
    bridge.wordNgramHashesColumn(c, n, base)

  /** Winnowed (MOSS) fingerprint set: distinct minima of every `win`
    * consecutive `width`-char rolling hashes, sorted, as one
    * `ARRAY<BIGINT>` (see [[org.apache.spark.sql.graft.RollingWinnow]]). */
  def winnowHashes(c: Column, width: Int, win: Int,
                   base: Long = HashBase, mod: Long = HashMod): Column =
    bridge.rollingWinnowColumn(c, width, win, base, mod)

  /** Per-slot one-step-ahead Holt–Winters forecasts of an ordered
    * `ARRAY<DOUBLE>` slot-value series (see
    * [[org.apache.spark.sql.graft.HoltWinters]]). Power-of-two smoothing
    * constants keep the double recursion bit-reproducible cross-engine. */
  def holtWinters(c: Column, season: Int, alpha: Double = 0.5,
                  beta: Double = 0.25, gamma: Double = 0.5): Column =
    bridge.holtWintersColumn(c, season, alpha, beta, gamma)

  /** Per-slot (forecast, prior seasonal deviation) structs of the same
    * walk — the confidence-band / aberration state (see
    * [[org.apache.spark.sql.graft.HoltWintersBands]]). */
  def holtWintersBands(c: Column, season: Int, alpha: Double = 0.5,
                       beta: Double = 0.25, gamma: Double = 0.5): Column =
    bridge.holtWintersBandsColumn(c, season, alpha, beta, gamma)

  private[functions] val dotBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2,
      s"graft_dot expects 2 arguments, got ${exprs.length}")
    DotProduct(exprs.head, exprs(1))
  }

  private[functions] val rollingBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2,
      s"graft_rolling_minhash expects (str, width), got ${exprs.length} args")
    val width = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(w: Int, _) => w
      case other => throw new IllegalArgumentException(
        s"graft_rolling_minhash width must be an integer literal, got $other")
    }
    RollingMinHash(exprs.head, width, HashBase, HashMod)
  }

  private[functions] val ngramBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2,
      s"graft_word_ngram_hashes expects (str, n), got ${exprs.length} args")
    val n = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(w: Int, _) => w
      case other => throw new IllegalArgumentException(
        s"graft_word_ngram_hashes n must be an integer literal, got $other")
    }
    org.apache.spark.sql.graft.WordNgramHashes(exprs.head, n, WordGramBase)
  }

  private[functions] val winnowBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3,
      s"graft_winnow_hashes expects (str, width, win), got ${exprs.length} args")
    val Seq(width, win) = exprs.tail.map {
      case org.apache.spark.sql.catalyst.expressions.Literal(w: Int, _) => w
      case other => throw new IllegalArgumentException(
        s"graft_winnow_hashes width/win must be integer literals, got $other")
    }
    org.apache.spark.sql.graft.RollingWinnow(exprs.head, width, win,
      HashBase, HashMod)
  }

  /** Register the graft functions on an existing session
    * (tests / interactive). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_dot", dotBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_rolling_minhash", rollingBuilder,
      "built-in")
    reg.createOrReplaceTempFunction("graft_word_ngram_hashes", ngramBuilder,
      "built-in")
    reg.createOrReplaceTempFunction("graft_winnow_hashes", winnowBuilder,
      "built-in")
  }
}

/** `SparkSessionExtensions` hook: makes the engine's native functions
  * available to pure-SQL sessions
  * (`--conf spark.sql.extensions=graft.functions.GraftExtensions`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      GraftFunctions.dotBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_rolling_minhash"),
      new ExpressionInfo(classOf[RollingMinHash].getName,
        "graft_rolling_minhash"),
      GraftFunctions.rollingBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_word_ngram_hashes"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.graft.WordNgramHashes].getName,
        "graft_word_ngram_hashes"),
      GraftFunctions.ngramBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow_hashes"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.graft.RollingWinnow].getName,
        "graft_winnow_hashes"),
      GraftFunctions.winnowBuilder))
  }
}
