package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Specs for the native [[DotProduct]] expression: bit-parity with the
  * interpreted `aggregate(zip_with(...))` form it replaces, null contract,
  * codegen presence, and SQL-name registration. */
class GraftFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import SparkTestBase.Sf0001

  private def emb = graft.core.Catalog.embeddings(spark, Sf0001)
    .withColumn("vecd", col("embedding").cast("array<double>"))

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("DotProduct matches aggregate(zip_with(...)) bit-for-bit on real vectors") {
    val mismatches = emb
      .select(
        GraftFunctions.dot(col("vecd"), col("vecd")).as("native"),
        hofDot(col("vecd"), col("vecd")).as("hof"))
      .where(col("native") =!= col("hof"))
      .count()
    assert(mismatches === 0L)
  }

  test("DotProduct pairwise parity on a cross join (the hot path shape)") {
    import spark.implicits._
    val small = emb.limit(8).select(col("vec_id"), col("vecd"))
    val pairs = small.as("a").crossJoin(small.as("b"))
      .select(
        GraftFunctions.dot(col("a.vecd"), col("b.vecd")).as("native"),
        hofDot(col("a.vecd"), col("b.vecd")).as("hof"))
      .as[(Double, Double)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n) ===
        java.lang.Double.doubleToLongBits(h))
    }
  }

  test("null contract: null array -> null; null elements skipped; short zip") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[Option[Double]](Some(1.0), Some(2.0)), Seq[Option[Double]](Some(3.0), Some(4.0))),
      (2L, null, Seq[Option[Double]](Some(1.0))),
      (3L, Seq[Option[Double]](Some(1.0), None), Seq[Option[Double]](Some(5.0), Some(7.0))),
      (4L, Seq[Option[Double]](Some(2.0)), Seq[Option[Double]](Some(3.0), Some(9.0)))
    ).toDF("id", "a", "b")
    val out = df.select(col("id"),
        GraftFunctions.dot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L) === Some(11.0))
    assert(out(2L) === None)
    assert(out(3L) === Some(5.0))   // null element contributes 0
    assert(out(4L) === Some(6.0))   // extra elements beyond min length ignored
  }

  test("the expression stays inside whole-stage codegen") {
    val plan = emb
      .select(GraftFunctions.dot(col("vecd"), col("vecd")).as("d"))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix marks a whole-stage-codegen'd operator; graft_dot
    // must appear INSIDE one, not in an interpreted Project
    assert("""\*\(\d+\) Project \[graft_dot""".r.findFirstIn(plan).isDefined,
      s"expected graft_dot inside a codegen'd (*-marked) Project:\n$plan")
  }

  test("SQL registration: graft_dot callable from spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head.getDouble(0)
    assert(r === 32.0)
  }

  test("graft_dot implicitly casts float arrays (raw embedding column in SQL)") {
    GraftFunctions.register(spark)
    graft.core.Catalog.embeddings(spark, Sf0001)
      .createOrReplaceTempView("emb_raw")
    // embedding is ARRAY<FLOAT>; ImplicitCastInputTypes must insert the
    // cast so pure-SQL users can call graft_dot on the raw column
    val r = spark.sql(
      "SELECT graft_dot(embedding, embedding) AS d FROM emb_raw LIMIT 5")
      .collect().map(_.getDouble(0))
    assert(r.length === 5 && r.forall(_ > 0.0))
  }

  test("SQL registration: graft_rolling_minhash callable from spark.sql") {
    GraftFunctions.register(spark)
    val got = spark.sql("SELECT graft_rolling_minhash('hello world', 5) AS h")
      .head.getLong(0)
    val expect = org.apache.spark.sql.graft.RollingHash.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("hello world"),
      5, GraftFunctions.HashBase, GraftFunctions.HashMod)
    assert(got === expect)
  }

  test("RollingMinHash matches a naive per-window polynomial reference") {
    import spark.implicits._
    val cases = Seq("", "ab", "abcd", "abcde", "hello world hello world",
      "aaaaaa", "the quick brown fox jumps over the lazy dog")
    val got = cases.toDF("s")
      .select(col("s"), GraftFunctions.rollingMinHash(col("s"), 5).as("h"))
      .as[(String, Long)].collect().toMap
    cases.foreach(s =>
      assert(got(s) === FunctionsPropSpec.naiveMinHash(s, 5), s"mismatch for '$s'"))
  }

  test("RollingMinHash on corpus text: same value as the oracle formula") {
    import spark.implicits._
    // identical texts must collide; distinct salads essentially never do
    val texts = graft.core.Catalog.documents(spark, Sf0001)
      .select(col("text")).limit(20)
    val h = texts
      .select(GraftFunctions.rollingMinHash(col("text"), 5).as("h"))
      .as[Long].collect()
    assert(h.forall(v => v >= 0 && v < GraftFunctions.HashMod))
  }

  test("RollingWinnow: codegen path matches naive reference; SQL registered") {
    import spark.implicits._
    val cases = Seq("", "ab", "abcde", "hello world hello world",
      "aaaaaaaaaa", "the quick brown fox jumps over the lazy dog")
    val got = cases.toDF("s")
      .select(col("s"),
        GraftFunctions.winnowHashes(col("s"), 5, 4).as("fps"))
      .as[(String, Seq[Long])].collect().toMap
    cases.foreach(s =>
      assert(got(s) === FunctionsPropSpec.naiveWinnow(s, 5, 4), s"for '$s'"))
    // identical docs winnow to identical sets; SQL name resolves
    val viaSql = spark.sql(
      "SELECT graft_winnow_hashes('hello world hello world', 5, 4) AS fps")
      .as[Seq[Long]].head
    assert(viaSql === got("hello world hello world"))
  }

  test("fused cosine is bit-identical to the composed three-dot form") {
    import org.apache.spark.sql.functions._
    val spark = SparkTestBase.spark
    // real fixture vectors (every pair of the first 40): the fused
    // single-pass expression must reproduce the composed form's bits
    // EXACTLY — the ANN oracles' hash-match depends on it
    val e = graft.core.Catalog.embeddings(spark, SparkTestBase.Sf0001)
      .where(col("vec_id") < 40)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val pairs = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        GraftFunctions.cosineSim(col("a.v"), col("b.v")).as("fused"),
        (GraftFunctions.dot(col("a.v"), col("b.v")) /
          (sqrt(GraftFunctions.dot(col("a.v"), col("a.v"))) *
           sqrt(GraftFunctions.dot(col("b.v"), col("b.v"))))).as("composed"))
      .collect()
    assert(pairs.length === 40 * 39 / 2)
    pairs.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        s"fused ${r.getDouble(0)} != composed ${r.getDouble(1)}")
    }
    // ragged + null-element contract matches the composed calls too
    import spark.implicits._
    val ragged = Seq((Seq(Some(1.0), None, Some(2.0)), Seq(Some(3.0), Some(4.0))))
      .toDF("a", "b")
      .select(
        GraftFunctions.cosineSim(col("a"), col("b")).as("fused"),
        (GraftFunctions.dot(col("a"), col("b")) /
          (sqrt(GraftFunctions.dot(col("a"), col("a"))) *
           sqrt(GraftFunctions.dot(col("b"), col("b"))))).as("composed"))
      .head
    assert(java.lang.Double.doubleToRawLongBits(ragged.getDouble(0)) ===
      java.lang.Double.doubleToRawLongBits(ragged.getDouble(1)))
  }

  test("GraftExtensions registers graft_dot on an extensions instance") {
    // the injectFunction wiring itself (a session built with
    // spark.sql.extensions=graft.functions.GraftExtensions resolves the
    // function); here we apply the extension object to a fresh extensions
    // container and verify the builder it injected produces the expression
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext)
    // and a fresh session registry registration resolves + evaluates it
    val s2 = SparkTestBase.spark.newSession()
    GraftFunctions.register(s2)
    assert(s2.sql("SELECT graft_dot(array(1.0D), array(2.0D)) AS d")
      .head.getDouble(0) === 2.0)
  }
}
