package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SeriesOps

/** The CeresTree-shaped facade: find/fetch/store error + shape contract. */
class EngineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private lazy val tree = Engine.open(spark, SparkTestBase.Sf0001)

  test("walk lists all five event metrics") {
    assert(tree.walk().collect().map(_.getString(0)).toSeq ===
      Seq("events.click", "events.error", "events.purchase",
        "events.signup", "events.view"))
  }

  test("find resolves globs; interval filter keeps overlapping nodes") {
    assert(tree.find("events.*r*").collect().map(_.getString(0)).toSeq ===
      Seq("events.error", "events.purchase"))
    // the data covers 2024-01; an interval far in the future matches nothing
    assert(tree.find("events.*",
      from = Some(4102444800L), until = Some(4102531200L)).count() === 0)
    assert(tree.find("events.*",
      from = Some(SeriesOps.From), until = Some(SeriesOps.Until)).count() === 5)
  }

  test("hasNode true/false") {
    assert(tree.hasNode("events.purchase"))
    assert(!tree.hasNode("events.nope"))
  }

  test("fetch of unknown metric raises NodeNotFound") {
    intercept[NoSuchElementException] {
      tree.fetch("events.nope", SeriesOps.From, SeriesOps.Until)
    }
  }

  test("fetch always returns the full dense grid (NoData -> all-null rows)") {
    // valid metric, but a window before any data: grid rows, all null
    val df = tree.fetch("events.purchase", 946684800L, 946692000L)
    val rows = df.collect()
    assert(rows.length === 3) // [from, until+step) at 3600: 946684800..946695600
    assert(rows.forall(_.isNullAt(1)))
  }

  test("fetchPattern returns every glob match's grid; agrees with fetch") {
    val df = tree.fetchPattern("events.*",
      graft.operators.SeriesOps.From, graft.operators.SeriesOps.Until)
    val byMetric = df.collect().groupBy(_.getString(0))
    assert(byMetric.keySet.size === 5)
    val one = tree.fetch("events.purchase",
      graft.operators.SeriesOps.From, graft.operators.SeriesOps.Until)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSeq
    val viaPattern = byMetric("events.purchase")
      .map(r => (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(viaPattern === one)
    // non-matching pattern → empty frame, same schema
    assert(tree.fetchPattern("nosuch.*", graft.operators.SeriesOps.From,
      graft.operators.SeriesOps.Until).collect().isEmpty)
  }

  test("aggregate dispatches and validates the method") {
    val avg = tree.aggregate("events.purchase", "average",
      SeriesOps.From, SeriesOps.Until)
    assert(avg.isDefined && avg.get > 0)
    intercept[IllegalArgumentException] {
      tree.aggregate("events.purchase", "median", SeriesOps.From, SeriesOps.Until)
    }
  }

  test("registerViews exposes the catalog to spark.sql") {
    tree.registerViews()
    val n = spark.sql(
      """SELECT count(*) AS n FROM graft_points p
        | JOIN graft_metrics_meta m USING (metric)
        | WHERE m.aggregationMethod = 'sum'""".stripMargin)
      .head.getLong(0)
    assert(n > 0)
    assert(spark.sql("SELECT count(*) FROM graft_documents").head.getLong(0) === 500)
  }

  test("store-backed engine: createNode -> store -> maintain -> multires fetch") {
    import spark.implicits._
    import graft.core.MetaStore
    val base = java.nio.file.Files.createTempDirectory("graft-store-eng")
    val storeDir = base.resolve("store").toString
    val metaDir = base.resolve("meta").toString
    val t = Engine.openStore(spark, storeDir, metaDir)
    t.createNode("svc.lat", 3600L, "sum", 0.0,
      Seq(MetaStore.Retention(3600L, 24L), MetaStore.Retention(86400L, 30L)))

    // 3 days of hourly writes (values = hour index), unaligned timestamps
    val rows = (0 until 72).map(h => ("svc.lat", h * 3600L + 17L, Some(h.toDouble)))
    t.store(rows.toDF("metric", "ts", "value"))
    assert(t.find("svc.*", Some(0L), Some(100L * 3600)).count() === 1)

    // before maintenance: plain hourly read round-trips the writes
    val sparse = t.fetchSparse("svc.lat", 0L, 71 * 3600L).collect()
    assert(sparse.length === 72)
    assert(sparse.map(_.getDouble(1)).toSeq === (0 until 72).map(_.toDouble))

    // maintain anchored at the end of day 3: the fine band keeps the last
    // 24h, days 1-2 roll up to the daily tier (sum), nothing expires
    val now = 72 * 3600L
    val maintained = t.maintain(now)
    val store2 = base.resolve("store2").toString
    maintained.write.parquet(store2)
    val t2 = Engine.openStore(spark, store2, metaDir)
    // multires read across both tiers: day buckets of 24 hourly sums
    val got = t2.fetchSparse("svc.lat", 0L, 72 * 3600L - 3600L).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    def daySum(d: Int) = (d * 24 until (d + 1) * 24).map(_.toDouble).sum
    assert(got === Seq((0L, daySum(0)), (86400L, daySum(1)), (2 * 86400L, daySum(2))))
    // the dense grid is at the reconciled (daily) step
    assert(t2.fetch("svc.lat", 0L, 72 * 3600L - 3600L).count() === 3)
  }

  test("tree properties lifecycle: create, overwrite, delete, isolation") {
    import graft.core.MetaStore
    val metaDir = java.nio.file.Files.createTempDirectory("graft-tree")
      .resolve("log").toString
    val t = Engine.openWithMetaStore(spark, SparkTestBase.Sf0001, metaDir)
    assert(t.treeProps === Map.empty)

    t.createTree(Map("node_cache" -> "all", "owner" -> "metrics-team"))
    assert(t.treeProps === Map("node_cache" -> "all", "owner" -> "metrics-team"))

    // last-writer-wins overwrite, other keys untouched
    t.createTree(Map("node_cache" -> "none"))
    assert(t.treeProps === Map("node_cache" -> "none", "owner" -> "metrics-team"))

    // tombstone one property
    MetaStore.deleteTreeProp(spark, metaDir, "owner")
    assert(t.treeProps === Map("node_cache" -> "none"))

    // tree props never leak into the node log and vice versa
    t.createNode("svc.x")
    assert(t.walk().collect().map(_.getString(0)).toSeq === Seq("svc.x"))
    assert(t.treeProps === Map("node_cache" -> "none"))
  }

  test("createNode lifecycle: create, update, tombstone, compact") {
    import graft.core.MetaStore
    val metaDir = java.nio.file.Files.createTempDirectory("graft-meta")
      .resolve("log").toString
    val t = Engine.openWithMetaStore(spark, SparkTestBase.Sf0001, metaDir)
    assert(t.walk().count() === 0)

    t.createNode("svc.a", 60L, "sum", 0.25,
      Seq(MetaStore.Retention(60L, 1440L), MetaStore.Retention(3600L, 720L)))
    t.createNode("svc.b")
    assert(t.walk().collect().map(_.getString(0)).toSeq === Seq("svc.a", "svc.b"))
    assert(t.hasNode("svc.a") && !t.hasNode("svc.c"))
    assert(t.find("svc.*").count() === 2)

    // update wins by version
    t.createNode("svc.a", 60L, "max", 0.75, Seq(MetaStore.Retention(60L, 10L)))
    val row = t.meta.where(org.apache.spark.sql.functions.col("metric") === "svc.a")
      .select("aggregationMethod", "xFilesFactor").head
    assert(row.getString(0) === "max" && row.getDouble(1) === 0.75)

    // invalid method rejected (reference InvalidAggregationMethod)
    intercept[IllegalArgumentException] { t.createNode("svc.c", 60L, "median") }

    // tombstone
    t.deleteNode("svc.b")
    assert(!t.hasNode("svc.b"))
    assert(t.walk().collect().map(_.getString(0)).toSeq === Seq("svc.a"))

    // fetch of a tombstoned node raises NodeNotFound
    intercept[NoSuchElementException] { t.fetch("svc.b", 0L, 7200L) }

    // compaction preserves the resolved view
    val compacted = java.nio.file.Files.createTempDirectory("graft-meta2")
      .resolve("log").toString
    MetaStore.compact(spark, metaDir, compacted)
    assert(MetaStore.read(spark, compacted).count() === 1)
  }

  test("createNode without a MetaStore-backed engine is an error") {
    intercept[IllegalStateException] { tree.createNode("x") }
  }

  test("store writes compacted points readable by the store view") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-store").toString
    tree.store(Seq(("m", 7205L, Some(1.0)), ("m", 7201L, Some(3.0)))
      .toDF("metric", "ts", "value"), dir)
    val got = graft.streaming.Ingest.storeView(spark, dir).collect()
    assert(got.length === 1)
    assert(got.head.getLong(2) === 7200L && got.head.getDouble(3) === 3.0)
  }
}
