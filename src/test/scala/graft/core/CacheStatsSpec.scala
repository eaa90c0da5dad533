package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** The session-cache layer's observability face (r11 VERDICT item 4):
  * [[Catalog.cacheStats]] must report every appCached feature table with
  * its configured storage level and a real row count, and
  * [[Catalog.rddStorageInfo]] must expose the executor-side block truth
  * (the probe the r11 bench investigation needed: a demoted or evicted
  * table is invisible to the configured level). */
class CacheStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import SparkTestBase.Sf0001

  test("cacheStats reports cached feature tables with level and count") {
    val pts = Catalog.pointsCached(spark, Sf0001)
    val expected = pts.count()
    val stats = Catalog.cacheStats(spark, withCounts = true).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val row = stats.find(_._1 == s"points:$Sf0001")
    assert(row.nonEmpty, s"points:$Sf0001 missing from ${stats.map(_._1)}")
    assert(row.get._3 === expected)
    assert(row.get._2.contains("Memory"),
      s"unexpected storage level: ${row.get._2}")
    // keys are app-scoped: nothing from another application id leaks in
    assert(stats.forall(!_._1.contains(spark.sparkContext.applicationId)))
  }

  test("rddStorageInfo surfaces materialized cache blocks") {
    Catalog.pointsCached(spark, Sf0001).count()
    val info = Catalog.rddStorageInfo(spark).collect()
    assert(info.nonEmpty, "no cached RDDs visible after materialization")
    // at least one block layer holds real bytes somewhere
    assert(info.exists(r => r.getLong(3) + r.getLong(4) > 0L))
  }
}
