package graft.cli

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.core.MetaStore

/** The node CLI faces end-to-end: create → write → read through the real
  * mains (argv in, printed grid out), against the shared test session
  * (the mains' getOrCreate reuses it and must leave it running). */
class NodeCliSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("arg grammars: defaults, retention ladders, malformed input") {
    assert(NodeCreate.parseArgs(Array("m", "a.b")) ===
      Some(NodeCreate.Args("m", "a.b", 3600L, "average", 0.5, Seq.empty)))
    assert(NodeCreate.parseArgs(
      Array("m", "a.b", "60", "sum", "0.0", "60:10,300:10")) ===
      Some(NodeCreate.Args("m", "a.b", 60L, "sum", 0.0,
        Seq(MetaStore.Retention(60, 10), MetaStore.Retention(300, 10)))))
    assert(NodeCreate.parseArgs(Array("m")) === None)
    assert(NodeCreate.parseArgs(Array("m", "a.b", "notanum")) === None)
    assert(NodeWrite.parseArgs(Array("s", "m", "a.b", "10=1.5", "20=2.5")) ===
      Some(NodeWrite.Args("s", "m", "a.b", Seq((10L, 1.5), (20L, 2.5)))))
    assert(NodeWrite.parseArgs(Array("s", "m", "a.b")) === None)
    assert(NodeWrite.parseArgs(Array("s", "m", "a.b", "10:1.5")) === None)
    assert(NodeRead.parseArgs(Array("s", "m", "a.b", "0", "100")) ===
      Some(NodeRead.Args("s", "m", "a.b", 0L, 100L)))
    assert(NodeRead.parseArgs(Array("s", "m", "a.b", "0")) === None)
  }

  test("TreeCreate arg grammar: props, empty keys, no args") {
    assert(TreeCreate.parseArgs(Array("m")) ===
      Some(TreeCreate.Args("m", Map.empty)))
    assert(TreeCreate.parseArgs(Array("m", "owner=ops", "step=60")) ===
      Some(TreeCreate.Args("m", Map("owner" -> "ops", "step" -> "60"))))
    // '=' inside the value survives the 2-way split
    assert(TreeCreate.parseArgs(Array("m", "desc=a=b")) ===
      Some(TreeCreate.Args("m", Map("desc" -> "a=b"))))
    assert(TreeCreate.parseArgs(Array("m", "=v")) === None)  // empty key
    assert(TreeCreate.parseArgs(Array("m", "noequals")) === None)
    assert(TreeCreate.parseArgs(Array.empty[String]) === None)
  }

  test("TreeCreate main round-trips props through MetaStore.treeProps") {
    assert(!spark.sparkContext.isStopped)
    val metaDir = Files.createTempDirectory("graft-cli-tree").toString + "/m"
    TreeCreate.main(Array(metaDir, "owner=ops", "step=60"))
    assert(MetaStore.treeProps(spark, metaDir) ===
      Map("owner" -> "ops", "step" -> "60"))
    // re-run is last-writer-wins, like re-writing a prop file
    TreeCreate.main(Array(metaDir, "owner=data"))
    assert(MetaStore.treeProps(spark, metaDir)("owner") === "data")
    assert(!spark.sparkContext.isStopped)
  }

  test("SliceCheck arg grammar + checkLines flags known corruption") {
    assert(SliceCheck.parseArgs(Array("s")) === Some(SliceCheck.Args("s")))
    assert(SliceCheck.parseArgs(Array.empty[String]) === None)
    assert(SliceCheck.parseArgs(Array("s", "extra")) === None)

    import spark.implicits._
    val store = Files.createTempDirectory("graft-cli-check").toString
    // bad.dup: same (metric, step, ts) cell twice → 1 dup row
    // bad.misaligned: ts 3601 not on the 3600 grid → 1 misaligned
    // bad.overlap: cell at 7200 then one at 7200+step/2? overlap needs a
    //   cell starting before a previous cell's end: ts=0 step=7200 covers
    //   [0,7200), next cell ts=3600 step=3600 starts inside it
    // good: clean hourly cells → all zeros
    Seq(
      ("bad.dup", 3600L, 0L, 1.0), ("bad.dup", 3600L, 0L, 2.0),
      ("bad.misaligned", 3600L, 3601L, 1.0),
      ("bad.overlap", 7200L, 0L, 1.0), ("bad.overlap", 3600L, 3600L, 2.0),
      ("good", 3600L, 0L, 1.0), ("good", 3600L, 3600L, 2.0)
    ).toDF("metric", "step", "ts", "value").write.parquet(store + "/p")

    val lines = SliceCheck.checkLines(spark, SliceCheck.Args(store + "/p")).toSeq
    assert(lines === Seq(
      "bad.dup dup_rows=1 misaligned=0 overlap=0",
      "bad.misaligned dup_rows=0 misaligned=1 overlap=0",
      "bad.overlap dup_rows=0 misaligned=0 overlap=1",
      "good dup_rows=0 misaligned=0 overlap=0"))
  }

  test("create -> write -> read round-trips through the mains") {
    // force the shared session into existence BEFORE the mains run, so
    // their getOrCreate reuses it (and must not stop it on exit)
    assert(!spark.sparkContext.isStopped)
    val store = Files.createTempDirectory("graft-cli-store").toString
    val metaDir = Files.createTempDirectory("graft-cli-meta").toString + "/m"

    NodeCreate.main(Array(metaDir, "cli.metric", "3600", "sum", "0.0"))
    NodeWrite.main(Array(store, metaDir, "cli.metric",
      "17=1.0", "3617=2.0", "7217=3.0"))

    // readLines streams an Iterator — materialize ONCE before asserting
    // (an Iterator compared to a Seq is never ===, and take/drop on the
    // same iterator would double-consume it)
    val lines = NodeRead.readLines(spark,
      NodeRead.Args(store, metaDir, "cli.metric", 0L, 3 * 3600L)).toSeq
    // grid is aligned + dense out to alignUntil's extra step; written
    // points land on their aligned hours
    assert(lines.take(3) === Seq("0 1.0", "3600 2.0", "7200 3.0"))
    assert(lines.drop(3).forall(_.endsWith(" None")))
    assert(!spark.sparkContext.isStopped,
      "CLI mains must not stop an embedding caller's session")
  }
}
