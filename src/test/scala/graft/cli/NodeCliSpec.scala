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

  test("create -> write -> read round-trips through the mains") {
    // force the shared session into existence BEFORE the mains run, so
    // their getOrCreate reuses it (and must not stop it on exit)
    assert(!spark.sparkContext.isStopped)
    val store = Files.createTempDirectory("graft-cli-store").toString
    val metaDir = Files.createTempDirectory("graft-cli-meta").toString + "/m"

    NodeCreate.main(Array(metaDir, "cli.metric", "3600", "sum", "0.0"))
    NodeWrite.main(Array(store, metaDir, "cli.metric",
      "17=1.0", "3617=2.0", "7217=3.0"))

    val lines = NodeRead.readLines(spark,
      NodeRead.Args(store, metaDir, "cli.metric", 0L, 3 * 3600L))
    // grid is aligned + dense out to alignUntil's extra step; written
    // points land on their aligned hours
    assert(lines.take(3) === Seq("0 1.0", "3600 2.0", "7200 3.0"))
    assert(lines.drop(3).forall(_.endsWith(" None")))
    assert(!spark.sparkContext.isStopped,
      "CLI mains must not stop an embedding caller's session")
  }
}
