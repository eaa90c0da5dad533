package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** The once-per-JVM scratch-build guard behind the index/store-serving
  * registered queries. */
class BuildOnceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("builds run once per (prefix, src); distinct sources get distinct paths") {
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val a1 = BuildOnce.dir(spark, "graft_bo_test", "/src/a") { p =>
      builds.incrementAndGet()
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p)): Unit
    }
    val a2 = BuildOnce.dir(spark, "graft_bo_test", "/src/a") { _ =>
      builds.incrementAndGet(): Unit
    }
    assert(a1 === a2 && builds.get() === 1, "second call must reuse the build")

    // distinct sources — including ones whose sanitized names collide
    // ("/src/a" vs "/src_a") — must never share a scratch path
    val b = BuildOnce.dir(spark, "graft_bo_test", "/src_a") { _ => () }
    assert(b !== a1)
    assert(builds.get() === 1)

    // a leftover from a "previous process" is replaced, not trusted:
    // the build callback sees an emptied path (planted via the REAL path
    // scheme, so a rename of it cannot make this vacuously pass)
    val stale = BuildOnce.scratchPath("graft_bo_stale", "x")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(stale, "junk"))
    BuildOnce.dir(spark, "graft_bo_stale", "x") { p =>
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(p, "junk")),
        "build must start from an emptied path")
    }

    // the path embeds this JVM's pid: two harness processes on one
    // machine must never share (and so delete under each other) a
    // scratch store
    assert(stale.endsWith("_p" + ProcessHandle.current().pid()))
  }
}
