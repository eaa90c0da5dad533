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

  test("dead-pid siblings are swept before a build; live ones survive") {
    // plant two "sibling" leftovers of the SAME (prefix, src) under other
    // pids: one dead (no process can have this pid — pid_max on Linux is
    // < 2^22 by default, and ProcessHandle.of simply reports absent), one
    // alive (pid 1 always exists). The build for this JVM's own path must
    // delete the dead copy (the crash-leftover case the shutdown hook
    // cannot reach) and leave the live one alone (a concurrent harness
    // JVM's store must never vanish under its reads).
    val mine = BuildOnce.scratchPath("graft_bo_sweep", "/src/s")
    val stem = mine.replaceAll("_p[0-9]+$", "_p")
    val dead = java.nio.file.Paths.get(stem + "4194304999")
    val live = java.nio.file.Paths.get(stem + "1")
    java.nio.file.Files.createDirectories(dead.resolve("junk"))
    java.nio.file.Files.createDirectories(live.resolve("junk"))
    try {
      BuildOnce.dir(spark, "graft_bo_sweep", "/src/s") { _ => () }
      assert(!java.nio.file.Files.exists(dead), "dead-pid sibling swept")
      assert(java.nio.file.Files.exists(live), "live-pid sibling kept")
    } finally {
      // the live plant is not ours by pid, so no hook cleans it — do it here
      java.nio.file.Files.deleteIfExists(live.resolve("junk"))
      java.nio.file.Files.deleteIfExists(live): Unit
    }
  }
}
