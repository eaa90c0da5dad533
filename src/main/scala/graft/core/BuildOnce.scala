package graft.core

import org.apache.spark.sql.SparkSession

/** Once-per-JVM scratch directory builds — the guard behind every
  * registered query that serves reads from a persisted index/store built
  * out of a corpus directory (`FeatureIndex.indexedMinhashPairs`,
  * `indexedAnnLshTopk`/`indexedAnnIvfTopk`, `VectorOps.
  * annIvfTopkStoreQuery`). Semantics: the artifact is maintained by the
  * ingest/storage side in production; queries only read it. In-process,
  * the first call builds (distrusting and replacing anything a previous
  * process left at the path — the build is what vouches for the
  * contents) and later calls reuse.
  *
  * The scratch path embeds the SANITIZED source dir, not just its hash:
  * with a hash-only name, two corpora whose paths collide on hashCode
  * would share one directory while being tracked as distinct builds —
  * the second build would silently replace the first's data under its
  * feet. */
object BuildOnce {

  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Return the scratch dir for (`prefix`, `srcDir`), running `build` on
    * the emptied path iff this JVM has not built it yet. Builds of the
    * SAME artifact are serialized (computeIfAbsent's per-key mapping
    * guarantee); lookups and builds of other artifacts are not blocked
    * behind a global lock — a minutes-long index build must not stall a
    * cache-hit read of an unrelated, already-built artifact. */
  def dir(spark: SparkSession, prefix: String, srcDir: String)
         (build: String => Unit): String =
    built.computeIfAbsent(s"$prefix:$srcDir", _ => {
      val path = scratchPath(prefix, srcDir)
      Fs.delete(spark, path)
      build(path)
      path
    })

  /** The scratch path for (`prefix`, `srcDir`) — sanitized name + hash:
    * sanitization alone can collapse distinct dirs ("/a b" vs "/a_b"),
    * the hash alone can collide — requiring both to match makes an
    * accidental shared path implausible. Package-visible so the spec
    * pins the stale-dir replacement against the REAL path scheme instead
    * of a hand-copied one that rots silently. */
  private[core] def scratchPath(prefix: String, srcDir: String): String =
    System.getProperty("java.io.tmpdir") + "/" + prefix + "_" +
      srcDir.replaceAll("[^A-Za-z0-9._-]", "_") +
      "_" + Integer.toHexString(srcDir.hashCode)
}
