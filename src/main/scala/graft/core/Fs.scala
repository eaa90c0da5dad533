package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Filesystem probes routed through the Hadoop FileSystem API, so store
  * and metadata directories work on ANY filesystem Spark can read —
  * local paths in the harness, object stores (`s3a://`, `gs://`, HDFS)
  * in production. `java.io.File` silently reports every non-local URI
  * as absent, which turns a populated remote MetaStore into an
  * apparently-empty one. */
object Fs {

  /** Does `path` exist on its own filesystem (resolved from the path's
    * scheme against the session's Hadoop conf)? */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** Recursively delete `path` if present (idempotent — absent is fine). */
  def delete(spark: SparkSession, path: String): Unit = {
    val p = new Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
  }
}
