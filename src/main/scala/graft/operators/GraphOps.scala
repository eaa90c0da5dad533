package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Catalog

/** Shared graph machinery for the dedup pipelines: near-dup PAIR lists
  * (text or embedding side) closed into connected components, so keeper
  * selection operates on whole duplicate groups rather than edges. */
object GraphOps {

  /** Connected components by minimum-label propagation + pointer jumping
    * to fixpoint: cluster label = the minimum id reachable (which IS the
    * keeper under the engine's min-id keeper rule).
    *
    * `pairs` is any two-column (idA, idB) DataFrame of undirected edges;
    * output is one (id, label) row per node appearing in an edge.
    *
    * Per round: (1) every node takes the min of its own and its
    * neighbors' labels — one join + one map-side-combinable min
    * aggregation; (2) a pointer jump (label ← label's label), a chain
    * compressor that often shortcuts but does NOT change the worst-case
    * bound: like GraphX's Pregel connected components, convergence is
    * O(component diameter) rounds (a path whose running min is a local
    * min defeats the jump). `maxIters` is therefore a SAFETY RAIL, not a
    * tuning knob — exhausting it throws rather than returning
    * silently-unconverged labels (a correctness bug the adversarial
    * chain test exists to catch). The driver loop is over iterations,
    * never rows; each round's label table is `localCheckpoint`ed —
    * persist alone leaves the logical plan growing ~3x per round (the
    * iterative-DataFrame lineage explosion: the driver dies on plan
    * trees, not data) — and the convergence probe is a `limit(1)`
    * existence check. The converged table is session-cached under
    * `cacheKey` — built once, every consumer reads the materialized
    * labels (the feature-table contract the shingle and LSH indexes
    * follow). */
  def connectedComponents(spark: SparkSession, pairs: DataFrame,
                          cacheKey: String, maxIters: Int = 500): DataFrame =
    Catalog.appCached(spark, s"components:$cacheKey") {
      val Array(ca, cb) = pairs.columns
      val edges = pairs
        .select(col(ca).as("src"), col(cb).as("dst"))
        .unionByName(pairs.select(col(cb).as("src"), col(ca).as("dst")))
        .localCheckpoint(true)
      var cur = edges.select(col("src").as("id")).distinct()
        .withColumn("label", col("id"))
        .localCheckpoint(true)
      var iter = 0
      var done = false
      while (!done && iter < maxIters) {
        val neigh = edges
          .join(cur.withColumnRenamed("id", "dst"), "dst")
          .groupBy(col("src").as("id"))
          .agg(min("label").as("nlabel"))
        val stepped = cur.join(neigh, Seq("id"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        // pointer jump: every label value is itself a node id, so the
        // self-join is total
        val next = stepped.as("x")
          .join(stepped.select(col("id").as("label"), col("label").as("ll")),
            "label")
          .select(col("id"), col("ll").as("label"))
          .localCheckpoint(true)
        done = next
          .join(cur.select(col("id"), col("label").as("old")), "id")
          .where(col("label") =!= col("old"))
          .limit(1).count() == 0
        cur = next
        iter += 1
      }
      if (!done) throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIters rounds " +
          "(component diameter exceeds the safety rail)")
      cur
    }

  /** Components rolled up to one row per cluster: (cluster id = min
    * member id, member count). */
  def clusterSizes(labels: DataFrame, countName: String): DataFrame =
    labels
      .groupBy(col("label").as("cluster_id"))
      .agg(count(lit(1)).as(countName))
      .orderBy("cluster_id")
}
