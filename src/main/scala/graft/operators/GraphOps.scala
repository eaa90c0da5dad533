package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Catalog

/** Shared graph machinery for the dedup pipelines: near-dup PAIR lists
  * (text or embedding side) closed into connected components, so keeper
  * selection operates on whole duplicate groups rather than edges. */
object GraphOps {

  /** Connected components by alternating LARGE-STAR / SMALL-STAR rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC 2014): cluster label = the minimum id in the component (which
    * IS the keeper under the engine's min-id keeper rule).
    *
    * `pairs` is any two-column (idA, idB) DataFrame of undirected edges
    * between DISTINCT ids (self-loops are dropped); output is one
    * (id, label) row per node appearing in an edge.
    *
    * Why star-contraction and not min-label propagation: label
    * propagation (like GraphX's Pregel CC) needs O(component diameter)
    * rounds — a templated-boilerplate duplicate CHAIN of length d costs d
    * rounds, so any fixed round budget turns a long chain into a query
    * failure. Star rounds contract the graph itself: each round every
    * node re-attaches its neighborhood to the neighborhood minimum
    * (large-star moves the larger neighbors, small-star the smaller),
    * which at least halves tree heights per round pair — convergence in
    * O(log n) rounds REGARDLESS of diameter. A 2^25-node path converges
    * inside the registered 25-round budget; the adversarial chain spec
    * pins a 200-diameter chain well inside it.
    *
    * Per round, each star op is one map-side-combinable min aggregation
    * plus one join back to the edge list; the round's edge tables are
    * `localCheckpoint`ed so (a) no subtree is consumed twice un-
    * materialized (the DAG-split reuse trap: the groupBy and the join
    * both read the edge list) and (b) the logical plan does not grow
    * with iterations (the iterative-DataFrame lineage explosion — the
    * driver dies on plan trees, not data). Convergence = the canonical
    * (hi, lo) edge set is unchanged by a full round, probed with ONE
    * symmetric-difference existence check (full-outer join on the edge
    * key, `limit(1)` on either-side-missing — one Spark job per round
    * where two directional anti-joins would cost two); at the fixpoint
    * the edge set is exactly the min-rooted stars. `maxIters` stays a SAFETY RAIL,
    * not a tuning knob — exhausting it throws rather than returning
    * silently-unconverged labels. The converged table is session-cached
    * under `cacheKey` — built once, every consumer reads the
    * materialized labels (the feature-table contract the shingle and
    * LSH indexes follow). */
  def connectedComponents(spark: SparkSession, pairs: DataFrame,
                          cacheKey: String, maxIters: Int = 50): DataFrame =
    Catalog.appCached(spark, s"components:$cacheKey") {
      val Array(ca, cb) = pairs.columns
      // canonical undirected edge set: (hi, lo) with hi > lo, deduped
      var cur = pairs
        .select(greatest(col(ca), col(cb)).as("hi"),
          least(col(ca), col(cb)).as("lo"))
        .where(col("hi") =!= col("lo"))
        .distinct()
        .localCheckpoint(true)
      var iter = 0
      var done = false
      while (!done && iter < maxIters) {
        // ---- large-star: ∀u, attach the LARGER neighbors of u to
        // m = min(Γ(u) ∪ {u}). Emitted edges (v, m) have v > u ≥ m, so
        // they are already canonical. Connectivity-preserving; every
        // node survives (as m of its own star or via a smaller
        // neighbor's emission).
        val nbrs = cur.select(col("hi").as("u"), col("lo").as("v"))
          .unionByName(cur.select(col("lo").as("u"), col("hi").as("v")))
        val mins = nbrs.groupBy("u")
          .agg(least(min(col("v")), col("u")).as("m"))
        val large = nbrs.join(mins, "u")
          .where(col("v") > col("u"))
          .select(col("v").as("hi"), col("m").as("lo"))
          .distinct()
          .localCheckpoint(true) // consumed by BOTH small-star's agg and join
        // ---- small-star: ∀u, attach the SMALLER neighbors of u (and u
        // itself) to m = min of them. Edges are canonical (hi, lo), so
        // Γ<(hi) is exactly the lo side and m = min(lo) < hi.
        val smins = large.groupBy("hi").agg(min(col("lo")).as("m"))
        val small = large.join(smins, "hi")
          .where(col("lo") =!= col("m"))
          .select(col("lo").as("hi"), col("m").as("lo")) // lo > m holds
          .unionByName(smins.select(col("hi"), col("m").as("lo")))
          .distinct()
          .localCheckpoint(true)
        done = small.withColumn("inNew", lit(1))
          .join(cur.withColumn("inOld", lit(1)), Seq("hi", "lo"), "full_outer")
          .where(col("inNew").isNull || col("inOld").isNull)
          .limit(1).count() == 0
        cur = small
        iter += 1
      }
      if (!done) throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIters rounds " +
          "(safety rail; star contraction needs O(log n) rounds)")
      // fixpoint = min-rooted stars: every non-root appears exactly once
      // as hi with its root as lo; roots are the distinct lo values.
      cur.select(col("hi").as("id"), col("lo").as("label"))
        .unionByName(
          cur.select(col("lo").as("id"), col("lo").as("label")).distinct())
    }

  /** Components rolled up to one row per cluster: (cluster id = min
    * member id, member count). */
  def clusterSizes(labels: DataFrame, countName: String): DataFrame =
    labels
      .groupBy(col("label").as("cluster_id"))
      .agg(count(lit(1)).as(countName))
      .orderBy("cluster_id")
}
