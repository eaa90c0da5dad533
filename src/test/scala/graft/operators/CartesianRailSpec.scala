package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import graft.{SparkEntry, SparkTestBase}

/** Registry-wide CARTESIAN rail: no registered query may PLAN a
  * `CartesianProductExec` — the one join shape that is quadratic in
  * bytes shuffled and cannot be saved by AQE at 100 TB. The engine's
  * legitimate `crossJoin` sites are all against broadcast one-row
  * aggregates (corpus totals, thresholds, probe cells), which Spark
  * plans as BroadcastNestedLoopJoin with the O(1)-row side broadcast —
  * those pass; an accidental large×large cross join (a dropped join
  * key, a typo'd condition) plans CartesianProductExec and fails here
  * by NAME before it can ever reach a cluster. Plan-only: nothing is
  * executed, so the sweep stays cheap while covering every key
  * (StorePruneRailSpec carries the executed-plan sweep). */
class CartesianRailSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import SparkTestBase.Sf0001

  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val children = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case im: InMemoryTableScanExec => Seq(im.relation.cachedPlan)
      case other => other.children
    }
    (p +: children.flatMap(nodes)) ++ p.subqueries.flatMap(nodes)
  }

  test("no registered query plans a CartesianProduct") {
    // vacuity guard: the detector must flag a genuinely cartesian plan
    // (the replicate-NL hint forces CartesianProductExec regardless of
    // the broadcast threshold) or the rail is noise
    val probe = spark.range(3)
      .join(spark.range(4).hint("shuffle_replicate_nl"))
    assert(nodes(probe.queryExecution.executedPlan)
      .exists(_.isInstanceOf[CartesianProductExec]),
      "vacuity guard: probe cartesian not detected — traversal broke")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .flatMap { case (name, fn) =>
        nodes(fn(spark, Sf0001).queryExecution.executedPlan)
          .collect { case c: CartesianProductExec =>
            s"$name plans ${c.nodeName}" }
      }
    assert(offenders.isEmpty,
      "cartesian product(s) in registered plans:\n" +
        offenders.mkString("\n"))
  }
}
