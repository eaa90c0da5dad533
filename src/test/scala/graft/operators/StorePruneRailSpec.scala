package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import graft.{SparkEntry, SparkTestBase}

/** The partition-pruning rail for the WHOLE registered query surface
  * (r13-VERDICT item 7): no query may scan a SELECTIVE-LAYOUT store —
  * a parquet location partitioned by the engine's pruning keys
  * (`pb`/`pd` for the points store, `cid` for the IVF cell store) —
  * without partition filters reaching the scan.
  *
  * Those layouts exist for exactly one reason: at 100 TB a read that
  * opens every `pb=`/`cid=` directory is the difference between a
  * bounded-I/O query and a full-store pass. The individual PlanSpec /
  * IngestSpec pins prove today's faces prune; this rail makes the NEXT
  * store face fail CI if it ships unpruned — the same whole-registry
  * contract as BroadcastRailSpec.
  *
  * `batch_id`-partitioned INDEX tables are deliberately outside the
  * key set: ingest batching is a write-side idempotency layout, and
  * index serving reads every closed batch by design (the compacted
  * table IS the scan). Declared full-pass faces over selective layouts
  * — the maintenance walks, which by contract visit every partition —
  * are exempted by name with the reason pinned here.
  */
class StorePruneRailSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import SparkTestBase.Sf0001

  /** Every file scan in the executed tree — descending into adaptive
    * stages and cached-relation build plans (feature-table caches are
    * where store scans hide), plus subqueries. */
  private def fileScans(p: SparkPlan): Seq[FileSourceScanExec] = {
    val here = p match {
      case f: FileSourceScanExec => Seq(f)
      case _ => Seq.empty
    }
    val children = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case im: InMemoryTableScanExec => Seq(im.relation.cachedPlan)
      case other => other.children
    }
    here ++ children.flatMap(fileScans) ++ p.subqueries.flatMap(fileScans)
  }

  /** The engine's selective pruning keys: (pb, pd) = (metric-bucket,
    * date) on the points store, cid = quantizer cell on the IVF store. */
  private val PruneKeys = Set("pb", "pd", "cid")

  /** Full-pass faces: registered queries that by CONTRACT visit every
    * partition of a selective layout. Each entry needs a reason — an
    * unexplained addition here is the rail being silenced, not obeyed. */
  private val FullPass: Map[String, String] = Map(
    // maintenance walks the whole store by definition: rollup/retention
    // visit every (pb, pd) partition exactly once per pass
    "maintenance_cascade" -> "store-wide rollup/retention pass",
    "maintenance_per_node" -> "store-wide per-node retention pass"
  )

  test("every selective-layout store scan in the registry is partition-pruned") {
    var prunedSeen = Set.empty[String]
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .flatMap { case (name, fn) =>
        val df = fn(spark, Sf0001)
        df.collect()
        val sel = fileScans(df.queryExecution.executedPlan)
          .filter(_.relation.partitionSchema.fieldNames.exists(PruneKeys))
        if (sel.exists(_.partitionFilters.nonEmpty)) prunedSeen += name
        if (FullPass.contains(name)) Seq.empty
        else sel.filter(_.partitionFilters.isEmpty).map { s =>
          val path = s.relation.location.rootPaths.headOption
            .map(_.toString).getOrElse("?")
          s"$name: unpruned scan of selective layout $path " +
            s"(partitions: ${s.relation.partitionSchema.fieldNames.mkString(",")})"
        }
      }
    // vacuity guard: the store faces carry pruned selective scans today
    // (fetch/densify/pattern over (pb, pd); IVF top-k over cid=) — if
    // the sweep stopped seeing ANY, the rail went blind, not clean
    assert(prunedSeen.size >= 3,
      s"rail saw pruned selective-layout scans only in $prunedSeen — " +
        "traversal or layout naming changed out from under it")
    assert(offenders.isEmpty,
      "selective-layout store scan(s) without partition filters:\n" +
        offenders.mkString("\n"))
  }
}
