package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * One `queries` entry per implemented operator from SURVEY.md §2; each has a
  * DuckDB-equivalent `oracleSql` (column names and types matched exactly;
  * every query imposes a total ORDER BY for deterministic comparison).
  */
object SparkEntry {

  /** Shared oracle preamble: the compacted points table (SURVEY §2.6
    * `compact_dedup` semantics) as a DuckDB CTE. Must stay semantically
    * identical to [[graft.core.Catalog.points]]: epoch-second floor from
    * nanosecond timestamps, hour alignment, last-wins by event_id. */
  private val PtsCte: String =
    """WITH pts AS (
      |  SELECT metric, ts, arg_max(value, event_id) AS value FROM (
      |    SELECT 'events.' || event_type AS metric,
      |           s - (s % 3600) AS ts, value, event_id
      |    FROM (SELECT epoch_ns(ts) // 1000000000 AS s, * FROM events)
      |    WHERE value IS NOT NULL
      |  ) GROUP BY metric, ts
      |)""".stripMargin

  /** Flagship query on sf=0.001: dense hourly grid of events.purchase over
    * [2024-01-05, 2024-01-12) — scan, align, last-wins compact, grid join. */
  def entry(spark: SparkSession): DataFrame =
    SeriesOps.densifyGrid(spark, "/root/testdata/sf0.001",
      "events.purchase", SeriesOps.From, SeriesOps.Until)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // —— §2.1 scans / catalog ——
    "walk_tree" -> ((s, d) => SeriesOps.walkTree(s, d)),
    "find_glob" -> ((s, d) => SeriesOps.findGlob(s, d, "events.*r*")),
    "has_node" -> ((s, d) => SeriesOps.hasNode(s, d, "events.purchase")),
    "slice_info" -> ((s, d) => SeriesOps.sliceInfo(s, d)),
    // —— §2.2 read path ——
    "fetch_range" -> ((s, d) => SeriesOps.fetchRange(s, d, "events.purchase",
      SeriesOps.From, SeriesOps.Until)),
    "densify_grid" -> ((s, d) => SeriesOps.densifyGrid(s, d, "events.purchase",
      SeriesOps.From, SeriesOps.Until)),
    "has_data_interval" -> ((s, d) => SeriesOps.hasDataInterval(s, d,
      "events.error", SeriesOps.From, SeriesOps.Until)),
    // —— §2.3 aggregations ——
    "agg_average" -> ((s, d) => SeriesOps.aggRange(s, d, "average")),
    "agg_sum" -> ((s, d) => SeriesOps.aggRange(s, d, "sum")),
    "agg_min" -> ((s, d) => SeriesOps.aggRange(s, d, "min")),
    "agg_max" -> ((s, d) => SeriesOps.aggRange(s, d, "max")),
    "agg_last" -> ((s, d) => SeriesOps.aggRange(s, d, "last")),
    "aggregate_series" -> ((s, d) => SeriesOps.aggregateSeriesDf(s, d,
      "events.click", "average", 14400L)),
    // —— §2.4 merge ——
    "merge_series" -> ((s, d) => SeriesOps.mergeSeries(s, d,
      "events.click", "events.view", SeriesOps.From, SeriesOps.Until)),
    // —— §2.6 write path (batch shape) ——
    "compact_dedup" -> ((s, d) => SeriesOps.compactDedup(s, d)),
    // —— §2.7 maintenance ——
    "xff_rollup" -> ((s, d) => SeriesOps.xffRollup(s, d, 86400L)),
    "retention_delete" -> ((s, d) => SeriesOps.retentionDelete(s, d, 1705276800L))
  )

  def oracleSql: Map[String, String] = Map(
    "walk_tree" ->
      s"$PtsCte SELECT DISTINCT metric FROM pts ORDER BY metric",
    "find_glob" ->
      s"""$PtsCte SELECT DISTINCT metric FROM pts
         | WHERE regexp_matches(metric, '^events\\.[^.]*r[^.]*$$')
         | ORDER BY metric""".stripMargin,
    "has_node" ->
      s"""$PtsCte SELECT count(*) > 0 AS has_node FROM pts
         | WHERE metric = 'events.purchase'""".stripMargin,
    "slice_info" ->
      s"""$PtsCte SELECT metric, CAST(3600 AS BIGINT) AS step,
         |   min(ts) AS start_ts, max(ts) + 3600 AS end_ts,
         |   count(*) AS npoints
         | FROM pts GROUP BY metric ORDER BY metric""".stripMargin,
    "fetch_range" ->
      s"""$PtsCte SELECT ts, value FROM pts
         | WHERE metric = 'events.purchase' AND ts >= 1704412800 AND ts < 1705017600
         | ORDER BY ts""".stripMargin,
    "densify_grid" ->
      s"""$PtsCte SELECT g.ts, p.value
         | FROM (SELECT ts FROM range(1704412800, 1705017600, 3600) t(ts)) g
         | LEFT JOIN (SELECT ts, value FROM pts WHERE metric = 'events.purchase') p
         |   USING (ts)
         | ORDER BY ts""".stripMargin,
    "has_data_interval" ->
      s"""$PtsCte SELECT (min(ts) < 1705017600 AND max(ts) + 3600 > 1704412800)
         |   AS has_data
         | FROM pts WHERE metric = 'events.error'""".stripMargin,
    "agg_average" ->
      s"""$PtsCte SELECT metric, round(avg(value), 6) AS agg_value FROM pts
         | WHERE ts >= 1704412800 AND ts < 1705017600
         | GROUP BY metric ORDER BY metric""".stripMargin,
    "agg_sum" ->
      s"""$PtsCte SELECT metric, round(sum(value), 6) AS agg_value FROM pts
         | WHERE ts >= 1704412800 AND ts < 1705017600
         | GROUP BY metric ORDER BY metric""".stripMargin,
    "agg_min" ->
      s"""$PtsCte SELECT metric, min(value) AS agg_value FROM pts
         | WHERE ts >= 1704412800 AND ts < 1705017600
         | GROUP BY metric ORDER BY metric""".stripMargin,
    "agg_max" ->
      s"""$PtsCte SELECT metric, max(value) AS agg_value FROM pts
         | WHERE ts >= 1704412800 AND ts < 1705017600
         | GROUP BY metric ORDER BY metric""".stripMargin,
    "agg_last" ->
      s"""$PtsCte SELECT metric, arg_max(value, ts) AS agg_value FROM pts
         | WHERE ts >= 1704412800 AND ts < 1705017600
         | GROUP BY metric ORDER BY metric""".stripMargin,
    "aggregate_series" ->
      s"""$PtsCte SELECT ts - (ts % 14400) AS ts, round(avg(value), 6) AS value
         | FROM pts
         | WHERE metric = 'events.click' AND ts >= 1704412800 AND ts < 1705017600
         | GROUP BY ts - (ts % 14400) ORDER BY ts""".stripMargin,
    "merge_series" ->
      s"""$PtsCte SELECT g.ts, coalesce(a.value, b.value) AS value
         | FROM (SELECT ts FROM range(1704412800, 1705017600, 3600) t(ts)) g
         | LEFT JOIN (SELECT ts, value FROM pts WHERE metric = 'events.click') a
         |   USING (ts)
         | LEFT JOIN (SELECT ts, value FROM pts WHERE metric = 'events.view') b
         |   USING (ts)
         | ORDER BY g.ts""".stripMargin,
    "compact_dedup" ->
      s"$PtsCte SELECT metric, ts, value FROM pts ORDER BY metric, ts",
    "xff_rollup" ->
      s"""$PtsCte, meta(metric, method, xff) AS (VALUES
         |   ('events.click', 'average', 0.5), ('events.error', 'max', 0.5),
         |   ('events.purchase', 'sum', 0.5), ('events.signup', 'last', 0.5),
         |   ('events.view', 'average', 0.5))
         | SELECT metric, ts, value, known FROM (
         |   SELECT p.metric, p.ts - (p.ts % 86400) AS ts,
         |          count(p.value) AS known,
         |          CASE any_value(m.method)
         |            WHEN 'average' THEN round(avg(p.value), 6)
         |            WHEN 'sum' THEN round(sum(p.value), 6)
         |            WHEN 'min' THEN min(p.value)
         |            WHEN 'max' THEN max(p.value)
         |            ELSE arg_max(p.value, p.ts) END AS value,
         |          any_value(m.xff) AS xff
         |   FROM pts p JOIN meta m ON p.metric = m.metric
         |   GROUP BY p.metric, p.ts - (p.ts % 86400)
         | ) WHERE known / 24.0 >= xff
         | ORDER BY metric, ts""".stripMargin,
    "retention_delete" ->
      s"""$PtsCte SELECT metric, count(*) AS surviving, min(ts) AS min_ts
         | FROM pts WHERE ts >= 1705276800
         | GROUP BY metric ORDER BY metric""".stripMargin
  )
}
