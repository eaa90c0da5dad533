package graft.core

/** Pure kernel functions mirroring the reference semantics
  * (graphite-project/ceres `ceres.py`): timestamp alignment, glob → regex
  * translation, the five aggregation methods, fixed-factor series
  * downsampling, and point-wise series merge.
  *
  * These are the behavioral core ported from the reference's unit-test spec
  * (`tests/test_ceres.py`); the distributed engine re-expresses the same
  * semantics relationally (see graft.operators), and streaming ingest reuses
  * these directly.
  */
object Kernel {

  /** Floor-align a timestamp to a step grid.
    * Reference: `ceres.py` CeresNode.compact (≈L605):
    * `int(timestamp - (timestamp % timeStep))` — Python `%` is floor-mod, so
    * negative timestamps also floor toward -inf. */
  def align(ts: Long, step: Long): Long = {
    require(step > 0, s"step must be positive: $step")
    ts - java.lang.Math.floorMod(ts, step)
  }

  /** Exclusive upper bound alignment used by the read path.
    * Reference: `ceres.py` CeresNode.read (≈L470):
    * `untilTime = untilTime - (untilTime % timeStep) + timeStep` —
    * i.e. round UP one full step past the floor. */
  def alignUntil(ts: Long, step: Long): Long = align(ts, step) + step

  val ValidAggregationMethods: Set[String] =
    Set("average", "sum", "last", "max", "min")

  /** Aggregate known (non-missing) values with one of the five methods.
    * All methods skip missing values; all-missing yields None.
    * Reference: `ceres.py` `def aggregate` (≈L930–950); invalid method raises
    * InvalidAggregationMethod (≈L948). */
  def aggregate(method: String, values: Seq[Option[Double]]): Option[Double] = {
    val known = values.flatten
    if (!ValidAggregationMethods.contains(method))
      throw new IllegalArgumentException(s"Unknown aggregation method: $method")
    if (known.isEmpty) None
    else method match {
      case "average" => Some(known.sum / known.size)
      case "sum"     => Some(known.sum)
      case "last"    => Some(known.last)
      case "max"     => Some(known.max)
      case "min"     => Some(known.min)
    }
  }

  /** Fixed-factor downsample: chunk `values` into groups of
    * `factor = newStep / oldStep` by position and aggregate each chunk.
    * Reference: `ceres.py` `def aggregateSeries` (≈L955–968). On a dense
    * aligned grid, positional chunking is equivalent to time-bucketing. */
  def aggregateSeries(method: String, oldStep: Long, newStep: Long,
                      values: Seq[Option[Double]]): Seq[Option[Double]] = {
    require(newStep >= oldStep && newStep % oldStep == 0,
      s"newStep $newStep must be a multiple of oldStep $oldStep")
    val factor = (newStep / oldStep).toInt
    values.grouped(factor).map(chunk => aggregate(method, chunk)).toSeq
  }

  /** Query result shape. Reference: `ceres.py` class TimeSeriesData
    * (≈L840–890): (start, end, step, values) with lazily-materialized
    * timestamps; always exactly (end-start)/step values. */
  final case class TimeSeriesData(startTime: Long, endTime: Long,
                                  timeStep: Long,
                                  values: IndexedSeq[Option[Double]]) {
    def timestamps: Seq[Long] = startTime until endTime by timeStep
    def points: Seq[(Long, Option[Double])] = timestamps.zip(values)

    /** Point-wise coalesce with self-precedence: fill own None slots from
      * `other` (timestamps aligned to own grid; out-of-range silently
      * skipped). Reference: TimeSeriesData.merge (≈L870–888). */
    def merge(other: TimeSeriesData): TimeSeriesData = {
      val out = values.toArray
      for ((ts, vOpt) <- other.points; v <- vOpt) {
        val aligned = align(ts, timeStep)
        // skip timestamps before our window BEFORE dividing: Long `/`
        // truncates toward zero, so aligned in (start-step, start) would
        // otherwise land on idx 0 and clobber the first slot (the reference
        // early-continues on `timestamp < startTime`).
        if (aligned >= startTime) {
          val idx = Math.floorDiv(aligned - startTime, timeStep)
          if (idx < out.length && out(idx.toInt).isEmpty)
            out(idx.toInt) = Some(v)
        }
      }
      copy(values = out.toIndexedSeq)
    }
  }

  /** Ingest normalization ("compact"): drop missing values, floor-align each
    * timestamp, sort the (alignedTs, value) tuples ascending, overwrite on
    * duplicate aligned timestamps, and split into step-contiguous runs.
    * Reference: `ceres.py` CeresNode.compact (≈L605–650): datapoints are
    * sorted as tuples before the dedup loop, so on a duplicate aligned
    * timestamp the survivor is the one that sorts last — i.e. the MAX value,
    * not ingest order. The relational form (Catalog.points) and the DuckDB
    * oracle implement the same max-value tie-break. */
  def compact(step: Long,
              datapoints: Seq[(Long, Option[Double])]): Seq[Seq[(Long, Double)]] = {
    val cleaned = datapoints.collect { case (ts, Some(v)) => (align(ts, step), v) }
    // tuple sort, then overwrite duplicates: max value per aligned ts wins
    val lastWins = scala.collection.mutable.LinkedHashMap.empty[Long, Double]
    cleaned.sorted.foreach { case (ts, v) => lastWins(ts) = v }
    val sorted = lastWins.toSeq.sortBy(_._1)
    if (sorted.isEmpty) Seq.empty
    else {
      val runs = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer(sorted.head))
      sorted.sliding(2).foreach {
        case Seq((prev, _), cur @ (ts, _)) =>
          if (ts == prev + step) runs.last += cur
          else runs += scala.collection.mutable.ArrayBuffer(cur)
        case _ => ()
      }
      runs.map(_.toSeq).toSeq
    }
  }

  /** Translate a ceres dotted-path glob to an anchored Java regex.
    * Glob matches within one path segment: `*` and `?` must not cross `.`
    * (directory-level glob via Python glob.glob — reference CeresTree.find
    * ≈L210–233). `[seq]` character classes pass through; `{a,b}` braces are
    * NOT supported by the reference and are treated as literals. */
  def globToRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' => sb ++= "[^.]*"
        case '?' => sb ++= "[^.]"
        case '[' =>
          // fnmatch class scan: a ']' immediately after '[' or '[!' is a
          // LITERAL member, not the class terminator (e.g. "[]a]", "[!]a]")
          var k = i + 1
          if (k < glob.length && glob.charAt(k) == '!') k += 1
          if (k < glob.length && glob.charAt(k) == ']') k += 1
          val j = glob.indexOf(']', k)
          if (j < 0) sb ++= "\\["
          else {
            // Python fnmatch negation is `[!seq]` (Java: `[^seq]`); chars
            // special to Java-regex classes but literal in fnmatch classes
            // (']', '\', '^', '[') are escaped; '-' keeps range meaning.
            val inner = glob.substring(i + 1, j)
            val neg = inner.startsWith("!")
            val body = (if (neg) inner.substring(1) else inner).flatMap {
              case ']'  => "\\]"
              case '\\' => "\\\\"
              case '^'  => "\\^"
              case '['  => "\\["
              case c    => c.toString
            }
            sb ++= (if (neg) "[^" else "[") + body + "]"
            i = j
          }
        case '.' => sb ++= "\\."
        case c if "\\^$+(){}|".indexOf(c.toInt) >= 0 => sb ++= ("\\" + c)
        case c => sb += c
      }
      i += 1
    }
    sb += '$'
    sb.toString
  }
}
