package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Shared operator-level helpers. */
package object operators {

  /** Engine-standard 6-decimal DISPLAY quantization for oracle-compared
    * columns: `floor(x * 1e6 + 0.5) / 1e6`.
    *
    * Why not `round(x, 6)`: Spark rounds the value's SHORTEST DECIMAL
    * representation (`BigDecimal(double.toString)`, HALF_UP) while DuckDB
    * rounds the binary double directly — the two disagree exactly when the
    * shortest decimal representation lands on a half-boundary (e.g.
    * `-16.3762135`), which integer ratios with arbitrary denominators hit
    * on real data. `floor(x·1e6 + 0.5) / 1e6` is one IEEE op chain that
    * both engines evaluate bit-identically (Spark's `floor` yields LONG,
    * DuckDB's DOUBLE, but the quotient `k / 1e6` is the same correctly-
    * rounded double either way), so parity cannot depend on fixture luck.
    * Every `oracleSql` mirror uses the literal SQL
    * `floor((x) * 1e6 + 0.5) / 1e6`; `scripts/round_close.py` carries a
    * rail forbidding new `round(…, 6)` in registered-face source.
    *
    * Note the convention is half-UP toward +∞ (not half-away-from-zero)
    * for negative values — fine for display, identical in both engines. */
  def q6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
}
