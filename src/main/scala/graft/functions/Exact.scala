package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers for hash-comparable outputs.
  *
  * Floating-point *aggregates* (sum/avg/stddev over doubles) are not
  * reproducible across engines or even across partitionings of the same
  * engine, because FP addition is non-associative. The reference never
  * had to care (it compared nothing bit-for-bit); our correctness gate
  * hash-compares against a DuckDB oracle (BASELINE.md), so every
  * aggregated numeric is first quantized to an exact integer unit
  * (cents / milli / micro). Integer sums are exact in both engines and
  * independent of partitioning; per-row double expressions (a single
  * chain of IEEE ops on identical inputs) are bit-identical between
  * Spark and DuckDB, so a final division back to a double is safe.
  */
object Exact {

  /** Money column -> exact integer cents. Round *before* the cast:
    * Spark's cast(double->long) truncates while DuckDB's rounds, but on
    * an already-integral double they agree. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Quantize to 1e-3 units (safe for sums of squares up to ~9e15). */
  def milli(c: Column): Column = round(c * 1000).cast("long")

  /** Quantize to 1e-6 units. */
  def micro(c: Column): Column = round(c * 1000000).cast("long")

  /** Round a per-row double to 6 decimals, via integer micro-units.
    * NOT `round(c, 6)`: Spark rounds the shortest decimal repr of the
    * double (BigDecimal HALF_UP) while DuckDB rounds `x*1e6` in binary
    * — they disagree on half-way points. `round(x*1e6)::long / 1e6`
    * is computed identically by both engines (oracle side:
    * `CAST(round(x*1e6) AS BIGINT)/1e6`). */
  def r6(c: Column): Column = round(c * 1e6).cast("long") / 1e6
}
