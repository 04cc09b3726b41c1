package graft.functions

/** The closed-form least-squares pieces shared by every
  * aggregate-only regression in the suite (q137 grouped OLS, q153
  * power-law fit): given the five combinable integer moments as
  * columns named `n, sx, sy, sxy, sxx` (with the products already
  * accumulated in DECIMAL(38,0) — n·Σxy overflows a long at sf1),
  * the slope numerator/denominator as exact integers, spelled once
  * for Spark and once for the DuckDB oracle so the two regressions
  * can never drift apart. The final slope/intercept is a scalar
  * double division of these exact integers (r6-quantized at the
  * call site).
  */
object Fit {

  /** Spark SQL: nΣxy − ΣxΣy in DECIMAL(38,0). */
  val num = "CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy"

  /** Spark SQL: nΣx² − (Σx)² in DECIMAL(38,0). */
  val den = "CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"

  /** DuckDB: the same numerator in HUGEINT. */
  val sqlNum = "CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy"

  /** DuckDB: the same denominator in HUGEINT. */
  val sqlDen = "CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx"
}
