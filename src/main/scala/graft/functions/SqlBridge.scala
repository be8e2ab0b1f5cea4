package graft.functions

/** Engine-portability bridges between Spark SQL and the DuckDB oracle
  * dialect — the SINGLE home for the sign-safe division pair that four
  * operator files previously carried as private copies (Stats, Audit,
  * RelationalExt, Learn). A diverging fifth copy-paste of this
  * correctness-critical CASE form is exactly the failure mode this
  * object exists to prevent.
  */
object SqlBridge {

  /** Sign-safe truncating division shared by both engines: Spark's
    * `DIV` truncates toward zero while DuckDB's `//` floors, so they
    * disagree exactly when the numerator is negative. Routing every
    * possibly-negative division through this CASE form makes both
    * engines truncate toward zero. (Spark `DIV` spelled here; the
    * oracle swaps in `//` via [[sdivSql]].)
    */
  def sdiv(x: String, y: String): String =
    s"(CASE WHEN ($x) >= 0 THEN ($x) DIV ($y) ELSE -((-($x)) DIV ($y)) END)"

  /** [[sdiv]] in DuckDB spelling. */
  def sdivSql(x: String, y: String): String =
    s"(CASE WHEN ($x) >= 0 THEN ($x) // ($y) ELSE -((-($x)) // ($y)) END)"
}
