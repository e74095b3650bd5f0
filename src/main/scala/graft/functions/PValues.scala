package graft.functions

/** Shared normal-tail p-value formula (round 15), emitted as ONE SQL
  * text used verbatim by BOTH engines — Spark via `expr(...)`, DuckDB
  * via string interpolation into the oracle — so the approximation
  * error is definitionally identical on both sides and the cross-
  * engine hash compare never rests on two different CDF
  * implementations (neither Spark nor DuckDB ships erf).
  *
  * Φ tail via Abramowitz & Stegun 26.2.17 (|ε| < 7.5e-8): with
  * t = 1/(1 + 0.2316419·|z|),
  *   1 − Φ(|z|) ≈ φ(|z|) · t·(b1 + t·(b2 + t·(b3 + t·(b4 + t·b5))))
  * and the two-sided p-value is twice that. φ's 1/√(2π) is inlined as
  * the shortest-roundtrip double literal so both engines parse the
  * identical bits. Inputs are expected PRE-ROUNDED (round(z, 6)) so
  * upstream last-ulp drift cannot reach the polynomial.
  */
object PValues {

  /** SQL text for the two-sided normal p-value of expression `z`.
    * Every literal is CAST AS DOUBLE so the whole chain is pure IEEE
    * Horner — bare decimal literals would pull stages into DECIMAL
    * arithmetic with engine-specific scale rules (and would diverge
    * from the Scala twin in streaming/SrmMonitor, which is spec-pinned
    * bit-identical to this text). */
  def twoSidedP(z: String): String = {
    def d(x: String) = s"CAST($x AS DOUBLE)"
    val t = s"(${d("1.0")} / (${d("1.0")} + ${d("0.2316419")} * abs($z)))"
    val poly = s"($t * (${d("0.31938153")} + $t * (${d("-0.356563782")}" +
      s" + $t * (${d("1.781477937")} + $t * (${d("-1.821255978")}" +
      s" + $t * ${d("1.330274429")})))))"
    // least() clamps the ≤7.5e-8 approximation overshoot at z≈0
    // (where 2·(1−Φ) brushes 1.0) so consumers can rely on p ∈ [0,1]
    s"least(${d("1.0")}, ${d("2.0")} * exp(-($z) * ($z) / ${d("2.0")})" +
      s" * ${d("0.3989422804014327")} * $poly)"
  }
}
