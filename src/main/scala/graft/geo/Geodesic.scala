package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geodesic (meter) distances for the spatial joins' REFINE step — the
  * VERDICT-r3 gap: `knn`/`withinDistance` rank by planar squared degrees,
  * which away from the equator is not a user-facing distance (1° of
  * longitude at 67°N is ~43 km, not ~111 km).
  *
  * The metric is the haversine great-circle distance with its three
  * transcendental kernels (sin, cos, asin) replaced by FIXED-DEGREE Taylor
  * polynomials in explicit Horner order. Rationale: libm sin/cos are not
  * bit-identical between the JVM and other engines, so a verbatim haversine
  * could not be oracle-checked; a pinned polynomial is pure arithmetic that
  * any engine replays bit-for-bit (the repo-wide exactness contract), while
  * agreeing with true haversine to ~1e-10 relative in the regime the refine
  * metric is used in (pair separations up to ~10°, |lat| ≤ ~80° — the cell
  * index prunes farther pairs before the metric runs; accuracy degrades
  * gracefully beyond, it never NaNs for |Δ| ≤ 180°).
  *
  * All Column formulas here have a character-identical SQL rendering in the
  * oracle (SparkEntry sqlHavT/sqlMeters) — coefficient doubles are shared
  * via Double.toString round-trips.
  */
object Geodesic {

  /** IUGG mean Earth radius, meters (public constant). */
  val EarthRadiusM: Double = 6371008.8

  val DegToRad: Double = math.Pi / 180

  // Taylor coefficients: sin through x^7, cos through x^16, asin through u^9
  val Sin3: Double = -1.0 / 6
  val Sin5: Double = 1.0 / 120
  val Sin7: Double = -1.0 / 5040
  val CosTail: Array[Double] = Array(
    -1.0 / 2, 1.0 / 24, -1.0 / 720, 1.0 / 40320, -1.0 / 3628800,
    1.0 / 479001600.0, -1.0 / 87178291200.0, 1.0 / 20922789888000.0)
  val Asin3: Double = 1.0 / 6
  val Asin5: Double = 3.0 / 40
  val Asin7: Double = 15.0 / 336
  val Asin9: Double = 105.0 / 3456

  /** sin(x) ≈ x·(1 + x²·(S3 + x²·(S5 + x²·S7))) — odd, exact Horner order. */
  def sinP(x: Column): Column = {
    val x2 = x * x
    x * (lit(1.0) + x2 * (lit(Sin3) + x2 * (lit(Sin5) + x2 * lit(Sin7))))
  }

  def sinP(x: Double): Double = {
    val x2 = x * x
    x * (1.0 + x2 * (Sin3 + x2 * (Sin5 + x2 * Sin7)))
  }

  /** cos(x) ≈ 1 + x²·(C2 + x²·(C4 + … )) through x^16 — even. */
  def cosP(x: Column): Column = {
    val x2 = x * x
    lit(1.0) + x2 * CosTail.reverse.foldLeft(null: Column) { (acc, c) =>
      if (acc == null) lit(c) else lit(c) + x2 * acc
    }
  }

  def cosP(x: Double): Double = {
    val x2 = x * x
    var acc = CosTail.last
    var i = CosTail.length - 2
    while (i >= 0) { acc = CosTail(i) + x2 * acc; i -= 1 }
    1.0 + x2 * acc
  }

  /** asin(u) ≈ u·(1 + u²·(A3 + u²·(A5 + u²·(A7 + u²·A9)))). */
  def asinP(u: Column): Column = {
    val u2 = u * u
    u * (lit(1.0) + u2 * (lit(Asin3) + u2 * (lit(Asin5) + u2 * (lit(Asin7) + u2 * lit(Asin9)))))
  }

  def asinP(u: Double): Double = {
    val u2 = u * u
    u * (1.0 + u2 * (Asin3 + u2 * (Asin5 + u2 * (Asin7 + u2 * Asin9))))
  }

  /** Haversine term t = sinP(Δφᵣ/2)² + cosP(φ₁ᵣ)·cosP(φ₂ᵣ)·sinP(Δλᵣ/2)² —
    * MONOTONE with great-circle distance, so ranking (kNN order, radius
    * tests) runs on t and the asin/√ conversion applies only on emit.
    */
  def havT(plng: Column, plat: Column, tlng: Column, tlat: Column): Column = {
    val dphi = (tlat - plat) * lit(DegToRad) * lit(0.5)
    val dlmb = (tlng - plng) * lit(DegToRad) * lit(0.5)
    val sp = sinP(dphi); val sl = sinP(dlmb)
    sp * sp + cosP(plat * lit(DegToRad)) * cosP(tlat * lit(DegToRad)) * sl * sl
  }

  def havT(plng: Double, plat: Double, tlng: Double, tlat: Double): Double = {
    val dphi = (tlat - plat) * DegToRad * 0.5
    val dlmb = (tlng - plng) * DegToRad * 0.5
    val sp = sinP(dphi); val sl = sinP(dlmb)
    sp * sp + cosP(plat * DegToRad) * cosP(tlat * DegToRad) * sl * sl
  }

  /** Meters from the haversine term: 2R·asinP(√t). */
  def metersFromT(t: Column): Column =
    lit(2.0 * EarthRadiusM) * asinP(sqrt(t))

  def metersFromT(t: Double): Double =
    2.0 * EarthRadiusM * asinP(math.sqrt(t))

  /** SAFE lower bound of t for any pair at planar degree distance ≥ d with
    * both |lat| ≤ φcap: from sin(x) ≥ (2/π)x on [0, π/2] and cosφ ≥ cos φcap,
    * t ≥ (cos(φcap)·d/180)². The 0.99 margin absorbs the ≤1e-10 relative
    * polynomial error, keeping the kNN settle test conservative.
    */
  def tLowerBound(degDist: Double, phiCapDeg: Double): Double = {
    val c = math.cos(math.min(math.abs(phiCapDeg), 89.99) * DegToRad)
    val b = 0.99 * c * degDist / 180.0
    b * b
  }

  /** SAFE planar-degree radius covering all pairs within `meters` at
    * |lat| ≤ φcap: for central angle θ = m/R, Δlat ≤ θdeg and Δlng ≲
    * θdeg/cos φcap, so the Euclidean degree distance is ≤ θdeg·√(1+1/cos²),
    * padded 5% for the small-angle curvature slack. Used by the geodesic
    * within-distance cover (a superset cover — the exact t refine follows).
    */
  def coverDegreesFor(meters: Double, phiCapDeg: Double): Double = {
    val c = math.cos(math.min(math.abs(phiCapDeg), 89.99) * DegToRad)
    1.05 * (meters / EarthRadiusM) / DegToRad * math.sqrt(1.0 + 1.0 / (c * c))
  }
}
