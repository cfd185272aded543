package graft.functions

/** Primitive-loop replication of the engine's exact-decimal summation
  * convention — `sum(cast(<double product> AS DECIMAL(28,12)))` — for the
  * sanctioned mapPartitions / driver-local kernels
  * ([[graft.operators.Similarity.gramMatrixRaw]]'s partition accumulation,
  * the localized PCA power iterations). Spark's double→decimal cast goes
  * through `BigDecimal.valueOf` (the `Double.toString` SHORTEST form) and
  * `setScale(12, HALF_UP)`; a kernel that rounded the raw binary value
  * instead would drift in the last decimal on boundary-straddling
  * products. The fast path here rounds the binary product and falls back
  * to the exact BigDecimal form whenever the scaled value sits within an
  * error band of a half-integer boundary (the band covers the multiply's
  * and the shortest-form's relative error); off-boundary the two
  * roundings provably agree, on-boundary the slow path decides. Sums
  * accumulate in longs of 10⁻¹² units with an exact BigDecimal spill lane
  * on overflow — bit-for-bit the decimal sum Spark computes, in any
  * accumulation order. */
private[graft] object DecimalUnits {
  import java.math.{BigDecimal => JBD, BigInteger, RoundingMode}

  final val Scale = 12

  /** Spark's `cast(p AS DECIMAL(28,12))`: valueOf (shortest form) then
    * HALF_UP at scale 12. Callers must skip NaN/Infinity (the SQL cast
    * yields NULL there, which a SQL sum skips). */
  def castDecimal12(p: Double): JBD =
    JBD.valueOf(p).setScale(Scale, RoundingMode.HALF_UP)

  /** Fast-path [[castDecimal12]] in 10⁻¹² units. `Long.MinValue` is the
    * TAKE-THE-SLOW-PATH sentinel (boundary band, or magnitude past the
    * long range) — never a legitimate result (legit |units| < 8.5e18). */
  def fastUnits(p: Double): Long = {
    val x = p * 1e12
    if (!(math.abs(x) < 8.0e18)) return Long.MinValue // also catches NaN
    val f = math.floor(x)
    val frac = x - f
    val band = math.abs(x) * 5e-16 + 1e-9
    if (math.abs(frac - 0.5) <= band) Long.MinValue
    else if (frac > 0.5) f.toLong + 1L
    else f.toLong
  }

  /** Spark's `round(x, s)` on DOUBLE: NaN/Infinity pass through, finite
    * values behave as BigDecimal.valueOf → setScale(s, HALF_UP) →
    * double. Fast path (the [[fastUnits]] pattern — the d=768 deflation
    * loop calls this per Gram entry per component, and the BigDecimal
    * form alone cost ~180 s of a 305 s rotation fit): compute the
    * half-up integer of `x·10^s` in double arithmetic and divide back —
    * `k` and `10^s` are exactly representable below the 4e15 guard, so
    * `k / 10^s` is the correctly-rounded double of the decimal value,
    * bit-identical to `BigDecimal(k, s).doubleValue()`; within the
    * boundary band (shortest-form vs binary-value ambiguity, same bound
    * as [[fastUnits]]) the exact form decides. */
  def roundDouble(x: Double, s: Int): Double = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) return x
    val scale = math.pow(10.0, s)     // exact for every s the engine uses
    val y = x * scale
    if (math.abs(y) < 4.0e15) {
      val f = math.floor(y)
      val frac = y - f
      val band = math.abs(y) * 5e-16 + 1e-9
      if (math.abs(frac - 0.5) > band)
        return (if (frac > 0.5) f + 1.0 else f) / scale
    }
    JBD.valueOf(x).setScale(s, RoundingMode.HALF_UP).doubleValue()
  }

  /** `n` exact accumulators of `castDecimal12(product)` terms. */
  final class AccArray(n: Int) {
    private val units = new Array[Long](n)
    private var spill: Array[JBD] = null

    /** Add `castDecimal12(p)` to accumulator `k`; NaN/Inf products are
      * skipped (the SQL cast nulls them and the SQL sum drops nulls). */
    def addProduct(k: Int, p: Double): Unit = {
      if (java.lang.Double.isNaN(p) || java.lang.Double.isInfinite(p)) return
      val u = fastUnits(p)
      if (u != Long.MinValue) addUnits(k, u)
      else {
        val bd = castDecimal12(p)
        if (bd.unscaledValue().bitLength() <= 62)
          addUnits(k, bd.unscaledValue().longValue())
        else addDecimal(k, bd)
      }
    }

    def addUnits(k: Int, u: Long): Unit = {
      val s = units(k) + u
      if (((units(k) ^ s) & (u ^ s)) < 0L) { // long overflow: spill exactly
        addDecimal(k, new JBD(BigInteger.valueOf(units(k)), Scale))
        units(k) = u
      } else units(k) = s
    }

    def addDecimal(k: Int, bd: JBD): Unit = {
      if (spill == null) spill = new Array[JBD](n)
      spill(k) = if (spill(k) == null) bd else spill(k).add(bd)
    }

    def unitsAt(k: Int): Long = units(k)
    def spillAt(k: Int): JBD = if (spill == null) null else spill(k)

    /** The exact decimal(…,12) sum at `k`. */
    def result(k: Int): JBD = {
      val base = new JBD(BigInteger.valueOf(units(k)), Scale)
      if (spill != null && spill(k) != null) spill(k).add(base) else base
    }
  }
}
