package graft.ta

/** Hilbert-transform / MESA cycle indicators (SURVEY.md §2.4) + MAMA.
  *
  * One shared state machine ports reference `src/talib/cycle.rs:9-448`:
  * 4-3-2-1 WMA smoother (calc_smooth :462-470), 7-tap Hilbert FIR with
  * coefficients ±0.0962/±0.5769 and adj = 0.075·period + 0.54, quadrature
  * demodulation with 0.2/0.8 smoothing, period clamped to
  * [0.67, 1.5]×previous then [6, 50]. Outputs start at index 31 (32-bar
  * warmup); series shorter than 32 → all null (cycle.rs:16-17).
  *
  * `mesa` emits every per-family output in a SINGLE pass so all six HT_*
  * ops (and MAMA/FAMA, which share the phase machinery — overlap.rs:155-177,
  * kernel absent from the snapshot; standard Ehlers definition) cost one
  * series traversal. Inputs are assumed null-free per series (the reference
  * kernels require the same; cont_slice fails on nulls).
  */
object Cycle {
  private val NA = Double.NaN

  /** Output row indices in the result of [[mesa]]. */
  val DCPERIOD = 0; val DCPHASE = 1; val INPHASE = 2; val QUADRATURE = 3
  val SINE = 4; val LEADSINE = 5; val TRENDLINE = 6; val TRENDMODE = 7
  val MAMA = 8; val FAMA = 9

  /** Runs the MESA machine; returns 10 aligned output arrays. */
  def mesa(x: Array[Double], fastLimit: Double = 0.5, slowLimit: Double = 0.05)
      : Array[Array[Double]] = {
    val n = x.length
    val out = Array.fill(10)(Array.fill(n)(NA))
    if (n < 32) return out

    // calc_smooth (cycle.rs:462-470): zeros before index 3, like the reference
    val smooth = new Array[Double](n)
    var k = 3
    while (k < n) {
      smooth(k) = (4.0 * x(k) + 3.0 * x(k - 1) + 2.0 * x(k - 2) + x(k - 3)) * 0.1
      k += 1
    }

    val detrend = new Array[Double](7)
    val q1 = new Array[Double](7)
    val i1 = new Array[Double](7)
    var i2 = 0.0; var q2 = 0.0; var re = 0.0; var im = 0.0; var period = 0.0
    var smoothPeriod = 0.0
    var phase = 0.0; var mama = 0.0; var fama = 0.0

    @inline def push7(dq: Array[Double], v: Double): Unit = {
      var j = 6
      while (j >= 1) { dq(j) = dq(j - 1); j -= 1 }
      dq(0) = v
    }
    @inline def fir(dq: Array[Double], adj: Double): Double =
      (0.0962 * dq(0) + 0.5769 * dq(2) - 0.5769 * dq(4) - 0.0962 * dq(6)) * adj

    var i = 6
    while (i < n) {
      val prevPeriod = if (i > 6) period else 6.0
      val adj = 0.075 * prevPeriod + 0.54

      val detrendCurr = (0.0962 * smooth(i) + 0.5769 * smooth(i - 2)
        - 0.5769 * smooth(i - 4) - 0.0962 * smooth(i - 6)) * adj
      push7(detrend, detrendCurr)

      push7(q1, fir(detrend, adj))
      push7(i1, detrend(3))

      val ji = fir(i1, adj)
      val jq = fir(q1, adj)

      val i2c = 0.2 * (i1(0) - jq) + 0.8 * i2
      val q2c = 0.2 * (q1(0) + ji) + 0.8 * q2
      val reC = 0.2 * (i2c * i2 + q2c * q2) + 0.8 * re
      val imC = 0.2 * (i2c * q2 - q2c * i2) + 0.8 * im
      i2 = i2c; q2 = q2c; re = reC; im = imC

      if (im != 0.0 && re != 0.0) period = (2.0 * math.Pi) / math.atan(im / re)
      period = math.min(math.max(period, 0.67 * prevPeriod), 1.5 * prevPeriod)
      period = math.min(math.max(period, 6.0), 50.0)
      period = 0.2 * period + 0.8 * prevPeriod
      smoothPeriod = 0.33 * period + 0.67 * smoothPeriod

      // MAMA/FAMA (standard Ehlers; shares i1/q1 phase)
      val prevPhase = phase
      phase = if (i1(0) != 0.0) math.atan(q1(0) / i1(0)) * 180.0 / math.Pi else 0.0
      var deltaPhase = prevPhase - phase
      if (deltaPhase < 1.0) deltaPhase = 1.0
      var alpha = fastLimit / deltaPhase
      if (alpha < slowLimit) alpha = slowLimit
      if (alpha > fastLimit) alpha = fastLimit
      mama = alpha * x(i) + (1.0 - alpha) * mama
      fama = 0.5 * alpha * mama + (1.0 - 0.5 * alpha) * fama

      if (i >= 31) {
        out(DCPERIOD)(i) = smoothPeriod

        // dcphase with the reference's fixups (cycle.rs:129-142)
        var dcPhase = if (i1(0) != 0.0) math.atan(q1(0) / i1(0)) * 180.0 / math.Pi else 0.0
        dcPhase += 90.0
        if (i1(0) < 0.0) dcPhase += 180.0
        if (dcPhase > 315.0) dcPhase -= 360.0
        out(DCPHASE)(i) = dcPhase

        out(INPHASE)(i) = i1(0)
        out(QUADRATURE)(i) = q1(0)

        // ht_sine uses the RAW phase, without the fixups (cycle.rs:293-300)
        val rawPhase = if (i1(0) != 0.0) math.atan(q1(0) / i1(0)) * 180.0 / math.Pi else 0.0
        out(SINE)(i) = math.sin(rawPhase * math.Pi / 180.0)
        out(LEADSINE)(i) = math.sin((rawPhase + 45.0) * math.Pi / 180.0)

        val trendline = (((x(i) + x(i - 1)) + x(i - 2)) + x(i - 3)) * 0.25
        out(TRENDLINE)(i) = trendline
        out(TRENDMODE)(i) = if (math.abs(x(i) - trendline) > 0.01 * trendline) 1.0 else 0.0

        out(MAMA)(i) = mama
        out(FAMA)(i) = fama
      }
      i += 1
    }
    out
  }
}
