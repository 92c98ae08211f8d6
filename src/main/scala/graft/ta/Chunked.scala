package graft.ta

/** Per-row incremental forms of the recursive kernels, for the
  * chunked-state executor ([[SeriesOps.overSeriesChunked]]): the SAME
  * arithmetic as the `Kernels` array scans, with each scan's loop
  * variables reified as a state vector that can be carried across chunk
  * boundaries. Outputs are bit-identical to the array kernels by
  * construction — every floating-point operation happens in the same
  * order on the same values (parity-pinned in ChunkedSpec).
  *
  * This is the batch twin of the streaming state carry
  * (graft.streaming.StreamingOps): a tick-scale series whose full history
  * exceeds one executor's working set is processed chunk-by-chunk with
  * O(stateSize) carried between chunks.
  */
object Chunked {
  import Kernels.NA
  @inline private def ok(x: Double): Boolean = !java.lang.Double.isNaN(x)

  /** A resumable kernel: `init()` yields the state before row 0; `step`
    * consumes one row's input values (NaN = null), mutates the state, and
    * returns the row's output values (NaN = null). State is a plain
    * double vector so it serializes trivially (counts live in doubles —
    * exact to 2^53, far beyond any row count a chunk sees). */
  trait StepKernel extends Serializable {
    def numInputs: Int
    def numOutputs: Int
    def init(): Array[Double]
    def step(state: Array[Double], in: Array[Double]): Array[Double]
  }

  /** EMA seeded with the SMA of the first n valid values — the step form
    * of Kernels.emaAlpha (overlap.rs:660-730). State: [cnt, sum, ema]. */
  class EmaStep(n: Int, alpha: Double) extends StepKernel {
    def this(n: Int) = this(n, 2.0 / (n + 1))
    val numInputs = 1; val numOutputs = 1
    def init(): Array[Double] = Array(0.0, 0.0, NA)
    def step(st: Array[Double], in: Array[Double]): Array[Double] = {
      val v = in(0)
      var out = NA
      if (ok(v)) {
        if (st(0) < n) {
          st(0) += 1; st(1) += v
          if (st(0) == n) { st(2) = st(1) / n; out = st(2) }
        } else { st(2) = alpha * v + (1 - alpha) * st(2); out = st(2) }
      }
      Array(out)
    }
  }

  /** Wilder RMA (α = 1/n) — step form of Kernels.rma. */
  final class RmaStep(n: Int) extends EmaStep(n, 1.0 / n)

  /** RSI — step form of Kernels.rsi (momentum.rs:506-541).
    * State: [prevClose, avgGain, avgLoss, cnt]. */
  final class RsiStep(n: Int) extends StepKernel {
    val numInputs = 1; val numOutputs = 1
    def init(): Array[Double] = Array(NA, 0.0, 0.0, 0.0)
    def step(st: Array[Double], in: Array[Double]): Array[Double] = {
      val v = in(0)
      var out = NA
      if (ok(v)) {
        if (ok(st(0))) {
          val d = v - st(0)
          val up = if (d > 0) d else 0.0
          val dn = if (d < 0) -d else 0.0
          if (st(3) < n) {
            st(1) += up; st(2) += dn; st(3) += 1
            if (st(3) == n) { st(1) /= n; st(2) /= n; out = rs(st(1), st(2)) }
          } else {
            st(1) = (st(1) * (n - 1) + up) / n
            st(2) = (st(2) * (n - 1) + dn) / n
            out = rs(st(1), st(2))
          }
        }
        st(0) = v
      }
      Array(out)
    }
    @inline private def rs(ag: Double, al: Double): Double =
      if (al == 0.0) 100.0 else 100.0 - 100.0 / (1.0 + ag / al)
  }

  /** KAMA — the ring-buffer state shape: the kernel's value ring (last
    * n+1 valid values), diff ring (last n |diffs|) and rolling vol sum
    * all ride the state vector, so even window-within-recurrence
    * machines cross chunk boundaries bit-identically.
    * Layout: [prevVal, prevK, vcnt, vpos, dcnt, dpos, vol,
    *          vals(n+1)…, diffs(n)…]. */
  final class KamaStep(n: Int) extends StepKernel {
    val numInputs = 1; val numOutputs = 1
    private val fast = 2.0 / (2 + 1); private val slow = 2.0 / (30 + 1)
    private val V = 7 // vals ring offset; diffs ring at V + n + 1
    def init(): Array[Double] = {
      val st = new Array[Double](V + (n + 1) + n)
      st(0) = NA; st(1) = NA
      st
    }
    def step(st: Array[Double], in: Array[Double]): Array[Double] = {
      val v = in(0)
      var out = NA
      if (ok(v)) {
        val prevVal = st(0)
        if (ok(prevVal)) {
          val d = math.abs(v - prevVal)
          var dcnt = st(4).toInt; var dpos = st(5).toInt
          if (dcnt == n) st(6) -= st(V + n + 1 + dpos)
          st(V + n + 1 + dpos) = d; dpos = (dpos + 1) % n
          if (dcnt < n) dcnt += 1
          st(6) += d
          st(4) = dcnt; st(5) = dpos
        }
        var vcnt = st(2).toInt; var vpos = st(3).toInt
        st(V + vpos) = v; vpos = (vpos + 1) % (n + 1)
        if (vcnt < n + 1) vcnt += 1
        st(2) = vcnt; st(3) = vpos
        if (st(4).toInt == n) {
          val oldest = st(V + (if (vcnt == n + 1) vpos else 0))
          val dir = math.abs(v - oldest)
          val er = if (st(6) == 0.0) 0.0 else dir / st(6)
          val sc = { val s = er * (fast - slow) + slow; s * s }
          if (!ok(st(1))) st(1) = prevVal
          st(1) = st(1) + sc * (v - st(1))
          out = st(1)
        }
        st(0) = v
      }
      Array(out)
    }
  }

  /** MACD — the multi-output composite: fast/slow EMA legs on the price,
    * dif = fast − slow (NaN until both warm), a third EMA leg on dif
    * (NaN dif rows skip without advancing, exactly like Kernels.ema over
    * the dif array), hist = dif − signal. Shows the chunked pattern
    * generalizes to composed state machines: the state vector is just
    * the three EMA legs' loop variables side by side.
    * State: [cntF, sumF, emaF, cntS, sumS, emaS, cntG, sumG, emaG]. */
  final class MacdStep(fast: Int, slow: Int, sig: Int) extends StepKernel {
    val numInputs = 1; val numOutputs = 3
    private val aF = 2.0 / (fast + 1)
    private val aS = 2.0 / (slow + 1)
    private val aG = 2.0 / (sig + 1)
    def init(): Array[Double] = Array(0.0, 0.0, NA, 0.0, 0.0, NA, 0.0, 0.0, NA)
    @inline private def emaAt(st: Array[Double], o: Int, n: Int, alpha: Double, v: Double): Double = {
      if (!ok(v)) NA
      else if (st(o) < n) {
        st(o) += 1; st(o + 1) += v
        if (st(o) == n) { st(o + 2) = st(o + 1) / n; st(o + 2) } else NA
      } else { st(o + 2) = alpha * v + (1 - alpha) * st(o + 2); st(o + 2) }
    }
    def step(st: Array[Double], in: Array[Double]): Array[Double] = {
      val v = in(0)
      val f = emaAt(st, 0, fast, aF, v)
      val s = emaAt(st, 3, slow, aS, v)
      val dif = if (ok(f) && ok(s)) f - s else NA
      val g = emaAt(st, 6, sig, aG, dif)
      Array(dif, g, if (ok(dif) && ok(g)) dif - g else NA)
    }
  }

  /** ATR = RMA(TR, n) — the trange scan (volatility.rs:50-84) composed
    * with the RMA recurrence, exactly as Kernels.atr composes the array
    * forms (a NaN true-range row passes through the RMA skip without
    * advancing its state). Inputs (high, low, close).
    * State: [prevClose, rmaCnt, rmaSum, rmaVal]. */
  final class AtrStep(n: Int) extends StepKernel {
    val numInputs = 3; val numOutputs = 1
    private val alpha = 1.0 / n
    def init(): Array[Double] = Array(NA, 0.0, 0.0, NA)
    def step(st: Array[Double], in: Array[Double]): Array[Double] = {
      val h = in(0); val l = in(1); val c = in(2)
      var tr = NA
      if (ok(h) && ok(l) && ok(c)) {
        if (ok(st(0)))
          tr = math.max(h - l, math.max(math.abs(h - st(0)), math.abs(l - st(0))))
        st(0) = c
      }
      var out = NA
      if (ok(tr)) {                              // the RMA skip: a NaN TR row
        if (st(1) < n) {                         // advances nothing
          st(1) += 1; st(2) += tr
          if (st(1) == n) { st(3) = st(2) / n; out = st(3) }
        } else { st(3) = alpha * tr + (1 - alpha) * st(3); out = st(3) }
      }
      Array(out)
    }
  }

  /** Parabolic SAR — step form of Kernels.sar (overlap.rs:436-455; the
    * trend/extreme-point/acceleration machine whose loop variables are
    * exactly the state). Inputs (high, low).
    * State: [ph, pl, haveState, long, af, sarV, ep]. */
  final class SarStep(accel: Double = 0.02, maxA: Double = 0.2) extends StepKernel {
    val numInputs = 2; val numOutputs = 1
    def init(): Array[Double] = Array(NA, NA, 0.0, 0.0, accel, NA, NA)
    def step(st: Array[Double], in: Array[Double]): Array[Double] = {
      val h = in(0); val l = in(1)
      var out = NA
      if (ok(h) && ok(l)) {
        val ph = st(0); val pl = st(1)
        if (ok(ph)) {
          if (st(2) == 0.0) {
            val long = (h - ph) >= (pl - l)
            st(3) = if (long) 1.0 else 0.0
            st(4) = accel
            st(5) = if (long) pl else ph
            st(6) = if (long) h else l
            st(2) = 1.0
          }
          if (st(3) == 1.0) {
            if (l < st(5)) { // flip to short
              st(3) = 0.0; st(5) = st(6); st(6) = l; st(4) = accel
              out = st(5)
              st(5) = st(5) + st(4) * (st(6) - st(5))
              if (st(5) < h) st(5) = h
              if (st(5) < ph) st(5) = ph
            } else {
              out = st(5)
              if (h > st(6)) { st(6) = h; st(4) = math.min(st(4) + accel, maxA) }
              st(5) = st(5) + st(4) * (st(6) - st(5))
              if (st(5) > l) st(5) = l
              if (st(5) > pl) st(5) = pl
            }
          } else {
            if (h > st(5)) { // flip to long
              st(3) = 1.0; st(5) = st(6); st(6) = h; st(4) = accel
              out = st(5)
              st(5) = st(5) + st(4) * (st(6) - st(5))
              if (st(5) > l) st(5) = l
              if (st(5) > pl) st(5) = pl
            } else {
              out = st(5)
              if (l < st(6)) { st(6) = l; st(4) = math.min(st(4) + accel, maxA) }
              st(5) = st(5) + st(4) * (st(6) - st(5))
              if (st(5) < h) st(5) = h
              if (st(5) < ph) st(5) = ph
            }
          }
        }
        st(0) = h; st(1) = l
      }
      Array(out)
    }
  }

  /** SAREXT — step form of Kernels.sarext (overlap.rs:456-491): SAR with
    * start value/offset-on-reverse and separate long/short acceleration,
    * short SAR emitted negative. Inputs (high, low).
    * State: [ph, pl, haveState, long, af, sarV, ep]. */
  final class SarExtStep(startValue: Double = 0.0, offsetOnReverse: Double = 0.0,
                         accelInitLong: Double = 0.02, accelLong: Double = 0.02,
                         accelMaxLong: Double = 0.2,
                         accelInitShort: Double = 0.02, accelShort: Double = 0.02,
                         accelMaxShort: Double = 0.2) extends StepKernel {
    val numInputs = 2; val numOutputs = 1
    def init(): Array[Double] = Array(NA, NA, 0.0, 0.0, 0.0, NA, NA)
    def step(st: Array[Double], in: Array[Double]): Array[Double] = {
      val h = in(0); val l = in(1)
      var out = NA
      if (ok(h) && ok(l)) {
        val ph = st(0); val pl = st(1)
        if (ok(ph)) {
          if (st(2) == 0.0) {
            val long =
              if (startValue > 0) true
              else if (startValue < 0) false
              else (h - ph) >= (pl - l)
            st(3) = if (long) 1.0 else 0.0
            st(4) = if (long) accelInitLong else accelInitShort
            st(5) =
              if (startValue != 0.0) math.abs(startValue)
              else if (long) pl else ph
            st(6) = if (long) h else l
            st(2) = 1.0
          }
          if (st(3) == 1.0) {
            if (l < st(5)) {
              st(3) = 0.0; st(5) = st(6) * (1 + offsetOnReverse); st(6) = l; st(4) = accelInitShort
              out = -st(5)
              st(5) = st(5) + st(4) * (st(6) - st(5))
              if (st(5) < h) st(5) = h
              if (st(5) < ph) st(5) = ph
            } else {
              out = st(5)
              if (h > st(6)) { st(6) = h; st(4) = math.min(st(4) + accelLong, accelMaxLong) }
              st(5) = st(5) + st(4) * (st(6) - st(5))
              if (st(5) > l) st(5) = l
              if (st(5) > pl) st(5) = pl
            }
          } else {
            if (h > st(5)) {
              st(3) = 1.0; st(5) = st(6) * (1 - offsetOnReverse); st(6) = h; st(4) = accelInitLong
              out = st(5)
              st(5) = st(5) + st(4) * (st(6) - st(5))
              if (st(5) > l) st(5) = l
              if (st(5) > pl) st(5) = pl
            } else {
              out = -st(5)
              if (l < st(6)) { st(6) = l; st(4) = math.min(st(4) + accelShort, accelMaxShort) }
              st(5) = st(5) + st(4) * (st(6) - st(5))
              if (st(5) < h) st(5) = h
              if (st(5) < ph) st(5) = ph
            }
          }
        }
        st(0) = h; st(1) = l
      }
      Array(out)
    }
  }

  /** The MESA/Hilbert machine — step form of Cycle.mesa (cycle.rs:9-448
    * + MAMA), the heaviest state vector in the TA surface: three 7-tap
    * FIR delay lines, the 4-bar smoother and trendline lags, and the
    * demodulator scalars all ride one 41-double state (idx + 3 x-lags,
    * 4 rings of 7, 9 scalars), so the entire
    * HT_* family (plus MAMA/FAMA) crosses chunk boundaries
    * bit-identically. Emits the same 10 outputs as Cycle.mesa, in
    * Cycle.DCPERIOD..FAMA order. One input (the price); like the array
    * kernel, inputs are assumed null-free per series (NaN would ride the
    * same arithmetic in both forms). The array kernel's n<32
    * early-return needs no twin: outputs only exist from row 31, so a
    * shorter series emits all-null in both forms.
    *
    * State: [idx, x1, x2, x3, smooth(7), detrend(7), q1(7), i1(7),
    *         i2, q2, re, im, period, smoothPeriod, phase, mama, fama]. */
  final class MesaStep(fastLimit: Double = 0.5, slowLimit: Double = 0.05)
      extends StepKernel {
    val numInputs = 1; val numOutputs = 10
    private val S = 4       // smooth ring offset (7)
    private val D = S + 7   // detrend ring offset (7)
    private val Q = D + 7   // q1 ring offset (7)
    private val I = Q + 7   // i1 ring offset (7)
    private val Z = I + 7   // scalars: i2,q2,re,im,period,smoothPeriod,phase,mama,fama
    def init(): Array[Double] = {
      val st = new Array[Double](Z + 9)
      st(1) = NA; st(2) = NA; st(3) = NA // x lags; rings start at 0.0 like
      st                                 // the zero-filled kernel arrays
    }
    @inline private def push7(st: Array[Double], o: Int, v: Double): Unit = {
      var j = 6
      while (j >= 1) { st(o + j) = st(o + j - 1); j -= 1 }
      st(o) = v
    }
    @inline private def fir(st: Array[Double], o: Int, adj: Double): Double =
      (0.0962 * st(o) + 0.5769 * st(o + 2) - 0.5769 * st(o + 4) - 0.0962 * st(o + 6)) * adj
    def step(st: Array[Double], in: Array[Double]): Array[Double] = {
      val x = in(0)
      val i = st(0).toLong
      val out = Array.fill(10)(NA)
      // calc_smooth: zeros before index 3 (the kernel's zero-filled array)
      val smoothCurr =
        if (i >= 3) (4.0 * x + 3.0 * st(1) + 2.0 * st(2) + st(3)) * 0.1 else 0.0
      push7(st, S, smoothCurr)
      if (i >= 6) {
        val prevPeriod = if (i > 6) st(Z + 4) else 6.0
        val adj = 0.075 * prevPeriod + 0.54
        // identical FIR tap order to the array kernel (smooth i,i-2,i-4,i-6)
        push7(st, D, fir(st, S, adj))
        push7(st, Q, fir(st, D, adj))
        push7(st, I, st(D + 3))
        val ji = fir(st, I, adj)
        val jq = fir(st, Q, adj)
        val i2c = 0.2 * (st(I) - jq) + 0.8 * st(Z)
        val q2c = 0.2 * (st(Q) + ji) + 0.8 * st(Z + 1)
        val reC = 0.2 * (i2c * st(Z) + q2c * st(Z + 1)) + 0.8 * st(Z + 2)
        val imC = 0.2 * (i2c * st(Z + 1) - q2c * st(Z)) + 0.8 * st(Z + 3)
        st(Z) = i2c; st(Z + 1) = q2c; st(Z + 2) = reC; st(Z + 3) = imC
        var period = st(Z + 4)
        if (imC != 0.0 && reC != 0.0) period = (2.0 * math.Pi) / math.atan(imC / reC)
        period = math.min(math.max(period, 0.67 * prevPeriod), 1.5 * prevPeriod)
        period = math.min(math.max(period, 6.0), 50.0)
        period = 0.2 * period + 0.8 * prevPeriod
        st(Z + 4) = period
        st(Z + 5) = 0.33 * period + 0.67 * st(Z + 5)
        val prevPhase = st(Z + 6)
        val phase = if (st(I) != 0.0) math.atan(st(Q) / st(I)) * 180.0 / math.Pi else 0.0
        st(Z + 6) = phase
        var deltaPhase = prevPhase - phase
        if (deltaPhase < 1.0) deltaPhase = 1.0
        var alpha = fastLimit / deltaPhase
        if (alpha < slowLimit) alpha = slowLimit
        if (alpha > fastLimit) alpha = fastLimit
        st(Z + 7) = alpha * x + (1.0 - alpha) * st(Z + 7)
        st(Z + 8) = 0.5 * alpha * st(Z + 7) + (1.0 - 0.5 * alpha) * st(Z + 8)
        if (i >= 31) {
          out(Cycle.DCPERIOD) = st(Z + 5)
          var dcPhase = if (st(I) != 0.0) math.atan(st(Q) / st(I)) * 180.0 / math.Pi else 0.0
          dcPhase += 90.0
          if (st(I) < 0.0) dcPhase += 180.0
          if (dcPhase > 315.0) dcPhase -= 360.0
          out(Cycle.DCPHASE) = dcPhase
          out(Cycle.INPHASE) = st(I)
          out(Cycle.QUADRATURE) = st(Q)
          val rawPhase = if (st(I) != 0.0) math.atan(st(Q) / st(I)) * 180.0 / math.Pi else 0.0
          out(Cycle.SINE) = math.sin(rawPhase * math.Pi / 180.0)
          out(Cycle.LEADSINE) = math.sin((rawPhase + 45.0) * math.Pi / 180.0)
          val trendline = (((x + st(1)) + st(2)) + st(3)) * 0.25
          out(Cycle.TRENDLINE) = trendline
          out(Cycle.TRENDMODE) = if (math.abs(x - trendline) > 0.01 * trendline) 1.0 else 0.0
          out(Cycle.MAMA) = st(Z + 7)
          out(Cycle.FAMA) = st(Z + 8)
        }
      }
      st(3) = st(2); st(2) = st(1); st(1) = x
      st(0) = i + 1
      out
    }
  }
}
