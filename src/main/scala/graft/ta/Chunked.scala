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
}
