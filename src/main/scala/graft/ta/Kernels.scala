package graft.ta

/** Pure-Scala array kernels for the order-dependent recurrences that cannot
  * be expressed as Spark window frames (SURVEY.md §7.2): the EMA family,
  * Wilder smoothing, ADX pipeline, SAR, KAMA, T3, …
  *
  * Conventions (match the reference kernels, e.g. overlap.rs:660-730):
  *   - input/output `Array[Double]`; NaN encodes null.
  *   - warm-up prefix is NaN (first valid index documented per kernel);
  *   - interior NaNs are skipped without advancing window state
  *     (overlap.rs:891-894 "skip, don't poison").
  *
  * These run inside `SeriesOps.overSeries` per-symbol groups, so they are
  * single-threaded per series but embarrassingly parallel across series —
  * the same execution shape as the reference's per-Series Rust kernels, but
  * distributed by Spark across executors.
  */
object Kernels {
  val NA: Double = Double.NaN
  @inline private def ok(x: Double): Boolean = !java.lang.Double.isNaN(x)

  /** SMA over the last n valid values — overlap.rs:871-937. */
  def sma(x: Array[Double], n: Int): Array[Double] = {
    val out = Array.fill(x.length)(NA)
    val buf = new Array[Double](n)
    var cnt = 0; var pos = 0; var s = 0.0
    var i = 0
    while (i < x.length) {
      val v = x(i)
      if (ok(v)) {
        if (cnt == n) s -= buf(pos)
        buf(pos) = v; pos = (pos + 1) % n
        if (cnt < n) cnt += 1
        s += v
        if (cnt == n) out(i) = s / n
      }
      i += 1
    }
    out
  }

  /** EMA with arbitrary alpha, seeded with the SMA of the first n valid
    * values — overlap.rs:660-730. */
  def emaAlpha(x: Array[Double], n: Int, alpha: Double): Array[Double] = {
    val out = Array.fill(x.length)(NA)
    var cnt = 0; var s = 0.0; var e = 0.0
    var i = 0
    while (i < x.length) {
      val v = x(i)
      if (ok(v)) {
        if (cnt < n) {
          cnt += 1; s += v
          if (cnt == n) { e = s / n; out(i) = e }
        } else { e = alpha * v + (1 - alpha) * e; out(i) = e }
      }
      i += 1
    }
    out
  }

  /** EMA, α = 2/(n+1) — overlap.rs:127-134. */
  def ema(x: Array[Double], n: Int): Array[Double] = emaAlpha(x, n, 2.0 / (n + 1))

  /** Wilder RMA, α = 1/n (≡ EMA(2n−1), volatility.rs:29-31). */
  def rma(x: Array[Double], n: Int): Array[Double] = emaAlpha(x, n, 1.0 / n)

  /** WMA over last n valid values, weights n..1 — overlap.rs:1328-1399. */
  def wma(x: Array[Double], n: Int): Array[Double] = {
    val out = Array.fill(x.length)(NA)
    val buf = new Array[Double](n)
    var cnt = 0; var pos = 0
    val denom = n * (n + 1) / 2.0
    var i = 0
    while (i < x.length) {
      val v = x(i)
      if (ok(v)) {
        buf(pos) = v; pos = (pos + 1) % n
        if (cnt < n) cnt += 1
        if (cnt == n) {
          var s = 0.0; var k = 0
          while (k < n) { s += buf((pos + k) % n) * (k + 1); k += 1 }
          out(i) = s / denom
        }
      }
      i += 1
    }
    out
  }

  /** TRIMA = SMA(SMA(x, ceil(n/2)), floor(n/2)+1) — overlap.rs:1313-1326. */
  def trima(x: Array[Double], n: Int): Array[Double] = sma(sma(x, n - n / 2), n / 2 + 1)

  private def zip2(a: Array[Double], b: Array[Double])(f: (Double, Double) => Double): Array[Double] =
    Array.tabulate(a.length)(i => if (ok(a(i)) && ok(b(i))) f(a(i), b(i)) else NA)

  /** DEMA = 2·EMA − EMA(EMA); warm-up 2n−2 — overlap.rs:543-658. */
  def dema(x: Array[Double], n: Int): Array[Double] = {
    val e1 = ema(x, n); val e2 = ema(e1, n)
    zip2(e1, e2)((a, b) => 2 * a - b)
  }

  /** TEMA = 3e1 − 3e2 + e3; warm-up 3n−3 — overlap.rs:1177-1311. */
  def tema(x: Array[Double], n: Int): Array[Double] = {
    val e1 = ema(x, n); val e2 = ema(e1, n); val e3 = ema(e2, n)
    Array.tabulate(x.length)(i =>
      if (ok(e3(i))) 3 * e1(i) - 3 * e2(i) + e3(i) else NA)
  }

  /** Tillson T3: 6 cascaded EMAs, coefficients from vfactor — overlap.rs:939-1175. */
  def t3(x: Array[Double], n: Int, vfactor: Double): Array[Double] = {
    val a = vfactor
    val c1 = -a * a * a
    val c2 = 3 * a * a + 3 * a * a * a
    val c3 = -6 * a * a - 3 * a - 3 * a * a * a
    val c4 = 1 + 3 * a + a * a * a + 3 * a * a
    val e1 = ema(x, n); val e2 = ema(e1, n); val e3 = ema(e2, n)
    val e4 = ema(e3, n); val e5 = ema(e4, n); val e6 = ema(e5, n)
    Array.tabulate(x.length)(i =>
      if (ok(e6(i))) c1 * e6(i) + c2 * e5(i) + c3 * e4(i) + c4 * e3(i) else NA)
  }

  /** KAMA — efficiency ratio → squared smoothing constant (fast 2/3, slow
    * 2/31) → recursion seeded with the previous valid price —
    * overlap.rs:732-855. First valid at the (n+1)-th valid value; interior
    * NaNs are skipped without advancing window state (rolling sum of the
    * last n valid-to-valid diffs + a value ring for the direction term). */
  def kama(x: Array[Double], n: Int): Array[Double] = {
    val out  = Array.fill(x.length)(NA)
    val fast = 2.0 / (2 + 1); val slow = 2.0 / (30 + 1)
    val vals  = new Array[Double](n + 1)  // last n+1 valid values
    val diffs = new Array[Double](n)      // |diff| of last n valid pairs
    var vcnt = 0; var vpos = 0            // value ring state
    var dcnt = 0; var dpos = 0; var vol = 0.0
    var prevVal = NA; var prevK = NA
    var i = 0
    while (i < x.length) {
      val v = x(i)
      if (ok(v)) {
        if (ok(prevVal)) {
          val d = math.abs(v - prevVal)
          if (dcnt == n) vol -= diffs(dpos)
          diffs(dpos) = d; dpos = (dpos + 1) % n
          if (dcnt < n) dcnt += 1
          vol += d
        }
        vals(vpos) = v; vpos = (vpos + 1) % (n + 1)
        if (vcnt < n + 1) vcnt += 1
        if (dcnt == n) {
          val oldest = vals(if (vcnt == n + 1) vpos else 0)
          val dir = math.abs(v - oldest)
          val er  = if (vol == 0.0) 0.0 else dir / vol
          val sc  = { val s = er * (fast - slow) + slow; s * s }
          if (!ok(prevK)) prevK = prevVal
          prevK = prevK + sc * (v - prevK)
          out(i) = prevK
        }
        prevVal = v
      }
      i += 1
    }
    out
  }

  /** MA dispatcher, matype 0..8 — overlap.rs:857-869 (7/MAMA stubs to SMA
    * in the reference; we keep that documented behavior; 8 calls
    * calc_t3(values, timeperiod, 0.0) — overlap.rs:866 — so with vfactor 0
    * the combination degenerates to e3 gated by the full 6-EMA warm-up). */
  def ma(x: Array[Double], n: Int, matype: Int): Array[Double] = matype match {
    case 0 => sma(x, n)
    case 1 => ema(x, n)
    case 2 => wma(x, n)
    case 3 => dema(x, n)
    case 4 => tema(x, n)
    case 5 => trima(x, n)
    case 6 => kama(x, n)
    case 7 => sma(x, n)
    case 8 => t3(x, n, 0.0)
    case m => throw new IllegalArgumentException(s"matype $m")
  }

  /** RSI — SMA-seeded Wilder averages of up/down moves; avg loss 0 → 100 —
    * momentum.rs:506-541. First valid at index (first valid)+n. */
  def rsi(x: Array[Double], n: Int): Array[Double] = {
    val out = Array.fill(x.length)(NA)
    var prev = NA; var ag = 0.0; var al = 0.0; var cnt = 0
    var i = 0
    while (i < x.length) {
      val v = x(i)
      if (ok(v)) {
        if (ok(prev)) {
          val d = v - prev
          val up = if (d > 0) d else 0.0
          val dn = if (d < 0) -d else 0.0
          if (cnt < n) {
            ag += up; al += dn; cnt += 1
            if (cnt == n) { ag /= n; al /= n; out(i) = rs(ag, al) }
          } else {
            ag = (ag * (n - 1) + up) / n
            al = (al * (n - 1) + dn) / n
            out(i) = rs(ag, al)
          }
        }
        prev = v
      }
      i += 1
    }
    out
  }
  @inline private def rs(ag: Double, al: Double): Double =
    if (al == 0.0) 100.0 else 100.0 - 100.0 / (1.0 + ag / al)

  /** True range vs the previous VALID close; rows before the first valid
    * close (or with NaN inputs) emit NaN without advancing state —
    * volatility.rs:50-84 + the skip-don't-poison convention. */
  def trange(h: Array[Double], l: Array[Double], c: Array[Double]): Array[Double] = {
    val out = Array.fill(h.length)(NA)
    var pc = NA
    var i = 0
    while (i < h.length) {
      if (ok(h(i)) && ok(l(i)) && ok(c(i))) {
        if (ok(pc))
          out(i) = math.max(h(i) - l(i), math.max(math.abs(h(i) - pc), math.abs(l(i) - pc)))
        pc = c(i)
      }
      i += 1
    }
    out
  }

  /** ATR = RMA(TR, n) — volatility.rs:17-31. */
  def atr(h: Array[Double], l: Array[Double], c: Array[Double], n: Int): Array[Double] =
    rma(trange(h, l, c), n)

  /** Chaikin A/D line (running CLV·V sum; h=l adds 0). NaN rows emit NaN
    * without advancing the running sum — volume.rs:100-126, null skip at
    * :113-118. */
  def adline(h: Array[Double], l: Array[Double], c: Array[Double], v: Array[Double]): Array[Double] = {
    val out = Array.fill(h.length)(NA)
    var s = 0.0
    var i = 0
    while (i < h.length) {
      if (ok(h(i)) && ok(l(i)) && ok(c(i)) && ok(v(i))) {
        if (h(i) != l(i)) s += ((c(i) - l(i)) - (h(i) - c(i))) / (h(i) - l(i)) * v(i)
        out(i) = s
      }
      i += 1
    }
    out
  }

  /** ADOSC = EMA_fast(ADL) − EMA_slow(ADL); single cumsum (standard
    * semantics; the reference double-cumsums — recorded quirk,
    * volume.rs:45-61). */
  def adosc(h: Array[Double], l: Array[Double], c: Array[Double], v: Array[Double],
            fast: Int, slow: Int): Array[Double] = {
    val adl = adline(h, l, c, v)
    zip2(ema(adl, fast), ema(adl, slow))(_ - _)
  }

  /** Shared ±DM/TR → Wilder-smoothed → DI/DX pipeline (momentum.rs:668-727,
    * standard TA-Lib smoothing: seed = sum of first n, then s−s/n+v).
    * Returns (pdi, mdi, dx, spdm, smdm) arrays, valid from index n. */
  def dmPipeline(h: Array[Double], l: Array[Double], c: Array[Double], n: Int)
      : (Array[Double], Array[Double], Array[Double], Array[Double], Array[Double]) = {
    val len = h.length
    val pdi = Array.fill(len)(NA); val mdi = Array.fill(len)(NA)
    val dx = Array.fill(len)(NA); val spdmA = Array.fill(len)(NA); val smdmA = Array.fill(len)(NA)
    var str = 0.0; var spdm = 0.0; var smdm = 0.0
    var ph = NA; var pl = NA; var pc = NA  // previous VALID bar (skip-don't-poison)
    var step = 0                          // count of valid transitions
    var i = 0
    while (i < len) {
      if (ok(h(i)) && ok(l(i)) && ok(c(i))) {
        if (ok(ph)) {
          step += 1
          val up = h(i) - ph
          val dn = pl - l(i)
          val pdm = if (up > dn && up > 0) up else 0.0
          val mdm = if (dn > up && dn > 0) dn else 0.0
          val tr = math.max(h(i) - l(i), math.max(math.abs(h(i) - pc), math.abs(l(i) - pc)))
          if (step <= n) { str += tr; spdm += pdm; smdm += mdm }
          else {
            str = str - str / n + tr
            spdm = spdm - spdm / n + pdm
            smdm = smdm - smdm / n + mdm
          }
          if (step >= n) {
            spdmA(i) = spdm; smdmA(i) = smdm
            val p = if (str == 0) 0.0 else 100.0 * spdm / str
            val m = if (str == 0) 0.0 else 100.0 * smdm / str
            pdi(i) = p; mdi(i) = m
            dx(i) = if (p + m == 0) 0.0 else 100.0 * math.abs(p - m) / (p + m)
          }
        }
        ph = h(i); pl = l(i); pc = c(i)
      }
      i += 1
    }
    (pdi, mdi, dx, spdmA, smdmA)
  }

  /** ADX = Wilder average of DX, seeded with SMA of first n DX values —
    * momentum.rs:10-29. First valid at index 2n−1. */
  def adx(h: Array[Double], l: Array[Double], c: Array[Double], n: Int): Array[Double] = {
    val (_, _, dx, _, _) = dmPipeline(h, l, c, n)
    val out = Array.fill(h.length)(NA)
    var s = 0.0; var cnt = 0; var a = NA
    var i = 0
    while (i < h.length) {
      if (ok(dx(i))) {
        if (cnt < n) { s += dx(i); cnt += 1; if (cnt == n) { a = s / n; out(i) = a } }
        else { a = (a * (n - 1) + dx(i)) / n; out(i) = a }
      }
      i += 1
    }
    out
  }

  /** ADXR = (ADX_t + ADX_{t−n+1})/2 — momentum.rs:31-61. */
  def adxr(h: Array[Double], l: Array[Double], c: Array[Double], n: Int): Array[Double] = {
    val a = adx(h, l, c, n)
    Array.tabulate(h.length)(i =>
      if (i >= n - 1 && ok(a(i)) && ok(a(i - n + 1))) (a(i) + a(i - n + 1)) / 2 else NA)
  }

  /** Parabolic SAR (Wilder) — overlap.rs:436-454 (kernel absent from the
    * snapshot; standard definition). First valid at the second valid bar;
    * NaN bars emit NaN without advancing the state machine. */
  def sar(h: Array[Double], l: Array[Double], accel: Double, maxA: Double): Array[Double] = {
    val len = h.length
    val out = Array.fill(len)(NA)
    var ph = NA; var pl = NA            // previous valid bar
    var haveState = false
    var long = false; var af = accel; var sarV = NA; var ep = NA
    var i = 0
    while (i < len) {
      if (ok(h(i)) && ok(l(i))) {
        if (ok(ph)) {
          if (!haveState) {
            // initial trend from first valid pair's +DM vs −DM (TA-Lib)
            long = (h(i) - ph) >= (pl - l(i))
            af = accel
            sarV = if (long) pl else ph
            ep = if (long) h(i) else l(i)
            haveState = true
          }
          if (long) {
            if (l(i) < sarV) { // flip to short
              long = false; sarV = ep; ep = l(i); af = accel
              out(i) = sarV
              sarV = sarV + af * (ep - sarV)
              if (sarV < h(i)) sarV = h(i)
              if (sarV < ph) sarV = ph
            } else {
              out(i) = sarV
              if (h(i) > ep) { ep = h(i); af = math.min(af + accel, maxA) }
              sarV = sarV + af * (ep - sarV)
              if (sarV > l(i)) sarV = l(i)
              if (sarV > pl) sarV = pl
            }
          } else {
            if (h(i) > sarV) { // flip to long
              long = true; sarV = ep; ep = h(i); af = accel
              out(i) = sarV
              sarV = sarV + af * (ep - sarV)
              if (sarV > l(i)) sarV = l(i)
              if (sarV > pl) sarV = pl
            } else {
              out(i) = sarV
              if (l(i) < ep) { ep = l(i); af = math.min(af + accel, maxA) }
              sarV = sarV + af * (ep - sarV)
              if (sarV < h(i)) sarV = h(i)
              if (sarV < ph) sarV = ph
            }
          }
        }
        ph = h(i); pl = l(i)
      }
      i += 1
    }
    out
  }

  /** SAREXT — SAR with start value/offset-on-reverse and separate long/short
    * acceleration; short SAR emitted negative (TA-Lib sign convention) —
    * overlap.rs:456-491 (kernel absent; standard definition). */
  def sarext(h: Array[Double], l: Array[Double],
             startValue: Double, offsetOnReverse: Double,
             accelInitLong: Double, accelLong: Double, accelMaxLong: Double,
             accelInitShort: Double, accelShort: Double, accelMaxShort: Double): Array[Double] = {
    val len = h.length
    val out = Array.fill(len)(NA)
    var ph = NA; var pl = NA            // previous valid bar
    var haveState = false
    var long = false; var af = 0.0; var sarV = NA; var ep = NA
    var i = 0
    while (i < len) {
      if (ok(h(i)) && ok(l(i))) {
        if (ok(ph)) {
          if (!haveState) {
            long =
              if (startValue > 0) true
              else if (startValue < 0) false
              else (h(i) - ph) >= (pl - l(i))
            af = if (long) accelInitLong else accelInitShort
            sarV =
              if (startValue != 0.0) math.abs(startValue)
              else if (long) pl else ph
            ep = if (long) h(i) else l(i)
            haveState = true
          }
          if (long) {
            if (l(i) < sarV) {
              long = false; sarV = ep * (1 + offsetOnReverse); ep = l(i); af = accelInitShort
              out(i) = -sarV
              sarV = sarV + af * (ep - sarV)
              if (sarV < h(i)) sarV = h(i)
              if (sarV < ph) sarV = ph
            } else {
              out(i) = sarV
              if (h(i) > ep) { ep = h(i); af = math.min(af + accelLong, accelMaxLong) }
              sarV = sarV + af * (ep - sarV)
              if (sarV > l(i)) sarV = l(i)
              if (sarV > pl) sarV = pl
            }
          } else {
            if (h(i) > sarV) {
              long = true; sarV = ep * (1 - offsetOnReverse); ep = h(i); af = accelInitLong
              out(i) = sarV
              sarV = sarV + af * (ep - sarV)
              if (sarV > l(i)) sarV = l(i)
              if (sarV > pl) sarV = pl
            } else {
              out(i) = -sarV
              if (l(i) < ep) { ep = l(i); af = math.min(af + accelShort, accelMaxShort) }
              sarV = sarV + af * (ep - sarV)
              if (sarV < h(i)) sarV = h(i)
              if (sarV < ph) sarV = ph
            }
          }
        }
        ph = h(i); pl = l(i)
      }
      i += 1
    }
    out
  }

  /** TRIX = 100·(E3_t/E3_{t−1} − 1) — momentum.rs:543-569. */
  def trix(x: Array[Double], n: Int): Array[Double] = {
    val e3 = ema(ema(ema(x, n), n), n)
    val out = Array.fill(x.length)(NA)
    var i = 1
    while (i < x.length) {
      if (ok(e3(i)) && ok(e3(i - 1)) && e3(i - 1) != 0.0)
        out(i) = 100.0 * (e3(i) / e3(i - 1) - 1.0)
      i += 1
    }
    out
  }

  /** MACD: (dif, signal, hist) — momentum.rs:249-283. */
  def macd(x: Array[Double], fast: Int, slow: Int, sig: Int)
      : (Array[Double], Array[Double], Array[Double]) = {
    val dif = zip2(ema(x, fast), ema(x, slow))(_ - _)
    val signal = ema(dif, sig)
    val hist = zip2(dif, signal)(_ - _)
    (dif, signal, hist)
  }

  /** Rolling min/max over last n valid values (for STOCH-on-array paths). */
  def rollMin(x: Array[Double], n: Int): Array[Double] = rollExtreme(x, n, isMax = false)
  def rollMax(x: Array[Double], n: Int): Array[Double] = rollExtreme(x, n, isMax = true)
  private def rollExtreme(x: Array[Double], n: Int, isMax: Boolean): Array[Double] = {
    val out = Array.fill(x.length)(NA)
    val buf = new Array[Double](n)
    var cnt = 0; var pos = 0
    var i = 0
    while (i < x.length) {
      if (ok(x(i))) {
        buf(pos) = x(i); pos = (pos + 1) % n
        if (cnt < n) cnt += 1
        if (cnt == n) {
          var e = buf(0); var k = 1
          while (k < n) { val v = buf(k); if (if (isMax) v > e else v < e) e = v; k += 1 }
          out(i) = e
        }
      }
      i += 1
    }
    out
  }

  /** Raw fast %K = 100·(c−LL)/(HH−LL) over the last n valid bars; flat
    * window → 0 (matches willr/stochrsi) — momentum.py:178-186. */
  def stochFastK(h: Array[Double], l: Array[Double], c: Array[Double], n: Int): Array[Double] = {
    val hh = rollMax(h, n); val ll = rollMin(l, n)
    Array.tabulate(c.length) { i =>
      if (ok(hh(i)) && ok(ll(i)) && ok(c(i))) {
        if (hh(i) == ll(i)) 0.0 else 100.0 * (c(i) - ll(i)) / (hh(i) - ll(i))
      } else NA
    }
  }

  /** STOCH (slow) = {slowK = MA(fastK), slowD = MA(slowK)} with per-leg
    * matype dispatch — momentum.py:178-186. */
  def stoch(h: Array[Double], l: Array[Double], c: Array[Double],
            fastkN: Int, slowkN: Int, slowkType: Int, slowdN: Int, slowdType: Int)
      : (Array[Double], Array[Double]) = {
    val slowk = ma(stochFastK(h, l, c, fastkN), slowkN, slowkType)
    (slowk, ma(slowk, slowdN, slowdType))
  }

  /** STOCHF (fast) = {fastK, fastD = MA(fastK)} — momentum.py:188-195. */
  def stochf(h: Array[Double], l: Array[Double], c: Array[Double],
             fastkN: Int, fastdN: Int, fastdType: Int): (Array[Double], Array[Double]) = {
    val fastk = stochFastK(h, l, c, fastkN)
    (fastk, ma(fastk, fastdN, fastdType))
  }

  /** STOCHRSI — stochastic of RSI — momentum.py:197-205. Returns (fastk, fastd). */
  def stochrsi(x: Array[Double], n: Int, fastkN: Int, fastdN: Int)
      : (Array[Double], Array[Double]) = {
    val r = rsi(x, n)
    val hh = rollMax(r, fastkN); val ll = rollMin(r, fastkN)
    val fastk = Array.tabulate(x.length) { i =>
      if (ok(hh(i)) && ok(ll(i))) {
        if (hh(i) == ll(i)) 0.0 else 100.0 * (r(i) - ll(i)) / (hh(i) - ll(i))
      } else NA
    }
    (fastk, sma(fastk, fastdN))
  }

  /** MAVP — per-row variable-period MA, periods clamped to [minP,maxP] —
    * overlap.rs:406-434 (kernel absent; standard definition). Caches one MA
    * series per distinct period. */
  def mavp(x: Array[Double], periods: Array[Double], minP: Int, maxP: Int, matype: Int): Array[Double] = {
    val cache = scala.collection.mutable.Map.empty[Int, Array[Double]]
    Array.tabulate(x.length) { i =>
      if (!ok(periods(i))) NA
      else {
        val p = math.min(math.max(periods(i).toInt, minP), maxP)
        cache.getOrElseUpdate(p, ma(x, p, matype))(i)
      }
    }
  }
}
