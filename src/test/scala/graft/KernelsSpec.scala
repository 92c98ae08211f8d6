package graft

import graft.ta.Kernels
import org.scalatest.funsuite.AnyFunSuite

/** Golden + property tests for the pure-array recurrence kernels — the
  * operators with no DuckDB oracle path by design (SURVEY.md §5.3).
  * Hand-derived expected values, algebraic identities from the reference
  * (TRIMA≡SMA∘SMA overlap.rs:1313-1326; ATR≡RMA(TR) volatility.rs:29-31;
  * ADXR from ADX momentum.rs:50-59), warm-up boundaries, and the
  * skip-don't-poison NaN convention (overlap.rs:891-894).
  */
class KernelsSpec extends AnyFunSuite {
  private val NA = Double.NaN
  private def ok(d: Double) = !d.isNaN
  private def assertClose(a: Double, b: Double, eps: Double = 1e-9): Unit =
    assert(ok(a) == ok(b) && (!ok(a) || math.abs(a - b) <= eps * math.max(1.0, math.abs(b))),
      s"$a != $b")
  private def assertSeq(a: Array[Double], b: Array[Double], eps: Double = 1e-9): Unit = {
    assert(a.length == b.length)
    a.indices.foreach(i => assert(ok(a(i)) == ok(b(i)) &&
      (!ok(a(i)) || math.abs(a(i) - b(i)) <= eps * math.max(1.0, math.abs(b(i)))),
      s"idx $i: ${a(i)} != ${b(i)}"))
  }

  /** Deterministic pseudo-random walk (no Math.random — reproducible). */
  private def walk(n: Int, seed: Long = 42L): Array[Double] = {
    var s = seed
    Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      100.0 + ((s >>> 33) % 2000).toDouble / 100.0 - 10.0
    }
  }
  private val w200 = walk(200)
  private def firstValid(a: Array[Double]): Int = a.indexWhere(ok)

  // ---- golden hand values ----

  test("sma golden") {
    assertSeq(Kernels.sma(Array(1, 2, 3, 4, 5), 3), Array(NA, NA, 2, 3, 4))
  }
  test("ema golden (alpha=1/2, SMA seed)") {
    assertSeq(Kernels.ema(Array(1, 2, 3, 4, 5), 3), Array(NA, NA, 2, 3, 4))
  }
  test("rma golden (alpha=1/3)") {
    assertSeq(Kernels.rma(Array(1, 2, 3, 4, 5), 3),
      Array(NA, NA, 2, 8.0 / 3, (5 + 16.0 / 3) / 3))
  }
  test("wma golden") {
    assertSeq(Kernels.wma(Array(1, 2, 3, 4), 3), Array(NA, NA, 14.0 / 6, 20.0 / 6))
  }
  test("rsi golden (alternating ±1, n=2)") {
    val r = Kernels.rsi(Array(1, 2, 1, 2), 2)
    assertSeq(r.take(2), Array(NA, NA))
    assertClose(r(2), 50.0)
    assertClose(r(3), 75.0)
  }
  test("rsi monotone-up = 100") {
    val r = Kernels.rsi(Array.tabulate(30)(i => i + 1.0), 14)
    assert(r.drop(14).forall(v => ok(v) && math.abs(v - 100.0) < 1e-12))
  }
  test("dema/tema track a linear ramp exactly after warm-up") {
    val x = Array.tabulate(30)(i => i + 1.0)
    val d = Kernels.dema(x, 3); val t = Kernels.tema(x, 3)
    (4 until 30).foreach(i => assertClose(d(i), x(i)))   // warmup 2n−2
    (6 until 30).foreach(i => assertClose(t(i), x(i)))   // warmup 3n−3
  }
  test("sar golden first value") {
    val h = Array(10.0, 11.0, 12.0)
    val l = Array(9.0, 10.5, 11.5)
    val s = Kernels.sar(h, l, 0.02, 0.2)
    assert(s(0).isNaN)
    assertClose(s(1), 9.0)   // initial long SAR = l(0)
    // advance 9 + .02·(11−9) = 9.04 is clamped back to prior low 9.0
    // (Wilder: SAR may not enter the previous bar's range)
    assertClose(s(2), 9.0)
  }

  // ---- warm-up boundaries (first non-NaN index) ----

  test("warm-up boundaries") {
    val n = 5
    assert(firstValid(Kernels.sma(w200, n)) == n - 1)
    assert(firstValid(Kernels.ema(w200, n)) == n - 1)
    assert(firstValid(Kernels.wma(w200, n)) == n - 1)
    assert(firstValid(Kernels.dema(w200, n)) == 2 * n - 2)
    assert(firstValid(Kernels.tema(w200, n)) == 3 * n - 3)
    assert(firstValid(Kernels.t3(w200, n, 0.7)) == 6 * n - 6)
    assert(firstValid(Kernels.kama(w200, n)) == n)
    assert(firstValid(Kernels.rsi(w200, n)) == n)
    assert(firstValid(Kernels.trix(w200, n)) == 3 * n - 2)
    val (h, l, c) = (w200.map(_ + 1), w200.map(_ - 1), w200)
    assert(firstValid(Kernels.adx(h, l, c, n)) == 2 * n - 1)
    assert(firstValid(Kernels.atr(h, l, c, n)) == n)     // TR from idx 1, RMA seed n
    assert(firstValid(Kernels.trange(h, l, c)) == 1)
    assert(firstValid(Kernels.sar(h, l, 0.02, 0.2)) == 1)
  }

  // ---- algebraic identities from the reference ----

  test("TRIMA == SMA∘SMA (overlap.rs:1313-1326)") {
    val n = 10
    assertSeq(Kernels.trima(w200, n),
      Kernels.sma(Kernels.sma(w200, n - n / 2), n / 2 + 1))
  }
  test("ATR == RMA(TRANGE) (volatility.rs:29-31)") {
    val (h, l, c) = (w200.map(_ + 2), w200.map(_ - 2), w200)
    assertSeq(Kernels.atr(h, l, c, 14), Kernels.rma(Kernels.trange(h, l, c), 14))
  }
  test("RMA(n) == EMA alpha 1/n identity") {
    assertSeq(Kernels.rma(w200, 7), Kernels.emaAlpha(w200, 7, 1.0 / 7))
  }
  test("ADXR == (ADX_t + ADX_{t-n+1})/2 (momentum.rs:50-59)") {
    val (h, l, c) = (w200.map(_ + 2), w200.map(_ - 2), w200)
    val n = 14
    val adx = Kernels.adx(h, l, c, n)
    val adxr = Kernels.adxr(h, l, c, n)
    (0 until 200).foreach { i =>
      if (i >= n - 1 && ok(adx(i)) && ok(adx(i - n + 1)))
        assertClose(adxr(i), (adx(i) + adx(i - n + 1)) / 2)
      else assert(adxr(i).isNaN)
    }
  }
  test("MACD hist == dif - signal") {
    val (dif, sig, hist) = Kernels.macd(w200, 12, 26, 9)
    (0 until 200).foreach { i =>
      if (ok(hist(i))) assertClose(hist(i), dif(i) - sig(i))
    }
  }
  test("DX/DI relationship") {
    val (h, l, c) = (w200.map(_ + 2), w200.map(_ - 2), w200)
    val (pdi, mdi, dx, _, _) = Kernels.dmPipeline(h, l, c, 14)
    (0 until 200).foreach { i =>
      if (ok(dx(i)) && pdi(i) + mdi(i) != 0)
        assertClose(dx(i), 100.0 * math.abs(pdi(i) - mdi(i)) / (pdi(i) + mdi(i)))
    }
  }
  test("MA dispatcher matches the underlying kernels (incl. matype 7 → SMA stub)") {
    assertSeq(Kernels.ma(w200, 10, 0), Kernels.sma(w200, 10))
    assertSeq(Kernels.ma(w200, 10, 1), Kernels.ema(w200, 10))
    assertSeq(Kernels.ma(w200, 10, 7), Kernels.sma(w200, 10))
    // matype 8 pins the reference dispatcher's vfactor 0 (overlap.rs:866)
    assertSeq(Kernels.ma(w200, 10, 8), Kernels.t3(w200, 10, 0.0))
  }
  test("STOCH slowK == MA(fastK); STOCHF fastD == MA(fastK)") {
    val (h, l, c) = (w200.map(_ + 2), w200.map(_ - 2), w200)
    val fastk = Kernels.stochFastK(h, l, c, 5)
    val (slowk, slowd) = Kernels.stoch(h, l, c, 5, 3, 0, 3, 0)
    assertSeq(slowk, Kernels.sma(fastk, 3))
    assertSeq(slowd, Kernels.sma(Kernels.sma(fastk, 3), 3))
    val (fk, fd) = Kernels.stochf(h, l, c, 5, 3, 1)
    assertSeq(fk, fastk)
    assertSeq(fd, Kernels.ema(fastk, 3))
  }

  // ---- NaN discipline: skip, don't poison ----

  /** Inserting a NaN mid-series must (a) emit NaN at that row and (b) leave
    * every other output identical to running the kernel on the compacted
    * series — i.e. interior nulls do not advance or corrupt window state. */
  private def checkSkip(f: Array[Double] => Array[Double]): Unit = {
    val clean = walk(60)
    val dirty = clean.take(30) ++ Array(NA, NA) ++ clean.drop(30)
    val outClean = f(clean)
    val outDirty = f(dirty)
    assert(outDirty(30).isNaN && outDirty(31).isNaN)
    val compact = outDirty.take(30) ++ outDirty.drop(32)
    assertSeq(compact, outClean)
  }
  test("NaN skip: sma") { checkSkip(Kernels.sma(_, 7)) }
  test("NaN skip: ema") { checkSkip(Kernels.ema(_, 7)) }
  test("NaN skip: wma") { checkSkip(Kernels.wma(_, 7)) }
  test("NaN skip: kama") { checkSkip(Kernels.kama(_, 7)) }
  test("NaN skip: rsi") { checkSkip(Kernels.rsi(_, 7)) }
  test("NaN skip: rollMax") { checkSkip(Kernels.rollMax(_, 7)) }

  private def checkSkipOhlc(f: (Array[Double], Array[Double], Array[Double]) => Array[Double]): Unit = {
    val c = walk(60); val h = c.map(_ + 2); val l = c.map(_ - 2)
    def dirty(a: Array[Double]) = a.take(30) ++ Array(NA) ++ a.drop(30)
    val outClean = f(h, l, c)
    val outDirty = f(dirty(h), dirty(l), dirty(c))
    assert(outDirty(30).isNaN)
    assertSeq(outDirty.take(30) ++ outDirty.drop(31), outClean)
  }
  test("NaN skip: trange") { checkSkipOhlc(Kernels.trange) }
  test("NaN skip: atr") { checkSkipOhlc(Kernels.atr(_, _, _, 7)) }
  test("NaN skip: adx") { checkSkipOhlc(Kernels.adx(_, _, _, 7)) }
  test("NaN skip: sar") { checkSkipOhlc((h, l, _) => Kernels.sar(h, l, 0.02, 0.2)) }
  test("NaN skip: adline") {
    val c = walk(60); val h = c.map(_ + 2); val l = c.map(_ - 2)
    val v = Array.tabulate(60)(i => 100.0 + i)
    def dirty(a: Array[Double]) = a.take(30) ++ Array(NA) ++ a.drop(30)
    val outClean = Kernels.adline(h, l, c, v)
    val outDirty = Kernels.adline(dirty(h), dirty(l), dirty(c), dirty(v))
    assert(outDirty(30).isNaN)
    assertSeq(outDirty.take(30) ++ outDirty.drop(31), outClean)
  }

  // ---- scale invariance (price·k leaves bounded oscillators unchanged) ----

  test("scale invariance: rsi/stochFastK/cmo-like bounded ops") {
    val c = walk(100); val h = c.map(_ + 2); val l = c.map(_ - 2)
    val k = 3.7
    assertSeq(Kernels.rsi(c.map(_ * k), 14), Kernels.rsi(c, 14), 1e-9)
    assertSeq(Kernels.stochFastK(h.map(_ * k), l.map(_ * k), c.map(_ * k), 5),
      Kernels.stochFastK(h, l, c, 5), 1e-9)
  }

  test("mavp clamps periods and matches fixed-period MA per row") {
    val x = walk(50)
    val periods = Array.tabulate(50)(i => (i % 20 + 1).toDouble) // some below min / above max
    val out = Kernels.mavp(x, periods, 5, 10, 0)
    val byP = (5 to 10).map(p => p -> Kernels.sma(x, p)).toMap
    (0 until 50).foreach { i =>
      val p = math.min(math.max(periods(i).toInt, 5), 10)
      val exp = byP(p)(i)
      assert(ok(out(i)) == ok(exp) && (!ok(exp) || math.abs(out(i) - exp) < 1e-9))
    }
  }
}
