package graft.ta

import org.apache.spark.sql.DataFrame

/** DataFrame-level API for the recurrence indicators (SURVEY.md §2 "loop
  * op" rows). Inputs are long-format frames with `symbol`/`ord` plus the
  * named value columns; outputs are `(symbol, ord, <out cols>)` frames that
  * join back on (symbol, ord).
  */
object Recursive {
  import Kernels._

  private def one(df: DataFrame, in: Seq[String], out: String)(k: Array[Array[Double]] => Array[Double]): DataFrame =
    SeriesOps.overSeries(df, in, Seq(out))(a => Array(k(a)))

  /** Compute ANY number of recursive kernels in ONE shuffle pass.
    * Each kernel sees the `in` columns as arrays (indexed by position) and
    * emits one output column; input columns are carried through, so k
    * indicators cost one shuffle and zero join-backs (the round-1 design
    * cost k shuffles + k joins — VERDICT.md "What's wrong" #3).
    */
  def multi(df: DataFrame, in: Seq[String],
            kernels: Seq[(String, Array[Array[Double]] => Array[Double])]): DataFrame =
    SeriesOps.overSeries(df, in, kernels.map(_._1))(a => kernels.map(_._2(a)).toArray)

  def ema(df: DataFrame, x: String, n: Int, out: String = "ema"): DataFrame =
    one(df, Seq(x), out)(a => Kernels.ema(a(0), n))
  def rma(df: DataFrame, x: String, n: Int, out: String = "rma"): DataFrame =
    one(df, Seq(x), out)(a => Kernels.rma(a(0), n))
  def dema(df: DataFrame, x: String, n: Int, out: String = "dema"): DataFrame =
    one(df, Seq(x), out)(a => Kernels.dema(a(0), n))
  def tema(df: DataFrame, x: String, n: Int, out: String = "tema"): DataFrame =
    one(df, Seq(x), out)(a => Kernels.tema(a(0), n))
  def t3(df: DataFrame, x: String, n: Int, vfactor: Double = 0.7, out: String = "t3"): DataFrame =
    one(df, Seq(x), out)(a => Kernels.t3(a(0), n, vfactor))
  def kama(df: DataFrame, x: String, n: Int, out: String = "kama"): DataFrame =
    one(df, Seq(x), out)(a => Kernels.kama(a(0), n))
  def ma(df: DataFrame, x: String, n: Int, matype: Int, out: String = "ma"): DataFrame =
    one(df, Seq(x), out)(a => Kernels.ma(a(0), n, matype))
  def mavp(df: DataFrame, x: String, periods: String, minP: Int = 2, maxP: Int = 30,
           matype: Int = 0, out: String = "mavp"): DataFrame =
    one(df, Seq(x, periods), out)(a => Kernels.mavp(a(0), a(1), minP, maxP, matype))

  def rsi(df: DataFrame, x: String, n: Int = 14, out: String = "rsi"): DataFrame =
    one(df, Seq(x), out)(a => Kernels.rsi(a(0), n))
  def trix(df: DataFrame, x: String, n: Int = 30, out: String = "trix"): DataFrame =
    one(df, Seq(x), out)(a => Kernels.trix(a(0), n))

  /** MACD → (macd, macd_signal, macd_hist) — momentum.rs:249-283. */
  def macd(df: DataFrame, x: String, fast: Int = 12, slow: Int = 26, sig: Int = 9): DataFrame =
    SeriesOps.overSeries(df, Seq(x), Seq("macd", "macd_signal", "macd_hist")) { a =>
      val (d, s, h) = Kernels.macd(a(0), fast, slow, sig)
      Array(d, s, h)
    }

  /** MACDEXT — per-leg MA types — momentum.py:83-88. */
  def macdext(df: DataFrame, x: String, fast: Int, fastType: Int, slow: Int, slowType: Int,
              sig: Int, sigType: Int): DataFrame =
    SeriesOps.overSeries(df, Seq(x), Seq("macd", "macd_signal", "macd_hist")) { a =>
      val ef = Kernels.ma(a(0), fast, fastType)
      val es = Kernels.ma(a(0), slow, slowType)
      val dif = Array.tabulate(a(0).length)(i =>
        if (!ef(i).isNaN && !es(i).isNaN) ef(i) - es(i) else Double.NaN)
      val sg = Kernels.ma(dif, sig, sigType)
      val hist = Array.tabulate(dif.length)(i =>
        if (!dif(i).isNaN && !sg(i).isNaN) dif(i) - sg(i) else Double.NaN)
      Array(dif, sg, hist)
    }

  /** MACDFIX — fixed 12/26 — momentum.py:90-92. */
  def macdfix(df: DataFrame, x: String, sig: Int = 9): DataFrame = macd(df, x, 12, 26, sig)

  /** APO = MA_fast − MA_slow (kernel missing in reference; standard) — momentum.py:25-30. */
  def apo(df: DataFrame, x: String, fast: Int = 12, slow: Int = 26, matype: Int = 0,
          out: String = "apo"): DataFrame =
    one(df, Seq(x), out) { a =>
      val f = Kernels.ma(a(0), fast, matype); val s = Kernels.ma(a(0), slow, matype)
      Array.tabulate(a(0).length)(i => if (!f(i).isNaN && !s(i).isNaN) f(i) - s(i) else Double.NaN)
    }

  /** PPO = 100·(MAf−MAs)/MAs — momentum.py:136-141. */
  def ppo(df: DataFrame, x: String, fast: Int = 12, slow: Int = 26, matype: Int = 0,
          out: String = "ppo"): DataFrame =
    one(df, Seq(x), out) { a =>
      val f = Kernels.ma(a(0), fast, matype); val s = Kernels.ma(a(0), slow, matype)
      Array.tabulate(a(0).length)(i =>
        if (!f(i).isNaN && !s(i).isNaN && s(i) != 0) 100.0 * (f(i) - s(i)) / s(i) else Double.NaN)
    }

  def atr(df: DataFrame, h: String = "high", l: String = "low", c: String = "close",
          n: Int = 14, out: String = "atr"): DataFrame =
    one(df, Seq(h, l, c), out)(a => Kernels.atr(a(0), a(1), a(2), n))
  def natr(df: DataFrame, h: String = "high", l: String = "low", c: String = "close",
           n: Int = 14, out: String = "natr"): DataFrame =
    one(df, Seq(h, l, c), out) { a =>
      val at = Kernels.atr(a(0), a(1), a(2), n)
      Array.tabulate(a(2).length)(i =>
        if (!at(i).isNaN && a(2)(i) != 0) 100.0 * at(i) / a(2)(i) else Double.NaN)
    }
  def adosc(df: DataFrame, h: String = "high", l: String = "low", c: String = "close",
            v: String = "volume", fast: Int = 3, slow: Int = 10, out: String = "adosc"): DataFrame =
    one(df, Seq(h, l, c, v), out)(a => Kernels.adosc(a(0), a(1), a(2), a(3), fast, slow))

  def adx(df: DataFrame, h: String = "high", l: String = "low", c: String = "close",
          n: Int = 14, out: String = "adx"): DataFrame =
    one(df, Seq(h, l, c), out)(a => Kernels.adx(a(0), a(1), a(2), n))
  def adxr(df: DataFrame, h: String = "high", l: String = "low", c: String = "close",
           n: Int = 14, out: String = "adxr"): DataFrame =
    one(df, Seq(h, l, c), out)(a => Kernels.adxr(a(0), a(1), a(2), n))
  def dx(df: DataFrame, h: String = "high", l: String = "low", c: String = "close",
         n: Int = 14, out: String = "dx"): DataFrame =
    one(df, Seq(h, l, c), out)(a => Kernels.dmPipeline(a(0), a(1), a(2), n)._3)
  /** Correct +DI (the reference returns DX here — recorded bug, momentum.rs:399-411). */
  def plusDi(df: DataFrame, h: String = "high", l: String = "low", c: String = "close",
             n: Int = 14, out: String = "plus_di"): DataFrame =
    one(df, Seq(h, l, c), out)(a => Kernels.dmPipeline(a(0), a(1), a(2), n)._1)
  def minusDi(df: DataFrame, h: String = "high", l: String = "low", c: String = "close",
              n: Int = 14, out: String = "minus_di"): DataFrame =
    one(df, Seq(h, l, c), out)(a => Kernels.dmPipeline(a(0), a(1), a(2), n)._2)
  def plusDm(df: DataFrame, h: String = "high", l: String = "low",
             n: Int = 14, out: String = "plus_dm"): DataFrame =
    one(df, Seq(h, l), out) { a =>
      val c = a(0).clone() // TR unused for DM output; pipeline needs a close array
      Kernels.dmPipeline(a(0), a(1), c, n)._4
    }
  def minusDm(df: DataFrame, h: String = "high", l: String = "low",
              n: Int = 14, out: String = "minus_dm"): DataFrame =
    one(df, Seq(h, l), out) { a =>
      val c = a(0).clone()
      Kernels.dmPipeline(a(0), a(1), c, n)._5
    }

  def sar(df: DataFrame, h: String = "high", l: String = "low",
          accel: Double = 0.02, maxA: Double = 0.2, out: String = "sar"): DataFrame =
    one(df, Seq(h, l), out)(a => Kernels.sar(a(0), a(1), accel, maxA))
  def sarext(df: DataFrame, h: String = "high", l: String = "low",
             startValue: Double = 0, offsetOnReverse: Double = 0,
             accelInitLong: Double = 0.02, accelLong: Double = 0.02, accelMaxLong: Double = 0.2,
             accelInitShort: Double = 0.02, accelShort: Double = 0.02, accelMaxShort: Double = 0.2,
             out: String = "sarext"): DataFrame =
    one(df, Seq(h, l), out)(a => Kernels.sarext(a(0), a(1), startValue, offsetOnReverse,
      accelInitLong, accelLong, accelMaxLong, accelInitShort, accelShort, accelMaxShort))

  /** STOCH (slow) → (slowk, slowd) with matype dispatch — momentum.py:178-186. */
  def stoch(df: DataFrame, h: String = "high", l: String = "low", c: String = "close",
            fastkN: Int = 5, slowkN: Int = 3, slowkType: Int = 0,
            slowdN: Int = 3, slowdType: Int = 0): DataFrame =
    SeriesOps.overSeries(df, Seq(h, l, c), Seq("slowk", "slowd")) { a =>
      val (k, d) = Kernels.stoch(a(0), a(1), a(2), fastkN, slowkN, slowkType, slowdN, slowdType)
      Array(k, d)
    }

  /** STOCHF (fast) → (fastk, fastd) — momentum.py:188-195. */
  def stochf(df: DataFrame, h: String = "high", l: String = "low", c: String = "close",
             fastkN: Int = 5, fastdN: Int = 3, fastdType: Int = 0): DataFrame =
    SeriesOps.overSeries(df, Seq(h, l, c), Seq("fastk", "fastd")) { a =>
      val (k, d) = Kernels.stochf(a(0), a(1), a(2), fastkN, fastdN, fastdType)
      Array(k, d)
    }

  /** All six HT_* cycle outputs + MAMA/FAMA in ONE pass over each series
    * (shared MesaState — SURVEY.md §2.4, reference cycle.rs:9-448). */
  def htAll(df: DataFrame, x: String = "close",
            fast: Double = 0.5, slow: Double = 0.05): DataFrame =
    SeriesOps.overSeries(df, Seq(x),
      Seq("ht_dcperiod", "ht_dcphase", "inphase", "quadrature", "sine",
        "leadsine", "ht_trendline", "ht_trendmode", "mama", "fama"))(
      a => Cycle.mesa(a(0), fast, slow))

  /** MAMA → (mama, fama) — overlap.rs:155-177 (kernel absent from snapshot;
    * standard Ehlers definition sharing the MESA machinery). */
  def mama(df: DataFrame, x: String = "close",
           fast: Double = 0.5, slow: Double = 0.05): DataFrame =
    SeriesOps.overSeries(df, Seq(x), Seq("mama", "fama")) { a =>
      val m = Cycle.mesa(a(0), fast, slow)
      Array(m(Cycle.MAMA), m(Cycle.FAMA))
    }

  /** STOCHRSI → (fastk_rsi, fastd_rsi) — momentum.py:197-205. */
  def stochrsi(df: DataFrame, x: String, n: Int = 14, fastkN: Int = 5, fastdN: Int = 3): DataFrame =
    SeriesOps.overSeries(df, Seq(x), Seq("fastk_rsi", "fastd_rsi")) { a =>
      val (k, d) = Kernels.stochrsi(a(0), n, fastkN, fastdN)
      Array(k, d)
    }
}
