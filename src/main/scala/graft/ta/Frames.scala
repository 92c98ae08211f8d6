package graft.ta

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

/** Window-frame-expressible technical indicators (SURVEY.md §2.1–2.3).
  *
  * Every function returns a lazy `Column`, so arbitrarily many indicators
  * compose into ONE Catalyst plan with a single window exchange per
  * (partitionBy, orderBy) pair — unlike the reference, whose eager wrappers
  * materialize a plan per indicator (reference
  * `python/polars_quant/talib/momentum.py:14-16`).
  *
  * All functions take an implicit per-series `WindowSpec`
  * (`Window.partitionBy("symbol").orderBy("ord")`). Warm-up semantics match
  * the reference (`src/talib/overlap.rs:889-912`): the first `n−1` rows of a
  * length-`n` study are null, enforced by gating on the window row count.
  *
  * Scale: window functions shuffle once on the partition key and stream each
  * partition in sort order — O(n) per series for running frames; sliding
  * min/max are O(n·w). Series are distributed across executors; a single
  * series' history only needs to fit one executor's working set.
  *
  * Null semantics vs Kernels (documented divergence): Frames gates on "the
  * last n PHYSICAL rows hold n non-null values", while Kernels compacts
  * over "the last n VALID values" (the reference's skip semantics). The two
  * agree whenever nulls form a prefix (true of all testdata and of
  * indicator-over-indicator warmups); they diverge on interior nulls —
  * prefer the Kernels path for null-bearing data.
  */
object Frames {

  private def W(n: Int)(implicit w: WindowSpec): WindowSpec = w.rowsBetween(1 - n, 0)

  /** null until the frame holds n non-null values of x (warm-up gate). */
  private def gated(x: Column, n: Int, out: Column)(implicit w: WindowSpec): Column =
    when(count(x).over(W(n)) >= n, out)

  // ---- overlap studies (reference src/talib/overlap.rs) ----

  /** SMA — overlap.rs:493-500,871-937. */
  def sma(x: Column, n: Int)(implicit w: WindowSpec): Column =
    gated(x, n, avg(x).over(W(n)))

  /** WMA (linear weights n..1, newest heaviest) — overlap.rs:530-537,1328-1399. */
  def wma(x: Column, n: Int)(implicit w: WindowSpec): Column = {
    val num = (0 until n).map(k => lag(x, k).over(w) * lit(n - k)).reduce(_ + _)
    gated(x, n, num / lit(n * (n + 1) / 2.0))
  }

  /** TRIMA = SMA(SMA(x, ceil(n/2)), floor(n/2)+1) — overlap.rs:1313-1326. */
  def trima(x: Column, n: Int)(implicit w: WindowSpec): Column = {
    val n1 = n / 2 + 1       // floor(n/2)+1
    val n2 = n - n / 2       // ceil(n/2)
    sma(sma(x, n2), n1)
  }

  /** Bollinger middle band ≡ SMA. upper/lower = mid ± k·stddev_pop — overlap.rs:46-116. */
  def bbandsUpper(x: Column, n: Int, k: Double)(implicit w: WindowSpec): Column =
    gated(x, n, avg(x).over(W(n)) + lit(k) * stddev_pop(x).over(W(n)))
  def bbandsMiddle(x: Column, n: Int)(implicit w: WindowSpec): Column = sma(x, n)
  def bbandsLower(x: Column, n: Int, k: Double)(implicit w: WindowSpec): Column =
    gated(x, n, avg(x).over(W(n)) - lit(k) * stddev_pop(x).over(W(n)))

  /** MIDPOINT = (max+min)/2 over n — overlap.rs:179-278. */
  def midpoint(x: Column, n: Int)(implicit w: WindowSpec): Column =
    gated(x, n, (max(x).over(W(n)) + min(x).over(W(n))) / 2)

  /** MIDPRICE = (max(high)+min(low))/2 over n — overlap.rs:280-404. */
  def midprice(h: Column, l: Column, n: Int)(implicit w: WindowSpec): Column =
    gated(h, n, (max(h).over(W(n)) + min(l).over(W(n))) / 2)

  // ---- momentum, frame-expressible subset (reference src/talib/momentum.rs) ----

  /** MOM = x − x[t−n] — momentum.rs:383-397. */
  def mom(x: Column, n: Int)(implicit w: WindowSpec): Column = x - lag(x, n).over(w)

  /** A zero n-bars-ago price emits 0, not an error: TA-Lib's ROC-family
    * convention, and under Spark's default ANSI mode the bare division
    * would THROW at the first zero in the data (found by a full sf0.1
    * verify — six zero closes that the sf0.01 gate never sees). */
  private def refGuard(prev: Column, out: Column): Column =
    when(prev === 0, 0.0).otherwise(out)

  /** ROC = 100·(x/x[t−n] − 1); x[t−n] = 0 → 0 — momentum.rs:438-453. */
  def roc(x: Column, n: Int)(implicit w: WindowSpec): Column = {
    val p = lag(x, n).over(w)
    refGuard(p, lit(100) * (x / p - 1))
  }

  /** ROCP — momentum.rs:455-470. */
  def rocp(x: Column, n: Int)(implicit w: WindowSpec): Column = {
    val p = lag(x, n).over(w)
    refGuard(p, (x - p) / p)
  }

  /** ROCR — momentum.rs:472-487. */
  def rocr(x: Column, n: Int)(implicit w: WindowSpec): Column = {
    val p = lag(x, n).over(w)
    refGuard(p, x / p)
  }

  /** ROCR100 — momentum.rs:489-504. */
  def rocr100(x: Column, n: Int)(implicit w: WindowSpec): Column = {
    val p = lag(x, n).over(w)
    refGuard(p, lit(100) * x / p)
  }

  /** CMO = 100·(ΣUp−ΣDn)/(ΣUp+ΣDn) over n diffs — momentum.rs:180-223. */
  def cmo(x: Column, n: Int)(implicit w: WindowSpec): Column = {
    val d  = x - lag(x, 1).over(w)
    val up = when(d > 0, d).otherwise(when(d.isNull, lit(null)).otherwise(lit(0.0)))
    val dn = when(d < 0, -d).otherwise(when(d.isNull, lit(null)).otherwise(lit(0.0)))
    val su = sum(up).over(W(n))
    val sd = sum(dn).over(W(n))
    gated(up, n, when(su + sd === 0, 0.0).otherwise(lit(100) * (su - sd) / (su + sd)))
  }

  /** WILLR = −100·(HH−c)/(HH−LL); flat range → 0 — momentum.rs:629-662. */
  def willr(h: Column, l: Column, c: Column, n: Int)(implicit w: WindowSpec): Column = {
    val hh = max(h).over(W(n))
    val ll = min(l).over(W(n))
    gated(h, n, when(hh === ll, 0.0).otherwise(lit(-100) * (hh - c) / (hh - ll)))
  }

  /** BOP = (c−o)/(h−l); flat bar → 0 — momentum.rs:112-135. Stateless. */
  def bop(o: Column, h: Column, l: Column, c: Column): Column =
    when(h === l, 0.0).otherwise((c - o) / (h - l))

  /** CCI = (tp − SMA(tp)) / (0.015·meanAbsDev) — momentum.rs:137-178.
    * Mean absolute deviation is from the *current frame's* mean, so the frame
    * is materialized with collect_list + a codegen'd higher-order aggregate.
    */
  def cci(h: Column, l: Column, c: Column, n: Int)(implicit w: WindowSpec): Column = {
    val tp  = (h + l + c) / 3
    val m   = avg(tp).over(W(n))
    val arr = collect_list(tp).over(W(n))
    val mad = aggregate(arr, lit(0.0), (acc, v) => acc + abs(v - m)) / n
    gated(h, n, when(mad === 0, 0.0).otherwise((tp - m) / (lit(0.015) * mad)))
  }

  /** MFI — signed TP·V money flows over n — momentum.rs:285-342. negMF=0 → 100. */
  def mfi(h: Column, l: Column, c: Column, v: Column, n: Int)(implicit w: WindowSpec): Column = {
    val tp = (h + l + c) / 3
    val d  = tp - lag(tp, 1).over(w)
    val pos = when(d > 0, tp * v).otherwise(when(d.isNull, lit(null)).otherwise(lit(0.0)))
    val neg = when(d < 0, tp * v).otherwise(when(d.isNull, lit(null)).otherwise(lit(0.0)))
    val sp = sum(pos).over(W(n))
    val sn = sum(neg).over(W(n))
    gated(pos, n, when(sn === 0, 100.0).otherwise(lit(100) - lit(100) / (lit(1) + sp / sn)))
  }

  /** ULTOSC — BP/TR ratio-of-sums at 3 horizons, weights 4/2/1 — momentum.rs:571-627.
    * The first bar has no previous close and must emit NO bp/tr
    * (TA-Lib lookback: first output at index n3, golden-tested): Spark's
    * least/greatest IGNORE null args, so without the explicit guard bar 0
    * would contribute bp = c−l and shift the whole series one bar early. */
  def ultosc(h: Column, l: Column, c: Column, n1: Int, n2: Int, n3: Int)(implicit w: WindowSpec): Column = {
    val pc = lag(c, 1).over(w)
    val bp = when(pc.isNull, lit(null)).otherwise(c - least(l, pc))
    val tr = when(pc.isNull, lit(null)).otherwise(greatest(h, pc) - least(l, pc))
    def ratio(n: Int) = sum(bp).over(W(n)) / sum(tr).over(W(n))
    gated(bp, n3, lit(100.0 / 7.0) * (lit(4) * ratio(n1) + lit(2) * ratio(n2) + ratio(n3)))
  }

  /** Fast %K = 100·(c−LL)/(HH−LL); flat window → 0 (mirrors willr/stochrsi
    * so the three siblings agree on degenerate frames) — momentum.py:178-195. */
  def stochFastK(h: Column, l: Column, c: Column, n: Int)(implicit w: WindowSpec): Column = {
    val hh = max(h).over(W(n))
    val ll = min(l).over(W(n))
    gated(h, n, when(hh === ll, 0.0).otherwise(lit(100) * (c - ll) / (hh - ll)))
  }

  /** AROON up/down = 100·(n − bars-since-extreme)/n over n+1 rows; latest
    * extreme wins ties (reference scans `start..=i` keeping ≥ — momentum.rs:63-110). */
  def aroonUp(h: Column, n: Int)(implicit w: WindowSpec): Column = {
    val arr = collect_list(h).over(W(n + 1))
    val since = array_position(reverse(arr), array_max(arr)) - 1
    gated(h, n + 1, lit(100.0) * (lit(n) - since) / n)
  }
  def aroonDown(l: Column, n: Int)(implicit w: WindowSpec): Column = {
    val arr = collect_list(l).over(W(n + 1))
    val since = array_position(reverse(arr), array_min(arr)) - 1
    gated(l, n + 1, lit(100.0) * (lit(n) - since) / n)
  }
  /** AROONOSC = aroon_up − aroon_down (kernel missing in reference; standard
    * TA-Lib semantics — python momentum.py:40-45). */
  def aroonosc(h: Column, l: Column, n: Int)(implicit w: WindowSpec): Column =
    aroonUp(h, n) - aroonDown(l, n)

  // ---- volume / volatility / price transforms (src/talib/{volume,volatility,price}.rs) ----

  /** TRANGE = max(h−l, |h−pc|, |l−pc|); first row null — volatility.rs:50-84. */
  def trange(h: Column, l: Column, c: Column)(implicit w: WindowSpec): Column = {
    val pc = lag(c, 1).over(w)
    when(pc.isNull, lit(null)).otherwise(greatest(h - l, abs(h - pc), abs(l - pc)))
  }

  /** Chaikin A/D line — cumulative CLV·V; h=l bars contribute 0 — volume.rs:18-31,100-126. */
  def ad(h: Column, l: Column, c: Column, v: Column)(implicit w: WindowSpec): Column = {
    val clv = when(h === l, 0.0).otherwise(((c - l) - (h - c)) / (h - l) * v)
    sum(clv).over(w.rowsBetween(Long.MinValue, 0))
  }

  /** OBV, standard sign convention (the reference inverts it — a recorded bug,
    * volume.rs:78; SURVEY.md §5.5). First row contributes +v (TA-Lib seed). */
  def obv(c: Column, v: Column)(implicit w: WindowSpec): Column = {
    val pc = lag(c, 1).over(w)
    val term = when(pc.isNull, v)
      .otherwise(when(c > pc, v).when(c < pc, -v).otherwise(lit(0.0)))
    sum(term).over(w.rowsBetween(Long.MinValue, 0))
  }

  /** AVGPRICE — price.rs:9-30. */
  def avgprice(o: Column, h: Column, l: Column, c: Column): Column = (o + h + l + c) / 4
  /** MEDPRICE — price.rs:32-49. */
  def medprice(h: Column, l: Column): Column = (h + l) / 2
  /** TYPPRICE — price.rs:51-70. */
  def typprice(h: Column, l: Column, c: Column): Column = (h + l + c) / 3
  /** WCLPRICE — price.rs:72-91. */
  def wclprice(h: Column, l: Column, c: Column): Column = (h + l + c * 2) / 4
}
