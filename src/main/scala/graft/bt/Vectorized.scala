package graft.bt

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Signal-driven vectorized backtester — port of reference
  * `src/backtest/vectorized.rs:69-224`, lifted from single-asset to
  * per-symbol-parallel: the same scan-fold runs inside
  * `groupByKey(symbol).flatMapGroups`, so a universe of symbols backtests
  * in one shuffle with each symbol's fold sequential (as it must be) and
  * symbols embarrassingly parallel across executors.
  *
  * Fill semantics (faithful to the reference):
  *   - buy only when flat: deploy equity·positionSize at price+buySlippage,
  *     whole shares (floor), commission max(rate·cost, min) (rs:146-161);
  *     entry cost marked at the RAW price, not the execution price (rs:159)
  *   - sell liquidates the whole position at price−sellSlippage (rs:162-175);
  *     win iff net revenue > entry cost
  *   - NaN/≤0 price rows only mark to market (rs:141-144)
  */
object Vectorized {

  final case class Config(
    initialCapital: Double = 100000.0,
    buySlippage: Double = 0.0,
    sellSlippage: Double = 0.0,
    buyCommissionRate: Double = 0.0003,
    sellCommissionRate: Double = 0.0003,
    minCommission: Double = 5.0,
    positionSize: Double = 1.0)

  final case class SeriesResult(
    positions: Array[Double], cash: Array[Double], equity: Array[Double],
    trades: Int, wins: Int)

  /** Per-symbol running state of the fold (also the streaming state —
    * graft.streaming reuses [[step]] inside flatMapGroupsWithState). */
  final case class State(position: Double, cash: Double, entryCost: Double,
                         trades: Int, wins: Int)
  def initialState(cfg: Config): State = State(0.0, cfg.initialCapital, 0.0, 0, 0)

  /** One bar of the reference scan; returns the post-bar state. The
    * emitted (position, cash, equity) for the bar is read off the state. */
  def step(s: State, price: Double, buy: Boolean, sell: Boolean, cfg: Config): State = {
    if (price.isNaN || price <= 0.0) s  // mark-to-market only (vectorized.rs:141-144)
    else if (buy && s.position == 0.0) {
      val execPrice = price + cfg.buySlippage
      val equity = s.cash + s.position * price
      val qty = math.floor(equity * cfg.positionSize / execPrice)
      if (qty > 0.0) {
        val cost = qty * execPrice
        val fee = math.max(cost * cfg.buyCommissionRate, cfg.minCommission)
        State(s.position + qty, s.cash - cost - fee, (s.position + qty) * price,
          s.trades + 1, s.wins)
      } else s
    } else if (sell && s.position > 0.0) {
      val execPrice = price - cfg.sellSlippage
      val revenue = s.position * execPrice
      val fee = math.max(revenue * cfg.sellCommissionRate, cfg.minCommission)
      val net = revenue - fee
      State(0.0, s.cash + net, s.entryCost, s.trades,
        if (net > s.entryCost) s.wins + 1 else s.wins)
    } else s
  }

  /** The single-series fold (pure; exactly the reference scan). */
  def runSeries(prices: Array[Double], buys: Array[Boolean], sells: Array[Boolean],
                cfg: Config): SeriesResult = {
    val n = prices.length
    val posA = new Array[Double](n); val cashA = new Array[Double](n); val eqA = new Array[Double](n)
    var s = initialState(cfg)
    var i = 0
    while (i < n) {
      s = step(s, prices(i), buys(i), sells(i), cfg)
      posA(i) = s.position; cashA(i) = s.cash; eqA(i) = s.cash + s.position * prices(i)
      i += 1
    }
    SeriesResult(posA, cashA, eqA, s.trades, s.wins)
  }

  private def foldGroups[T](df: DataFrame, outSchema: StructType, cfg: Config)
                           (emit: (String, Array[Long], SeriesResult, Array[Double]) => Iterator[Row]): DataFrame = {
    val proj = df.select(
      col("symbol").cast(StringType), col("ord").cast(LongType),
      col("price").cast(DoubleType), col("buy_sig").cast(BooleanType),
      col("sell_sig").cast(BooleanType))
    proj.groupByKey(_.getString(0))(Encoders.STRING)
      .flatMapGroups { (sym: String, it: Iterator[Row]) =>
        val rows = it.toArray
        java.util.Arrays.sort(rows, Ordering.by((r: Row) => r.getLong(1)))
        val ords = rows.map(_.getLong(1))
        val prices = rows.map(r => if (r.isNullAt(2)) Double.NaN else r.getDouble(2))
        val buys = rows.map(r => !r.isNullAt(3) && r.getBoolean(3))
        val sells = rows.map(r => !r.isNullAt(4) && r.getBoolean(4))
        emit(sym, ords, runSeries(prices, buys, sells, cfg), prices)
      }(Encoders.row(outSchema))
  }

  /** Per-bar portfolio curves: (symbol, ord, position, cash, equity). */
  def run(df: DataFrame, cfg: Config = Config()): DataFrame = {
    val schema = StructType(Seq(
      StructField("symbol", StringType), StructField("ord", LongType),
      StructField("position", DoubleType), StructField("cash", DoubleType),
      StructField("equity", DoubleType)))
    foldGroups(df, schema, cfg) { (sym, ords, r, _) =>
      ords.indices.iterator.map(i =>
        Row(sym, ords(i), r.positions(i), r.cash(i), r.equity(i)))
    }
  }

  /** Per-symbol summary (metrics.rs-port applied to each symbol's curve). */
  def summary(df: DataFrame, cfg: Config = Config()): DataFrame = {
    val schema = StructType(StructField("symbol", StringType) ::
      Metrics.columns.toList.map(StructField(_, DoubleType)))
    foldGroups(df, schema, cfg) { (sym, _, r, _) =>
      val m = Metrics.summary(r.equity, Array.empty, cfg.initialCapital, r.trades, r.wins)
      Iterator.single(Row.fromSeq(sym +: Metrics.columns.map(m)))
    }
  }

  /** Per-symbol summary with CAPM alpha/beta measured against the
    * symbol's own price curve as the benchmark (buy-and-hold): the
    * benchmark series Metrics needs is exactly the bar-aligned price
    * array the fold already has, so no extra input or join — and beta is
    * genuinely nonzero whenever the strategy holds the asset at all. */
  def summaryVsPrice(df: DataFrame, cfg: Config = Config()): DataFrame = {
    val schema = StructType(StructField("symbol", StringType) ::
      Metrics.columns.toList.map(StructField(_, DoubleType)))
    foldGroups(df, schema, cfg) { (sym, _, r, prices) =>
      val m = Metrics.summary(r.equity, prices, cfg.initialCapital, r.trades, r.wins)
      Iterator.single(Row.fromSeq(sym +: Metrics.columns.map(m)))
    }
  }
}
