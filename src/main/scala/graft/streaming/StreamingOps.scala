package graft.streaming

import graft.bt.Vectorized
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming analogs of the batch engine (SURVEY.md §7.4).
  * The reference is strictly batch; these extend the same semantics to
  * unbounded inputs the idiomatic Spark way:
  *
  *   - stateful recurrences (EMA/RMA) via `flatMapGroupsWithState` with
  *     per-symbol state — the streaming twin of SeriesOps.overSeries
  *   - the vectorized backtester as a stateful stream, reusing the SAME
  *     `Vectorized.step` bar arithmetic as the batch fold
  *   - watermarked event-time window aggregation over the raw event stream
  *
  * Ordering caveat (documented contract): rows are processed in `ord`
  * order WITHIN each micro-batch (sorted per group per batch); late
  * cross-batch arrivals are applied in arrival order, as is standard for
  * stateful streaming recurrences.
  */
object StreamingOps {

  final case class BarIn(symbol: String, ord: Long, close: Double)
  final case class EmaState(count: Long, sum: Double, ema: Double)
  final case class EmaOut(symbol: String, ord: Long, ema: Option[Double])

  /** Streaming SMA-seeded EMA (α = 2/(n+1)), per symbol — identical
    * recurrence to Kernels.ema. Output mode: append/update per batch. */
  def emaStream(bars: DataFrame, n: Int): DataFrame = {
    val alpha = 2.0 / (n + 1)
    implicit val stEnc = Encoders.product[EmaState]
    implicit val outEnc = Encoders.product[EmaOut]
    bars.select(col("symbol").cast("string"), col("ord").cast("long"),
        col("close").cast("double")).as[BarIn](Encoders.product[BarIn])
      .groupByKey(_.symbol)(Encoders.STRING)
      .flatMapGroupsWithState[EmaState, EmaOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (sym: String, rows: Iterator[BarIn], state: GroupState[EmaState]) =>
          var st = state.getOption.getOrElse(EmaState(0L, 0.0, Double.NaN))
          val out = rows.toSeq.sortBy(_.ord).map { b =>
            if (st.count < n - 1) {
              st = EmaState(st.count + 1, st.sum + b.close, st.ema)
              EmaOut(sym, b.ord, None)
            } else if (st.count == n - 1) {
              val seeded = (st.sum + b.close) / n
              st = EmaState(st.count + 1, 0.0, seeded)
              EmaOut(sym, b.ord, Some(seeded))
            } else {
              val e = alpha * b.close + (1 - alpha) * st.ema
              st = EmaState(st.count + 1, 0.0, e)
              EmaOut(sym, b.ord, Some(e))
            }
          }
          state.update(st)
          out.iterator
      }.toDF()
  }

  final case class SigBarIn(symbol: String, ord: Long, price: Double,
                            buy: Boolean, sell: Boolean)
  final case class BtOut(symbol: String, ord: Long, position: Double,
                         cash: Double, equity: Double)
  final case class BtStreamState(position: Double, cash: Double, entryCost: Double,
                                 trades: Int, wins: Int)

  /** Streaming vectorized backtest: per-symbol portfolio state carried
    * across micro-batches; bar arithmetic is Vectorized.step — batch and
    * stream can never drift. */
  def backtestStream(signals: DataFrame, cfg: Vectorized.Config = Vectorized.Config()): DataFrame = {
    implicit val stEnc = Encoders.product[BtStreamState]
    implicit val outEnc = Encoders.product[BtOut]
    signals.select(col("symbol").cast("string"), col("ord").cast("long"),
        col("price").cast("double"), col("buy_sig").cast("boolean").as("buy"),
        col("sell_sig").cast("boolean").as("sell")).as[SigBarIn](Encoders.product[SigBarIn])
      .groupByKey(_.symbol)(Encoders.STRING)
      .flatMapGroupsWithState[BtStreamState, BtOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (sym: String, rows: Iterator[SigBarIn], state: GroupState[BtStreamState]) =>
          val init = state.getOption
            .map(s => Vectorized.State(s.position, s.cash, s.entryCost, s.trades, s.wins))
            .getOrElse(Vectorized.initialState(cfg))
          var st = init
          val out = rows.toSeq.sortBy(_.ord).map { b =>
            st = Vectorized.step(st, b.price, b.buy, b.sell, cfg)
            BtOut(sym, b.ord, st.position, st.cash, st.cash + st.position * b.price)
          }
          state.update(BtStreamState(st.position, st.cash, st.entryCost, st.trades, st.wins))
          out.iterator
      }.toDF()
  }

  /** Watermarked event-time windowed aggregation over the raw event
    * stream: per (event_type, window) count/avg — the canonical streaming
    * rollup for the events table. `ts` must be a timestamp column. */
  def windowedStats(events: DataFrame, windowDur: String = "1 hour",
                    slideDur: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("event_type"), window(col("ts"), windowDur, slideDur))
      .agg(count(lit(1)).as("n_events"), avg("value").as("avg_value"),
        max("value").as("max_value"))
}
