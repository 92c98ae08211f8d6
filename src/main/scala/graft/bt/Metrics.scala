package graft.bt

/** Summary statistics for a backtest equity curve — port of reference
  * `src/backtest/metrics.rs:7-152`: 252 trading days, 3% risk-free rate,
  * sample variance (ddof=1), CAPM alpha/beta vs an aligned benchmark curve,
  * max_profit = max(total_return, 0).
  */
object Metrics {
  val TradingDaysPerYear = 252.0
  val RiskFreeRate = 0.03

  def summary(equityCurve: Array[Double], benchmarkCurve: Array[Double],
              initialCapital: Double, totalTrades: Int, winningTrades: Int): Map[String, Double] = {
    val days = equityCurve.length
    if (days == 0) return Map.empty

    var maxDrawdown = 0.0
    var peak = initialCapital
    var prev = initialCapital
    val dailyReturns = new Array[Double](days)
    var i = 0
    while (i < days) {
      val eq = equityCurve(i)
      if (eq > peak) peak = eq
      val dd = if (peak > 0.0) (peak - eq) / peak else 0.0
      if (dd > maxDrawdown) maxDrawdown = dd
      dailyReturns(i) = if (prev > 0.0) (eq - prev) / prev else 0.0
      prev = eq
      i += 1
    }

    val finalEquity = equityCurve.last
    val totalReturn = (finalEquity - initialCapital) / initialCapital
    val annualizedReturn =
      if (totalReturn > -1.0) math.pow(1.0 + totalReturn, TradingDaysPerYear / days) - 1.0
      else -1.0

    val meanRet = dailyReturns.sum / days
    val ddof = math.max(days - 1.0, 1.0)
    val variance = dailyReturns.map(r => (r - meanRet) * (r - meanRet)).sum / ddof
    val annVol = math.sqrt(variance) * math.sqrt(TradingDaysPerYear)
    val sharpe = if (annVol > 0.0) (annualizedReturn - RiskFreeRate) / annVol else 0.0
    val winRate = if (totalTrades > 0) winningTrades.toDouble / totalTrades else 0.0

    var alpha = 0.0
    var beta = 0.0
    if (benchmarkCurve.length == days) {
      val benchReturns = new Array[Double](days)
      var prevB = benchmarkCurve(0)
      i = 0
      while (i < days) {
        val b = benchmarkCurve(i)
        benchReturns(i) = if (prevB > 0.0) (b - prevB) / prevB else 0.0
        prevB = b
        i += 1
      }
      val meanB = benchReturns.sum / days
      val varB = benchReturns.map(r => (r - meanB) * (r - meanB)).sum / ddof
      val cov = dailyReturns.zip(benchReturns)
        .map { case (p, b) => (p - meanRet) * (b - meanB) }.sum / ddof
      if (varB > 0.0) beta = cov / varB
      val bStart = benchmarkCurve.head
      val bEnd = benchmarkCurve.last
      val bTotal = if (bStart > 0.0) (bEnd - bStart) / bStart else 0.0
      val bAnn =
        if (bTotal > -1.0) math.pow(1.0 + bTotal, TradingDaysPerYear / days) - 1.0 else -1.0
      alpha = annualizedReturn - (RiskFreeRate + beta * (bAnn - RiskFreeRate))
    }

    Map(
      "annualized_return" -> annualizedReturn,
      "max_drawdown" -> maxDrawdown,
      "alpha" -> alpha,
      "beta" -> beta,
      "sharpe_ratio" -> sharpe,
      "max_profit" -> math.max(totalReturn, 0.0),
      "win_rate" -> winRate,
      "total_trades" -> totalTrades.toDouble)
  }

  /** Stable column order for DataFrame-shaped summaries. */
  val columns: Seq[String] = Seq("annualized_return", "max_drawdown", "alpha", "beta",
    "sharpe_ratio", "max_profit", "win_rate", "total_trades")
}
