package graft

import graft.bt._
import org.scalatest.funsuite.AnyFunSuite

/** Scripted-scenario tests reproducing the reference's fill arithmetic by
  * hand (vectorized.rs:146-175, sequential.rs:48-158, metrics.rs:7-152). */
class BtSpec extends AnyFunSuite {
  private def close(a: Double, b: Double, eps: Double = 1e-9) =
    assert(math.abs(a - b) <= eps * math.max(1.0, math.abs(b)), s"$a != $b")

  private val cfg = Vectorized.Config(initialCapital = 1000.0, buyCommissionRate = 0.001,
    sellCommissionRate = 0.001, minCommission = 1.0)

  test("vectorized: scripted buy/sell cycle with hand-computed fills") {
    val r = Vectorized.runSeries(
      Array(10, 10, 20, 5, 5),
      Array(true, false, false, true, false),
      Array(false, false, true, false, false), cfg)
    // i0: qty=floor(1000/10)=100, cost 1000, fee max(1, 1)=1 → cash −1
    close(r.positions(0), 100.0); close(r.cash(0), -1.0); close(r.equity(0), 999.0)
    // i2: revenue 2000, fee 2, net 1998 > entry 1000 → win
    close(r.positions(2), 0.0); close(r.cash(2), 1997.0); close(r.equity(2), 1997.0)
    // i3: qty=floor(1997/5)=399, cost 1995, fee max(1.995,1)
    close(r.positions(3), 399.0); close(r.cash(3), 0.005); close(r.equity(3), 1995.005)
    assert(r.trades == 2 && r.wins == 1)
  }

  test("vectorized: buy ignored when already positioned; sell ignored when flat") {
    val r = Vectorized.runSeries(
      Array(10, 10, 10), Array(true, true, false), Array(true, false, true), cfg)
    // i0: buy wins over sell branch (flat); i1 buy ignored; i2 sell executes
    assert(r.trades == 1)
    close(r.positions(1), 100.0)
    close(r.positions(2), 0.0)
  }

  test("vectorized: NaN price only marks to market, state intact") {
    val r = Vectorized.runSeries(
      Array(10, Double.NaN, 20), Array(true, true, false), Array(false, false, true), cfg)
    close(r.positions(0), 100.0)
    close(r.positions(1), 100.0)          // unchanged through the NaN bar
    assert(r.equity(1).isNaN)             // 100 · NaN marks to NaN (rs:141-144)
    close(r.cash(2), -1.0 + 2000.0 - 2.0) // sell proceeds on the next bar
    assert(r.trades == 1 && r.wins == 1)
  }

  test("vectorized: accounting identity cash + position·price == equity") {
    val prices = Array.tabulate(100)(i => 50.0 + (i * 7919 % 100) / 10.0)
    val buys = Array.tabulate(100)(i => i % 7 == 0)
    val sells = Array.tabulate(100)(i => i % 11 == 0)
    val r = Vectorized.runSeries(prices, buys, sells, cfg)
    (0 until 100).foreach(i => close(r.equity(i), r.cash(i) + r.positions(i) * prices(i)))
  }

  test("vectorized: win NOT counted when net revenue == entry cost") {
    // buy at 10 (entry 1000), sell at same price: net = 2000·... < entry → no win
    val r = Vectorized.runSeries(
      Array(10, 10), Array(true, false), Array(false, true), cfg)
    assert(r.trades == 1 && r.wins == 0)
  }

  test("metrics: flat curve → sharpe 0, dd 0; known drawdown curve") {
    val m1 = Metrics.summary(Array(1000, 1000, 1000), Array.empty, 1000, 0, 0)
    close(m1("sharpe_ratio"), 0.0); close(m1("max_drawdown"), 0.0)
    close(m1("annualized_return"), 0.0); close(m1("max_profit"), 0.0)
    val m2 = Metrics.summary(Array(900, 1100, 880), Array.empty, 1000, 4, 1)
    close(m2("max_drawdown"), (1100.0 - 880.0) / 1100.0)
    close(m2("win_rate"), 0.25)
    close(m2("total_trades"), 4.0)
  }

  test("metrics: beta 1 / alpha 0 against itself as benchmark") {
    // first element == initial capital: the reference seeds equity returns
    // with the capital (metrics.rs:23) but benchmark returns with
    // curve[0] (:88), so they only align when eq(0) == capital
    val eq = Array(1000.0, 1030.0, 990.0, 1050.0)
    val m = Metrics.summary(eq, eq, 1000, 0, 0)
    close(m("beta"), 1.0)
    close(m("alpha"), 0.0, 1e-6)
  }

  private val scfg = Sequential.Config(initialCapital = 10000.0, minCommission = 5.0)

  test("sequential: buy/sell round trip with hand-computed fills") {
    val r = Sequential.run(2, { (ctx, p) =>
      if (p == 0) ctx.buy("A", 10, 100) else ctx.sell("A", 10, 110)
    }, scfg)
    // buy: cost 1000, fee max(0.3, 5)=5 → cash 8995, equity 8995+1000
    close(r.equity(0), 9995.0)
    // sell: revenue 1100, fee 5, net 1095 > basis 1000 → win
    close(r.equity(1), 10090.0)
    assert(r.portfolio.totalTrades == 1 && r.portfolio.winningTrades == 1)
  }

  test("sequential: insufficient cash rejected (sequential.rs:62)") {
    val r = Sequential.run(1, (ctx, _) => ctx.buy("A", 1000, 100),
      Sequential.Config(initialCapital = 100.0))
    assert(r.portfolio.positions.isEmpty && r.portfolio.totalTrades == 0)
    close(r.equity(0), 100.0)
  }

  test("sequential: oversell rejected (sequential.rs:76)") {
    val r = Sequential.run(1, (ctx, _) => ctx.sell("A", 5, 100), scfg)
    assert(r.portfolio.totalTrades == 0)
    close(r.equity(0), 10000.0)
  }

  test("sequential: order validation drops NaN/non-positive price and qty") {
    val r = Sequential.run(1, { (ctx, _) =>
      ctx.buy("A", 10, Double.NaN); ctx.buy("A", 10, -5); ctx.buy("A", 0, 100)
      ctx.sell("A", -3, 100)
    }, scfg)
    assert(r.portfolio.totalTrades == 0)
  }

  test("sequential: entry price overwritten on re-buy (quirk, sequential.rs:134)") {
    val r = Sequential.run(3, { (ctx, p) =>
      if (p == 0) ctx.buy("A", 10, 100)
      else if (p == 1) ctx.buy("A", 10, 200)
      else ctx.sell("A", 20, 150)
    }, Sequential.Config(initialCapital = 10000.0, minCommission = 0.0, buyCommissionRate = 0.0, sellCommissionRate = 0.0))
    // basis uses the OVERWRITTEN entry 200: 20·150 = 3000 < 20·200 → no win,
    // though the true average cost (150) would have made it break-even
    assert(r.portfolio.winningTrades == 0)
    close(r.portfolio.cash, 10000.0 - 1000.0 - 2000.0 + 3000.0)
    assert(r.portfolio.positions.isEmpty)  // purged at ≤1e-8
  }

  test("sequential: equity marks from last-traded board, rejected orders still post prices") {
    val r = Sequential.run(2, { (ctx, p) =>
      if (p == 0) ctx.buy("A", 10, 100)
      else ctx.buy("A", 1000000, 500)  // rejected, but price board → 500
    }, Sequential.Config(initialCapital = 10000.0, minCommission = 0.0,
      buyCommissionRate = 0.0, sellCommissionRate = 0.0))
    close(r.equity(0), 10000.0)              // fee 0: cash 9000 + 10·100
    close(r.equity(1), 9000.0 + 10 * 500.0)  // marked at the posted 500
  }

  test("sequential: multi-asset portfolio — per-asset board, re-buy overwrite, oversell") {
    val cfg = Sequential.Config(initialCapital = 10000.0, minCommission = 0.0,
      buyCommissionRate = 0.0, sellCommissionRate = 0.0)
    val r = Sequential.run(4, { (ctx, p) =>
      p match {
        case 0 => ctx.buy("A", 10, 100); ctx.buy("B", 5, 200) // cash 8000
        case 1 => ctx.sell("B", 10, 210)  // oversell (hold 5) rejected; board B→210
        case 2 => ctx.buy("A", 10, 120)   // re-buy: entry A overwritten to 120
        case 3 => ctx.sell("A", 20, 130); ctx.sell("B", 5, 190)
      }
    }, cfg)
    close(r.equity(0), 8000.0 + 10 * 100.0 + 5 * 200.0)   // 10000
    close(r.equity(1), 8000.0 + 1000.0 + 5 * 210.0)       // B marked at rejected 210
    close(r.equity(2), 6800.0 + 20 * 120.0 + 5 * 210.0)   // both assets marked
    close(r.equity(3), 6800.0 + 2600.0 + 950.0)           // flat: cash only
    assert(r.portfolio.positions.isEmpty)
    // A: revenue 2600 > 20·120 (overwritten entry) → win; B: 950 < 5·200 → loss
    assert(r.portfolio.totalTrades == 3 && r.portfolio.winningTrades == 1)
  }
}
