package graft

import graft.ta.Cycle
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the MESA/Hilbert state machine (reference
  * cycle.rs:9-448): warmup boundary at 32 bars, output ranges, the
  * trendline identity, and dominant-cycle detection on a pure sinusoid. */
class CycleSpec extends AnyFunSuite {
  private def ok(d: Double) = !d.isNaN
  private def sinusoid(n: Int, period: Double): Array[Double] =
    Array.tabulate(n)(i => 100.0 + 10.0 * math.sin(2 * math.Pi * i / period))

  test("series shorter than 32 bars → all outputs null (cycle.rs:16-17)") {
    val m = Cycle.mesa(sinusoid(31, 20))
    assert(m.forall(_.forall(_.isNaN)))
  }

  test("warmup boundary: first valid output at index 31") {
    val m = Cycle.mesa(sinusoid(40, 20))
    m.foreach { arr =>
      assert(arr.take(31).forall(_.isNaN))
      assert(arr.drop(31).forall(ok))
    }
  }

  test("trendline == 4-bar average of raw input") {
    val x = sinusoid(60, 17)
    val tl = Cycle.mesa(x)(Cycle.TRENDLINE)
    (31 until 60).foreach { i =>
      val exp = (x(i) + x(i - 1) + x(i - 2) + x(i - 3)) / 4.0
      assert(math.abs(tl(i) - exp) < 1e-9)
    }
  }

  test("output ranges: sine/leadsine in [-1,1], trendmode in {0,1}, dcperiod in (0,50]") {
    val m = Cycle.mesa(sinusoid(200, 25))
    (31 until 200).foreach { i =>
      assert(m(Cycle.SINE)(i) >= -1.0 && m(Cycle.SINE)(i) <= 1.0)
      assert(m(Cycle.LEADSINE)(i) >= -1.0 && m(Cycle.LEADSINE)(i) <= 1.0)
      assert(m(Cycle.TRENDMODE)(i) == 0.0 || m(Cycle.TRENDMODE)(i) == 1.0)
      assert(m(Cycle.DCPERIOD)(i) > 0.0 && m(Cycle.DCPERIOD)(i) <= 50.0)
    }
  }

  test("dcphase stays within the fixed-up range (-45, 315]") {
    val m = Cycle.mesa(sinusoid(200, 25))
    (31 until 200).foreach { i =>
      val p = m(Cycle.DCPHASE)(i)
      assert(p > -46.0 && p <= 316.0, s"phase $p at $i")
    }
  }

  test("dominant cycle converges near the true period on a pure sinusoid") {
    val m = Cycle.mesa(sinusoid(300, 20))
    val tail = (250 until 300).map(m(Cycle.DCPERIOD))
    val mean = tail.sum / tail.size
    assert(mean > 15 && mean < 25, s"detected period $mean, expected ≈20")
  }

  test("MAMA/FAMA track price scale and FAMA lags MAMA") {
    val x = sinusoid(300, 20)
    val m = Cycle.mesa(x, 0.5, 0.05)
    (100 until 300).foreach { i =>
      assert(m(Cycle.MAMA)(i) > 80 && m(Cycle.MAMA)(i) < 120)
      assert(m(Cycle.FAMA)(i) > 80 && m(Cycle.FAMA)(i) < 120)
    }
  }
}
