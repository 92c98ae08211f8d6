package graft

import graft.bt.Vectorized
import graft.ta.Kernels
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/** Property-based coverage promised in SURVEY.md §5.2, over the pure
  * kernels (no Spark session — these run at scalacheck speed):
  * length/warmup structure, scale/shift invariance, window-extreme
  * bounds, and the backtester's no-leverage equity invariant.
  */
object KernelProps extends Properties("kernels") {

  private val price: Gen[Double] = Gen.choose(1.0, 500.0)
  private val series: Gen[Array[Double]] =
    Gen.choose(2, 80).flatMap(n => Gen.listOfN(n, price)).map(_.toArray)
  private val period: Gen[Int] = Gen.choose(2, 20)

  private def eqTol(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    (a.isNaN && b.isNaN) || math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  property("length preservation across the kernel family") =
    forAll(series, period) { (x, n) =>
      Seq[Array[Double]](
        Kernels.sma(x, n), Kernels.ema(x, n), Kernels.wma(x, n),
        Kernels.rma(x, n), Kernels.rsi(x, n), Kernels.kama(x, n),
        Kernels.trix(x, n), Kernels.rollMax(x, n)
      ).forall(_.length == x.length)
    }

  property("warmup: first n-1 outputs of SMA are NaN, the rest are finite") =
    forAll(series, period) { (x, n) =>
      val out = Kernels.sma(x, n)
      out.take(math.min(n - 1, x.length)).forall(_.isNaN) &&
        out.drop(n - 1).forall(v => !v.isNaN && !v.isInfinite)
    }

  property("RSI is scale-invariant: rsi(k·x) == rsi(x)") =
    forAll(series, period, Gen.choose(0.5, 50.0)) { (x, n, k) =>
      Kernels.rsi(x.map(_ * k), n).zip(Kernels.rsi(x, n)).forall { case (a, b) => eqTol(a, b, 1e-7) }
    }

  property("RSI output bounded in [0, 100]") =
    forAll(series, period) { (x, n) =>
      Kernels.rsi(x, n).forall(v => v.isNaN || (v >= 0.0 && v <= 100.0))
    }

  property("MOM is shift-invariant: mom(x + c) == mom(x)") =
    forAll(series, Gen.choose(1, 10), Gen.choose(-100.0, 100.0)) { (x, n, c) =>
      def mom(a: Array[Double]): Array[Double] =
        Array.tabulate(a.length)(i => if (i >= n) a(i) - a(i - n) else Double.NaN)
      mom(x.map(_ + c)).zip(mom(x)).forall { case (a, b) => eqTol(a, b, 1e-7) }
    }

  property("rollMax dominates every value in its window") =
    forAll(series, period) { (x, n) =>
      val out = Kernels.rollMax(x, n)
      x.indices.forall { i =>
        out(i).isNaN || (math.max(0, i - n + 1) to i).forall(j => out(i) >= x(j))
      }
    }

  property("TRIMA ≡ SMA∘SMA with the split periods") =
    forAll(series, Gen.choose(2, 12)) { (x, n) =>
      val viaDef = Kernels.sma(Kernels.sma(x, n - n / 2), n / 2 + 1)
      Kernels.trima(x, n).zip(viaDef).forall { case (a, b) => eqTol(a, b) }
    }

  property("interior NaN does not poison EMA (skip semantics)") =
    forAll(series, period) { (x, n) =>
      (x.length > n + 2) ==> Prop {
        val withNaN = x.clone(); withNaN(n + 1) = Double.NaN
        // outputs computed over the compacted valid values must equal the
        // kernel run on the pre-compacted series
        val compacted = Kernels.ema(x.patch(n + 1, Nil, 1), n)
        val skipped = Kernels.ema(withNaN, n)
        val fromSkipped = x.indices.filter(_ != n + 1).map(skipped(_))
        fromSkipped.zip(compacted.toSeq).forall { case (a, b) => eqTol(a, b) }
      }
    }

  private val signals: Gen[(Array[Double], Array[Boolean], Array[Boolean])] =
    for {
      n <- Gen.choose(1, 60)
      p <- Gen.listOfN(n, price)
      b <- Gen.listOfN(n, Gen.oneOf(true, false))
      s <- Gen.listOfN(n, Gen.oneOf(true, false))
    } yield (p.toArray, b.toArray, s.toArray)

  property("vectorized backtest: accounting identity and no-leverage equity ≥ 0") =
    forAll(signals) { case (p, b, s) =>
      val cfg = Vectorized.Config(initialCapital = 10000.0, minCommission = 0.0,
        buyCommissionRate = 0.0003, sellCommissionRate = 0.0003)
      val r = Vectorized.runSeries(p, b, s, cfg)
      p.indices.forall { i =>
        eqTol(r.equity(i), r.cash(i) + r.positions(i) * p(i)) && r.equity(i) >= 0.0
      }
    }

  property("sequential backtest: cash never negative, positions never short") =
    forAll(signals) { case (p, b, s) =>
      val r = graft.bt.Sequential.run(p.length, { (ctx, i) =>
        if (b(i)) ctx.buy("A", 10, p(i))
        if (s(i)) ctx.sell("A", 10, p(i))
      })
      r.portfolio.cash >= 0.0 && r.portfolio.positions.values.forall(_ >= 0.0)
    }

  private val ohlc: Gen[(Array[Double], Array[Double], Array[Double])] =
    Gen.choose(5, 60).flatMap { n =>
      Gen.listOfN(n, Gen.zip(price, Gen.choose(0.0, 5.0), Gen.choose(0.0, 5.0)))
        .map { rows =>
          val c = rows.map(_._1).toArray
          val h = rows.map(r => r._1 + r._2).toArray
          val l = rows.map(r => math.max(0.01, r._1 - r._3)).toArray
          (h, l, c)
        }
    }

  property("stochastic fast %K bounded in [0, 100]") =
    forAll(ohlc, Gen.choose(2, 10)) { case ((h, l, c), n) =>
      Kernels.stochFastK(h, l, c, n).forall(v => v.isNaN || (v >= 0.0 && v <= 100.0))
    }

  property("ATR is positively homogeneous: atr(k·bars) == k·atr(bars)") =
    forAll(ohlc, Gen.choose(2, 10), Gen.choose(0.5, 20.0)) { case ((h, l, c), n, k) =>
      val base = Kernels.atr(h, l, c, n)
      val scaled = Kernels.atr(h.map(_ * k), l.map(_ * k), c.map(_ * k), n)
      base.indices.forall(i => eqTol(scaled(i), base(i) * k))
    }

  property("MACD is homogeneous and its histogram is macd − signal") =
    forAll(series, Gen.choose(0.5, 10.0)) { (x, k) =>
      val (d, s, hst) = Kernels.macd(x, 3, 5, 2)
      val (dk, sk, _) = Kernels.macd(x.map(_ * k), 3, 5, 2)
      d.indices.forall { i =>
        eqTol(dk(i), d(i) * k) && eqTol(sk(i), s(i) * k) &&
          (hst(i).isNaN && (d(i).isNaN || s(i).isNaN) || eqTol(hst(i), d(i) - s(i)))
      }
    }

  property("ADX bounded in [0, 100] and ADXR is the two-point average") =
    forAll(ohlc, Gen.choose(2, 8)) { case ((h, l, c), n) =>
      val a = Kernels.adx(h, l, c, n)
      val ar = Kernels.adxr(h, l, c, n)
      // fp-tolerant upper bound: DX = 100·|p−m|/(p+m) can round one ulp
      // past 100 when one smoothed DM is ~1e-16 relative to the other
      // (measured 100.00000000000001 at n=2) — the reference formula has
      // the same overshoot and the gated oracles replay it bit-for-bit,
      // so the kernel must NOT clamp; the bound here is mathematical ±ulp
      a.forall(v => v.isNaN || (v >= 0.0 && v <= 100.0 * (1 + 1e-12))) &&
        ar.indices.forall(i => ar(i).isNaN ||
          eqTol(ar(i), (a(i) + a(i - n + 1)) / 2))
    }

  // arbitrary unicode tokens incl. supplementary-plane code points — the
  // fused expression's modular composition must equal hashing the literal
  // joined shingle string for ANY input, not just ASCII
  private val token: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.listOfN(4, Gen.oneOf('é', '中', 'ß', ' ', "😀".charAt(0), "😀".charAt(1))).map(_.mkString),
    Gen.const(""), Gen.const("😀🎉"))
  private val tokens: Gen[List[String]] = Gen.choose(0, 12).flatMap(Gen.listOfN(_, token))

  // --- chunked step kernels: the per-row reified forms must be BIT-
  // identical to the array scans on arbitrary series (incl. interior
  // NaNs), at any chunk cut — state carry is just the same fold split ---

  private val noisySeries: Gen[Array[Double]] =
    Gen.choose(2, 120).flatMap(n => Gen.listOfN(n,
      Gen.frequency(9 -> price, 1 -> Gen.const(Double.NaN)))).map(_.toArray)

  private def stepAll(k: graft.ta.Chunked.StepKernel, ins: Array[Array[Double]]): Array[Double] = {
    val st = k.init()
    val buf = new Array[Double](ins.length)
    Array.tabulate(ins(0).length) { i =>
      var j = 0
      while (j < ins.length) { buf(j) = ins(j)(i); j += 1 }
      k.step(st, buf)(0)
    }
  }
  private def bitEq(a: Array[Double], b: Array[Double]): Boolean =
    a.length == b.length && a.indices.forall(i =>
      java.lang.Double.doubleToLongBits(a(i)) == java.lang.Double.doubleToLongBits(b(i)))

  property("EmaStep replays Kernels.ema bit-for-bit (NaNs included)") =
    forAll(noisySeries, period) { (x, n) =>
      bitEq(stepAll(new graft.ta.Chunked.EmaStep(n), Array(x)), Kernels.ema(x, n))
    }

  property("RsiStep replays Kernels.rsi bit-for-bit (NaNs included)") =
    forAll(noisySeries, period) { (x, n) =>
      bitEq(stepAll(new graft.ta.Chunked.RsiStep(n), Array(x)), Kernels.rsi(x, n))
    }

  property("AtrStep replays Kernels.atr bit-for-bit (NaNs included)") =
    forAll(noisySeries, period) { (c, n) =>
      val h = c.map(v => v + 1.0); val l = c.map(v => v - 1.0)
      bitEq(stepAll(new graft.ta.Chunked.AtrStep(n), Array(h, l, c)), Kernels.atr(h, l, c, n))
    }

  property("KamaStep replays Kernels.kama bit-for-bit (ring state, NaNs included)") =
    forAll(noisySeries, period) { (x, n) =>
      bitEq(stepAll(new graft.ta.Chunked.KamaStep(n), Array(x)), Kernels.kama(x, n))
    }

  property("MacdStep replays Kernels.macd bit-for-bit (NaNs included)") =
    forAll(noisySeries, Gen.choose(2, 8), Gen.choose(9, 20), Gen.choose(2, 6)) { (x, f, s, g) =>
      val (d, sg, h) = Kernels.macd(x, f, s, g)
      val st = new graft.ta.Chunked.MacdStep(f, s, g)
      val state = st.init()
      val got = x.map(v => st.step(state, Array(v)))
      bitEq(got.map(_(0)), d) && bitEq(got.map(_(1)), sg) && bitEq(got.map(_(2)), h)
    }

  property("fused shingle minhash == minhash of joined shingle strings (unicode-safe)") =
    forAll(tokens, Gen.choose(1, 4)) { (toks, k) =>
      import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
      import org.apache.spark.unsafe.types.UTF8String
      import graft.functions.TextHashes
      val numPerms = 8
      val dummy = org.apache.spark.sql.catalyst.expressions.Literal(null,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))
      def arr(xs: Seq[String]): ArrayData =
        new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])
      val fused = TextHashes.MinhashShinglePoly(dummy, k, numPerms)
        .nullSafeEval(arr(toks)).asInstanceOf[ArrayData].toLongArray
      val shingleStrs =
        if (toks.length < k) Seq(toks.mkString(" "))
        else toks.sliding(k).map(_.mkString(" ")).toSeq
      val unfused = TextHashes.MinhashSigPoly(dummy, numPerms)
        .nullSafeEval(arr(shingleStrs)).asInstanceOf[ArrayData].toLongArray
      fused.sameElements(unfused)
    }
}
