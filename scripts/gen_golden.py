#!/usr/bin/env python3
"""Golden-fixture generator: a 256-bar deterministic random walk plus
expected SMA/EMA/RSI/ATR/ADX values computed from the STANDARD TA-Lib
formulas, implemented here from scratch (plain loops, no numpy, no
dependence on the Scala kernels under test). The committed CSV is the
contract; `GoldenSpec` compares the engine against it.

This substitutes for the reference's own intended test strategy
(reference tests/__init__.py:1-5 pins `ta-lib>=0.6.8` as the oracle): no
TA-Lib wheel exists in this container, so the formulas below transcribe
the canonical published definitions --
  SMA(n):  mean of the trailing n values, first output at index n-1
  EMA(n):  alpha=2/(n+1), seeded with the SMA of the first n values
  RSI(n):  Wilder averages of up/down moves, SMA-seeded, first output
           at index n; avg-loss 0 => 100
  ATR(n):  Wilder RMA (alpha=1/n, SMA-seeded) of the true range, where
           TR[0] is undefined (no previous close) so first output lands
           at index n
  ADX(n):  +-DM and TR Wilder-SUM smoothed (seed = sum of first n, then
           s - s/n + v), DI = 100*sDM/sTR, DX = 100*|+DI - -DI|/(+DI + -DI),
           ADX = Wilder average of DX seeded with the SMA of the first n
           DX values (first output at index 2n-1)

Run: python3 scripts/gen_golden.py > src/test/resources/talib_golden.csv
(committed output; rerunning must be byte-identical)
"""
import math

N_BARS = 256
NAN = float('nan')


# --- deterministic PRNG: 64-bit LCG (MMIX constants), uniform in [0,1) ---
class Lcg:
    def __init__(self, seed):
        self.s = seed & 0xFFFFFFFFFFFFFFFF

    def next(self):
        self.s = (self.s * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        return (self.s >> 11) / float(1 << 53)


def make_bars():
    rng = Lcg(20260812)
    bars = []
    close = 100.0
    for i in range(N_BARS):
        op = close
        close = max(1.0, close + (rng.next() - 0.5) * 4.0)
        hi = max(op, close) + rng.next() * 2.0
        lo = min(op, close) - rng.next() * 2.0
        vol = 1000.0 + rng.next() * 9000.0
        bars.append((op, hi, lo, close, vol))
    return bars


def sma(x, n):
    out = [NAN] * len(x)
    for i in range(n - 1, len(x)):
        out[i] = sum(x[i - n + 1:i + 1]) / n
    return out


def ema(x, n, alpha=None):
    a = alpha if alpha is not None else 2.0 / (n + 1)
    out = [NAN] * len(x)
    e = sum(x[:n]) / n
    out[n - 1] = e
    for i in range(n, len(x)):
        e = a * x[i] + (1 - a) * e
        out[i] = e
    return out


def rsi(x, n):
    out = [NAN] * len(x)
    gains = [max(x[i] - x[i - 1], 0.0) for i in range(1, len(x))]
    losses = [max(x[i - 1] - x[i], 0.0) for i in range(1, len(x))]
    ag = sum(gains[:n]) / n
    al = sum(losses[:n]) / n
    out[n] = 100.0 if al == 0 else 100.0 - 100.0 / (1.0 + ag / al)
    for i in range(n + 1, len(x)):
        ag = (ag * (n - 1) + gains[i - 1]) / n
        al = (al * (n - 1) + losses[i - 1]) / n
        out[i] = 100.0 if al == 0 else 100.0 - 100.0 / (1.0 + ag / al)
    return out


def true_range(h, l, c):
    tr = [NAN] * len(h)
    for i in range(1, len(h)):
        tr[i] = max(h[i] - l[i], abs(h[i] - c[i - 1]), abs(l[i] - c[i - 1]))
    return tr


def atr(h, l, c, n):
    tr = true_range(h, l, c)
    out = [NAN] * len(h)
    a = sum(tr[1:n + 1]) / n  # SMA seed over the first n defined TRs
    out[n] = a
    for i in range(n + 1, len(h)):
        a = (a * (n - 1) + tr[i]) / n
        out[i] = a
    return out


def adx(h, l, c, n):
    ln = len(h)
    dx = [NAN] * ln
    s_tr = s_pdm = s_mdm = 0.0
    for i in range(1, ln):
        up = h[i] - h[i - 1]
        dn = l[i - 1] - l[i]
        pdm = up if (up > dn and up > 0) else 0.0
        mdm = dn if (dn > up and dn > 0) else 0.0
        tr = max(h[i] - l[i], abs(h[i] - c[i - 1]), abs(l[i] - c[i - 1]))
        if i <= n:
            s_tr += tr; s_pdm += pdm; s_mdm += mdm
        else:
            s_tr = s_tr - s_tr / n + tr
            s_pdm = s_pdm - s_pdm / n + pdm
            s_mdm = s_mdm - s_mdm / n + mdm
        if i >= n:
            pdi = 0.0 if s_tr == 0 else 100.0 * s_pdm / s_tr
            mdi = 0.0 if s_tr == 0 else 100.0 * s_mdm / s_tr
            dx[i] = 0.0 if pdi + mdi == 0 else 100.0 * abs(pdi - mdi) / (pdi + mdi)
    out = [NAN] * ln
    defined = [v for v in dx if not math.isnan(v)]
    a = sum(defined[:n]) / n
    out[2 * n - 1] = a
    for i in range(2 * n, ln):
        a = (a * (n - 1) + dx[i]) / n
        out[i] = a
    return out


def fmt(v):
    return '' if (isinstance(v, float) and math.isnan(v)) else repr(v)


def main():
    bars = make_bars()
    o = [b[0] for b in bars]; h = [b[1] for b in bars]
    l = [b[2] for b in bars]; c = [b[3] for b in bars]
    v = [b[4] for b in bars]
    cols = {
        'sma_20': sma(c, 20), 'ema_20': ema(c, 20), 'rsi_14': rsi(c, 14),
        'atr_14': atr(h, l, c, 14), 'adx_14': adx(h, l, c, 14),
    }
    print('ord,open,high,low,close,volume,' + ','.join(cols))
    for i in range(N_BARS):
        row = [str(i), fmt(o[i]), fmt(h[i]), fmt(l[i]), fmt(c[i]), fmt(v[i])]
        row += [fmt(cols[k][i]) for k in cols]
        print(','.join(row))


if __name__ == '__main__':
    main()
