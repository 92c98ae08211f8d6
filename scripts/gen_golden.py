#!/usr/bin/env python3
"""Golden-fixture generator: a 256-bar deterministic random walk plus
expected values for SMA/EMA/RSI/ATR/ADX/WMA/BBANDS/MACD/STOCH/CCI/
WILLR/MOM computed from the STANDARD TA-Lib formulas, implemented here
from scratch (plain loops, no numpy, no dependence on the Scala kernels
under test). The committed CSV is the contract; `GoldenSpec` compares
the engine against it.

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


def wma(x, n):
    # linear weights 1..n, newest heaviest
    out = [NAN] * len(x)
    denom = n * (n + 1) / 2.0
    for i in range(n - 1, len(x)):
        out[i] = sum(x[i - n + 1 + k] * (k + 1) for k in range(n)) / denom
    return out


def bbands(x, n, k):
    # middle = SMA, upper/lower = middle +- k * POPULATION stddev
    up, mid, lo = [NAN] * len(x), [NAN] * len(x), [NAN] * len(x)
    for i in range(n - 1, len(x)):
        win = x[i - n + 1:i + 1]
        m = sum(win) / n
        sd = math.sqrt(sum((v - m) ** 2 for v in win) / n)
        mid[i] = m
        up[i] = m + k * sd
        lo[i] = m - k * sd
    return up, mid, lo


def _ema_tail(x, start, n):
    """EMA over x[start:], SMA-seeded, NaN before start+n-1."""
    out = [NAN] * len(x)
    a = 2.0 / (n + 1)
    e = sum(x[start:start + n]) / n
    out[start + n - 1] = e
    for i in range(start + n, len(x)):
        e = a * x[i] + (1 - a) * e
        out[i] = e
    return out


def macd(x, fast, slow, sig):
    ef = ema(x, fast)
    es = ema(x, slow)
    dif = [ef[i] - es[i] if not (math.isnan(ef[i]) or math.isnan(es[i])) else NAN
           for i in range(len(x))]
    sg = _ema_tail(dif, slow - 1, sig)
    hist = [dif[i] - sg[i] if not (math.isnan(dif[i]) or math.isnan(sg[i])) else NAN
            for i in range(len(x))]
    return dif, sg, hist


def _sma_tail(x, start, n):
    out = [NAN] * len(x)
    for i in range(start + n - 1, len(x)):
        out[i] = sum(x[i - n + 1:i + 1]) / n
    return out


def stoch(h, l, c, fastk_n, slowk_n, slowd_n):
    # fastK = 100*(c-LL)/(HH-LL), flat window -> 0; slowK/slowD = SMA legs
    fastk = [NAN] * len(c)
    for i in range(fastk_n - 1, len(c)):
        hh = max(h[i - fastk_n + 1:i + 1])
        ll = min(l[i - fastk_n + 1:i + 1])
        fastk[i] = 0.0 if hh == ll else 100.0 * (c[i] - ll) / (hh - ll)
    slowk = _sma_tail(fastk, fastk_n - 1, slowk_n)
    slowd = _sma_tail(slowk, fastk_n + slowk_n - 2, slowd_n)
    return slowk, slowd


def cci(h, l, c, n):
    # (tp - SMA(tp)) / (0.015 * mean |tp - SMA(tp)| over the same window)
    tp = [(h[i] + l[i] + c[i]) / 3 for i in range(len(c))]
    out = [NAN] * len(c)
    for i in range(n - 1, len(c)):
        win = tp[i - n + 1:i + 1]
        m = sum(win) / n
        mad = sum(abs(v - m) for v in win) / n
        out[i] = 0.0 if mad == 0 else (tp[i] - m) / (0.015 * mad)
    return out


def willr(h, l, c, n):
    out = [NAN] * len(c)
    for i in range(n - 1, len(c)):
        hh = max(h[i - n + 1:i + 1])
        ll = min(l[i - n + 1:i + 1])
        out[i] = 0.0 if hh == ll else -100.0 * (hh - c[i]) / (hh - ll)
    return out


def mom(x, n):
    return [NAN] * n + [x[i] - x[i - n] for i in range(n, len(x))]


def aroon(h, l, n):
    # window of n+1 bars; "since" = bars since the MOST RECENT extreme
    up, dn = [NAN] * len(h), [NAN] * len(h)
    for i in range(n, len(h)):
        wh = h[i - n:i + 1]
        wl = l[i - n:i + 1]
        mh, ml = max(wh), min(wl)
        since_h = next(j for j in range(n + 1) if wh[n - j] == mh)
        since_l = next(j for j in range(n + 1) if wl[n - j] == ml)
        up[i] = 100.0 * (n - since_h) / n
        dn[i] = 100.0 * (n - since_l) / n
    return up, dn


def ultosc(h, l, c, n1, n2, n3):
    # buying pressure / true range ratio-of-sums at 3 horizons, 4/2/1
    bp = [NAN] + [c[i] - min(l[i], c[i - 1]) for i in range(1, len(c))]
    tr = [NAN] + [max(h[i], c[i - 1]) - min(l[i], c[i - 1]) for i in range(1, len(c))]
    out = [NAN] * len(c)
    for i in range(n3, len(c)):
        def ratio(n):
            return sum(bp[i - n + 1:i + 1]) / sum(tr[i - n + 1:i + 1])
        out[i] = 100.0 / 7.0 * (4 * ratio(n1) + 2 * ratio(n2) + ratio(n3))
    return out


def mfi(h, l, c, v, n):
    # signed typical-price*volume money flows over n; negative flow 0 -> 100
    tp = [(h[i] + l[i] + c[i]) / 3 for i in range(len(c))]
    pos = [NAN] + [tp[i] * v[i] if tp[i] > tp[i - 1] else 0.0 for i in range(1, len(c))]
    neg = [NAN] + [tp[i] * v[i] if tp[i] < tp[i - 1] else 0.0 for i in range(1, len(c))]
    out = [NAN] * len(c)
    for i in range(n, len(c)):
        sp = sum(pos[i - n + 1:i + 1])
        sn = sum(neg[i - n + 1:i + 1])
        out[i] = 100.0 if sn == 0 else 100.0 - 100.0 / (1.0 + sp / sn)
    return out


def cmo(x, n):
    up = [NAN] + [max(x[i] - x[i - 1], 0.0) for i in range(1, len(x))]
    dn = [NAN] + [max(x[i - 1] - x[i], 0.0) for i in range(1, len(x))]
    out = [NAN] * len(x)
    for i in range(n, len(x)):
        su = sum(up[i - n + 1:i + 1])
        sd = sum(dn[i - n + 1:i + 1])
        out[i] = 0.0 if su + sd == 0 else 100.0 * (su - sd) / (su + sd)
    return out


def dema_tema_trix(x, n):
    # chained SMA-seeded EMAs: e2/e3 run over the previous level's defined
    # tail, so levels start at n-1, 2n-2, 3n-3
    e1 = ema(x, n)
    e2 = _ema_tail(e1, n - 1, n)
    e3 = _ema_tail(e2, 2 * n - 2, n)
    dema = [2 * e1[i] - e2[i] if not math.isnan(e2[i]) else NAN for i in range(len(x))]
    tema = [3 * e1[i] - 3 * e2[i] + e3[i] if not math.isnan(e3[i]) else NAN
            for i in range(len(x))]
    trix = [NAN] * len(x)
    for i in range(3 * n - 2, len(x)):
        trix[i] = 100.0 * (e3[i] - e3[i - 1]) / e3[i - 1]
    return dema, tema, trix


def apo(x, fast, slow):
    # SMA legs (TA-Lib matype 0 default)
    f = sma(x, fast)
    s = sma(x, slow)
    return [f[i] - s[i] if not (math.isnan(f[i]) or math.isnan(s[i])) else NAN
            for i in range(len(x))]


def trange(h, l, c):
    return [NAN] + [max(h[i] - l[i], abs(h[i] - c[i - 1]), abs(l[i] - c[i - 1]))
                    for i in range(1, len(c))]


def ad_line(h, l, c, v):
    out, s = [], 0.0
    for i in range(len(c)):
        if h[i] != l[i]:
            s += ((c[i] - l[i]) - (h[i] - c[i])) / (h[i] - l[i]) * v[i]
        out.append(s)
    return out


def obv(c, v):
    # standard sign convention, seeded +v[0] (the reference inverts the
    # sign - recorded bug; the engine implements the standard)
    out, s = [], 0.0
    for i in range(len(c)):
        if i == 0 or c[i] > c[i - 1]:
            s += v[i]
        elif c[i] < c[i - 1]:
            s -= v[i]
        out.append(s)
    return out


def sar(h, l, accel=0.02, max_a=0.2):
    """Wilder's Parabolic SAR (TA-Lib semantics): initial trend from the
    first pair's +DM vs -DM; each bar emits the CURRENT sar, then advances
    it by af*(EP - sar) for tomorrow, never into the last two bars' range;
    penetration flips the position with sar = EP and AF reset."""
    n = len(h)
    out = [NAN] * n
    long = (h[1] - h[0]) >= (l[0] - l[1])
    af = accel
    s = l[0] if long else h[0]
    ep = h[1] if long else l[1]
    for i in range(1, n):
        ph, pl = h[i - 1], l[i - 1]
        if long:
            if l[i] < s:                      # penetrated: flip short
                long = False
                s = ep
                ep = l[i]
                af = accel
                out[i] = s
                s = s + af * (ep - s)
                if s < h[i]: s = h[i]
                if s < ph: s = ph
            else:
                out[i] = s
                if h[i] > ep:
                    ep = h[i]
                    af = min(af + accel, max_a)
                s = s + af * (ep - s)
                if s > l[i]: s = l[i]
                if s > pl: s = pl
        else:
            if h[i] > s:                      # penetrated: flip long
                long = True
                s = ep
                ep = h[i]
                af = accel
                out[i] = s
                s = s + af * (ep - s)
                if s > l[i]: s = l[i]
                if s > pl: s = pl
            else:
                out[i] = s
                if l[i] < ep:
                    ep = l[i]
                    af = min(af + accel, max_a)
                s = s + af * (ep - s)
                if s < h[i]: s = h[i]
                if s < ph: s = ph
    return out


def sarext(h, l, start_value=0.0, offset_on_reverse=0.0,
           ai_l=0.02, a_l=0.02, am_l=0.2, ai_s=0.02, a_s=0.02, am_s=0.2):
    """SAR with start value / offset-on-reverse and per-side acceleration;
    short-side SAR is emitted NEGATIVE (TA-Lib sign convention)."""
    n = len(h)
    out = [NAN] * n
    if start_value > 0:
        long = True
    elif start_value < 0:
        long = False
    else:
        long = (h[1] - h[0]) >= (l[0] - l[1])
    af = ai_l if long else ai_s
    if start_value != 0.0:
        s = abs(start_value)
    else:
        s = l[0] if long else h[0]
    ep = h[1] if long else l[1]
    for i in range(1, n):
        ph, pl = h[i - 1], l[i - 1]
        if long:
            if l[i] < s:
                long = False
                s = ep * (1 + offset_on_reverse)
                ep = l[i]
                af = ai_s
                out[i] = -s
                s = s + af * (ep - s)
                if s < h[i]: s = h[i]
                if s < ph: s = ph
            else:
                out[i] = s
                if h[i] > ep:
                    ep = h[i]
                    af = min(af + a_l, am_l)
                s = s + af * (ep - s)
                if s > l[i]: s = l[i]
                if s > pl: s = pl
        else:
            if h[i] > s:
                long = True
                s = ep * (1 - offset_on_reverse)
                ep = h[i]
                af = ai_l
                out[i] = s
                s = s + af * (ep - s)
                if s > l[i]: s = l[i]
                if s > pl: s = pl
            else:
                out[i] = -s
                if l[i] < ep:
                    ep = l[i]
                    af = min(af + a_s, am_s)
                s = s + af * (ep - s)
                if s < h[i]: s = h[i]
                if s < ph: s = ph
    return out


def mesa(x, fast_limit=0.5, slow_limit=0.05):
    """The MESA / Hilbert-transform state machine (Ehlers; TA-Lib HT_*
    family semantics as the reference implements them, cycle.rs:9-448):
    4-3-2-1 WMA smoother, 7-tap one-sided Hilbert FIR with +-0.0962 /
    +-0.5769 and adj = 0.075*period + 0.54, quadrature demodulation with
    0.2/0.8 smoothing, period clamped to [0.67, 1.5]x previous then
    [6, 50]. Outputs begin at index 31. MAMA/FAMA share the phase
    machinery (standard Ehlers adaptive alpha = fast/deltaPhase clamped
    to [slow, fast]). Kept as plain python-list shift registers -- an
    implementation independent of the Scala ring-buffer port."""
    n = len(x)
    keys = ('ht_dcperiod', 'ht_dcphase', 'ht_inphase', 'ht_quadrature',
            'ht_sine', 'ht_leadsine', 'ht_trendline', 'ht_trendmode',
            'mama', 'fama')
    res = {k: [NAN] * n for k in keys}
    if n < 32:
        return res

    smooth = [0.0] * n
    for k in range(3, n):
        smooth[k] = (4.0 * x[k] + 3.0 * x[k - 1] + 2.0 * x[k - 2] + x[k - 3]) * 0.1

    def fir7(dq, adj):
        return (0.0962 * dq[0] + 0.5769 * dq[2] - 0.5769 * dq[4] - 0.0962 * dq[6]) * adj

    detrend = [0.0] * 7
    q1 = [0.0] * 7
    i1 = [0.0] * 7
    i2 = q2 = re = im = period = 0.0
    smooth_period = 0.0
    phase = mama_v = fama_v = 0.0

    for i in range(6, n):
        prev_period = period if i > 6 else 6.0
        adj = 0.075 * prev_period + 0.54

        dt = (0.0962 * smooth[i] + 0.5769 * smooth[i - 2]
              - 0.5769 * smooth[i - 4] - 0.0962 * smooth[i - 6]) * adj
        detrend = [dt] + detrend[:6]
        q1 = [fir7(detrend, adj)] + q1[:6]
        i1 = [detrend[3]] + i1[:6]

        ji = fir7(i1, adj)
        jq = fir7(q1, adj)

        i2c = 0.2 * (i1[0] - jq) + 0.8 * i2
        q2c = 0.2 * (q1[0] + ji) + 0.8 * q2
        rec = 0.2 * (i2c * i2 + q2c * q2) + 0.8 * re
        imc = 0.2 * (i2c * q2 - q2c * i2) + 0.8 * im
        i2, q2, re, im = i2c, q2c, rec, imc

        if im != 0.0 and re != 0.0:
            period = (2.0 * math.pi) / math.atan(im / re)
        period = min(max(period, 0.67 * prev_period), 1.5 * prev_period)
        period = min(max(period, 6.0), 50.0)
        period = 0.2 * period + 0.8 * prev_period
        smooth_period = 0.33 * period + 0.67 * smooth_period

        prev_phase = phase
        phase = math.atan(q1[0] / i1[0]) * 180.0 / math.pi if i1[0] != 0.0 else 0.0
        delta_phase = prev_phase - phase
        if delta_phase < 1.0:
            delta_phase = 1.0
        alpha = fast_limit / delta_phase
        if alpha < slow_limit:
            alpha = slow_limit
        if alpha > fast_limit:
            alpha = fast_limit
        mama_v = alpha * x[i] + (1.0 - alpha) * mama_v
        fama_v = 0.5 * alpha * mama_v + (1.0 - 0.5 * alpha) * fama_v

        if i >= 31:
            res['ht_dcperiod'][i] = smooth_period
            dc_phase = phase + 90.0
            if i1[0] < 0.0:
                dc_phase += 180.0
            if dc_phase > 315.0:
                dc_phase -= 360.0
            res['ht_dcphase'][i] = dc_phase
            res['ht_inphase'][i] = i1[0]
            res['ht_quadrature'][i] = q1[0]
            res['ht_sine'][i] = math.sin(phase * math.pi / 180.0)
            res['ht_leadsine'][i] = math.sin((phase + 45.0) * math.pi / 180.0)
            tl = (((x[i] + x[i - 1]) + x[i - 2]) + x[i - 3]) * 0.25
            res['ht_trendline'][i] = tl
            res['ht_trendmode'][i] = 1.0 if abs(x[i] - tl) > 0.01 * tl else 0.0
            res['mama'][i] = mama_v
            res['fama'][i] = fama_v
    return res


def fmt(v):
    return '' if (isinstance(v, float) and math.isnan(v)) else repr(v)


def main():
    bars = make_bars()
    o = [b[0] for b in bars]; h = [b[1] for b in bars]
    l = [b[2] for b in bars]; c = [b[3] for b in bars]
    v = [b[4] for b in bars]
    bb_up, bb_mid, bb_lo = bbands(c, 20, 2.0)
    m_line, m_sig, m_hist = macd(c, 12, 26, 9)
    slowk, slowd = stoch(h, l, c, 5, 3, 3)
    ar_up, ar_dn = aroon(h, l, 14)
    dm, tm, tx = dema_tema_trix(c, 10)
    cols = {
        'sma_20': sma(c, 20), 'ema_20': ema(c, 20), 'rsi_14': rsi(c, 14),
        'atr_14': atr(h, l, c, 14), 'adx_14': adx(h, l, c, 14),
        'wma_10': wma(c, 10),
        'bb_up_20_2': bb_up, 'bb_mid_20': bb_mid, 'bb_low_20_2': bb_lo,
        'macd': m_line, 'macd_signal': m_sig, 'macd_hist': m_hist,
        'slowk_5_3_3': slowk, 'slowd_5_3_3': slowd,
        'cci_14': cci(h, l, c, 14), 'willr_14': willr(h, l, c, 14),
        'mom_10': mom(c, 10),
        'aroon_up_14': ar_up, 'aroon_down_14': ar_dn,
        'ultosc_7_14_28': ultosc(h, l, c, 7, 14, 28),
        'mfi_14': mfi(h, l, c, v, 14), 'cmo_14': cmo(c, 14),
        'dema_10': dm, 'tema_10': tm, 'trix_10': tx,
        'apo_12_26': apo(c, 12, 26), 'trange': trange(h, l, c),
        'ad': ad_line(h, l, c, v), 'obv': obv(c, v),
    }
    ms = mesa(c)
    cols.update({
        'sar_002_02': sar(h, l, 0.02, 0.2),
        'sarext_def': sarext(h, l),
        'ht_dcperiod': ms['ht_dcperiod'], 'ht_dcphase': ms['ht_dcphase'],
        'ht_inphase': ms['ht_inphase'], 'ht_quadrature': ms['ht_quadrature'],
        'ht_sine': ms['ht_sine'], 'ht_leadsine': ms['ht_leadsine'],
        'ht_trendline': ms['ht_trendline'], 'ht_trendmode': ms['ht_trendmode'],
        'mama_05_005': ms['mama'], 'fama_05_005': ms['fama'],
    })
    print('ord,open,high,low,close,volume,' + ','.join(cols))
    for i in range(N_BARS):
        row = [str(i), fmt(o[i]), fmt(h[i]), fmt(l[i]), fmt(c[i]), fmt(v[i])]
        row += [fmt(cols[k][i]) for k in cols]
        print(','.join(row))


if __name__ == '__main__':
    main()
