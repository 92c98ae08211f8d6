#!/usr/bin/env python3
"""Golden fixture for the 17 hardest candlestick recognizers: an
INDEPENDENT plain-Python transcription of reference pattern.rs (fresh
read of the Rust, no dependence on the Scala DSL or the DuckDB oracle
SQL — those two are correlated through the same authoring pass, this
file is the uncorrelated third opinion).

The bar series interleaves a deterministic LCG walk with HAND-CRAFTED
trigger blocks so every transcribed pattern fires at least once —
multi-candle conjunctions essentially never fire on a random walk, and
an all-zero golden column would pin nothing.

Transcribed (pattern.rs line refs):
  cdl3linestrike:114  cdlabandonedbaby:268  cdladvanceblock:309
  cdlbreakaway:373    cdlconcealbabyswall:442  cdleveningstar:703
  cdlhikkake:956      cdlhikkakemod:987     cdlladderbottom:1229
  cdlmathold:1376     cdlmorningstar:1454   cdlrisefall3methods:1581
  cdlstalledpattern:1766  cdltasukigap:1856  cdlunique3river:1964
  cdlupsidegap2crows:1997 cdlxsidegap3methods:2027
Helper predicates: pattern.rs:2066-2143.

Run: python3 scripts/gen_golden_patterns.py > src/test/resources/talib_golden_patterns.csv
(committed output; rerunning must be byte-identical)
"""

# --- helper predicates (pattern.rs:2066-2143) ---

def bull(o, c): return c > o
def bear(o, c): return c < o
def body_abs(o, c): return abs(o - c)
def oc_min(o, c): return min(o, c)
def oc_max(o, c): return max(o, c)
def upper_shadow(o, h, c): return h - oc_max(o, c)
def lower_shadow(o, l, c): return oc_min(o, c) - l
def long_body(o, c): return body_abs(o, c) > 0.05 * (o + c) * 0.5
def short_body(o, c): return body_abs(o, c) < 0.1 * (o + c) * 0.5
def doji(o, h, l, c): return body_abs(o, c) <= 0.005 * (o + c) * 0.5
def long_up_shadow(o, h, c): return upper_shadow(o, h, c) > 2.0 * body_abs(o, c)
def vshort_up_shadow(o, h, l, c): return upper_shadow(o, h, c) < 0.1 * body_abs(o, c)
def vshort_dn_shadow(o, h, l, c): return lower_shadow(o, l, c) < 0.1 * body_abs(o, c)


# --- recognizers: (O, H, L, C) arrays -> int column, 0 before lookback ---

def cdl3linestrike(O, H, L, C):
    out = [0] * len(O)
    for i in range(3, len(O)):
        o, c = O[i], C[i]
        o1, o2, o3 = O[i - 3], O[i - 2], O[i - 1]
        c1, c2, c3 = C[i - 3], C[i - 2], C[i - 1]
        bull_three = (bear(o1, c1) and bear(o2, c2) and bear(o3, c3)
                      and c2 < c1 and c3 < c2
                      and o2 > c1 and o2 < o1 and o3 > c2 and o3 < o2)
        bull_strike = bull(o, c) and o < c3 and c > o1
        bear_three = (bull(o1, c1) and bull(o2, c2) and bull(o3, c3)
                      and c2 > c1 and c3 > c2
                      and o2 < c1 and o2 > o1 and o3 < c2 and o3 > o2)
        bear_strike = bear(o, c) and o > c3 and c < o1
        if bull_three and bull_strike:
            out[i] = 100
        elif bear_three and bear_strike:
            out[i] = -100
    return out


def cdlabandonedbaby(O, H, L, C):
    out = [0] * len(O)
    for i in range(2, len(O)):
        o, h, l, c = O[i], H[i], L[i], C[i]
        o1, o2 = O[i - 2], O[i - 1]
        h1, h2 = H[i - 2], H[i - 1]
        l1, l2 = L[i - 2], L[i - 1]
        c1, c2 = C[i - 2], C[i - 1]
        doji2 = doji(o2, h2, l2, c2)
        if (bear(o1, c1) and long_body(o1, c1) and doji2 and h2 < l1
                and bull(o, c) and l > h2):
            out[i] = 100
        elif (bull(o1, c1) and long_body(o1, c1) and doji2 and l2 > h1
                and bear(o, c) and h < l2):
            out[i] = -100
    return out


def cdladvanceblock(O, H, L, C):
    out = [0] * len(O)
    for i in range(2, len(O)):
        o, c = O[i], C[i]
        o1, o2 = O[i - 2], O[i - 1]
        c1, c2 = C[i - 2], C[i - 1]
        if (bull(o1, c1) and long_body(o1, c1) and bull(o2, c2) and bull(o, c)
                and o2 > o1 and o2 <= c1 and o > o2 and o <= c2
                and c2 > c1 and c > c2
                and body_abs(o, c) < body_abs(o2, c2)):
            out[i] = -100
    return out


def cdlbreakaway(O, H, L, C):
    # NOTE faithful quirk: bar i-1 is entirely unconstrained (the loop
    # reads o1,o2,c1,c2,c3 only — pattern.rs:388-396).
    out = [0] * len(O)
    for i in range(4, len(O)):
        o, c = O[i], C[i]
        o1, o2 = O[i - 4], O[i - 3]
        c1, c2, c3 = C[i - 4], C[i - 3], C[i - 2]
        if (bear(o1, c1) and long_body(o1, c1) and bear(o2, c2) and o2 < c1
                and c3 < c2 and bull(o, c) and c > o2 and c < c1):
            out[i] = 100
        elif (bull(o1, c1) and long_body(o1, c1) and bull(o2, c2) and o2 > c1
                and c3 > c2 and bear(o, c) and c < o2 and c > c1):
            out[i] = -100
    return out


def cdlconcealbabyswall(O, H, L, C):
    out = [0] * len(O)
    for i in range(3, len(O)):
        o, c = O[i], C[i]
        o1, o2, o3 = O[i - 3], O[i - 2], O[i - 1]
        h1, h2, h3 = H[i - 3], H[i - 2], H[i - 1]
        l1, l2 = L[i - 3], L[i - 2]
        c1, c2, c3 = C[i - 3], C[i - 2], C[i - 1]
        bear1 = bear(o1, c1) and long_body(o1, c1)
        no_shadow1 = vshort_up_shadow(o1, h1, l1, c1) and vshort_dn_shadow(o1, h1, l1, c1)
        bear2 = bear(o2, c2) and long_body(o2, c2)
        no_shadow2 = vshort_up_shadow(o2, h2, l2, c2) and vshort_dn_shadow(o2, h2, l2, c2)
        if (bear1 and no_shadow1 and bear2 and no_shadow2 and c2 < c1
                and bear(o3, c3) and h3 > c2
                and bear(o, c) and long_body(o, c) and o > h3 and c < l2):
            out[i] = 100
    return out


def cdleveningstar(O, H, L, C, penetration=0.3):
    out = [0] * len(O)
    for i in range(2, len(O)):
        o, c = O[i], C[i]
        o1, o2 = O[i - 2], O[i - 1]
        c1, c2 = C[i - 2], C[i - 1]
        if (bull(o1, c1) and long_body(o1, c1) and short_body(o2, c2)
                and oc_min(o2, c2) > c1 and bear(o, c)
                and c < (c1 - body_abs(o1, c1) * penetration)):
            out[i] = -100
    return out


def cdlhikkake(O, H, L, C):
    out = [0] * len(O)
    for i in range(2, len(O)):
        o, c = O[i], C[i]
        h1, h2 = H[i - 2], H[i - 1]
        l1, l2 = L[i - 2], L[i - 1]
        inside = h2 < h1 and l2 > l1
        if inside and c > h1 and bull(o, c):
            out[i] = 100
        elif inside and c < l1 and bear(o, c):
            out[i] = -100
    return out


def cdlhikkakemod(O, H, L, C):
    out = [0] * len(O)
    for i in range(3, len(O)):
        o, c = O[i], C[i]
        h1, h2, h3 = H[i - 3], H[i - 2], H[i - 1]
        l1, l2, l3 = L[i - 3], L[i - 2], L[i - 1]
        inside = h2 < h1 and l2 > l1
        second_inside = h3 < h2 and l3 > l2
        if inside and second_inside and c > h1 and bull(o, c):
            out[i] = 100
        elif inside and second_inside and c < l1 and bear(o, c):
            out[i] = -100
    return out


def cdlladderbottom(O, H, L, C):
    out = [0] * len(O)
    for i in range(4, len(O)):
        o, c = O[i], C[i]
        o1, o2, o3, o4 = O[i - 4], O[i - 3], O[i - 2], O[i - 1]
        h4 = H[i - 1]
        c1, c2, c3, c4 = C[i - 4], C[i - 3], C[i - 2], C[i - 1]
        if (bear(o1, c1) and long_body(o1, c1)
                and bear(o2, c2) and c2 < c1
                and bear(o3, c3) and c3 < c2
                and bear(o4, c4) and long_up_shadow(o4, h4, c4)
                and bull(o, c) and o > o4):
            out[i] = 100
    return out


def cdlmathold(O, H, L, C):
    # NOTE: the wrapper's penetration arg is dead in the kernel
    # (pattern.rs:1376-1415 never reads it).
    out = [0] * len(O)
    for i in range(4, len(O)):
        o, c = O[i], C[i]
        o1, o2, o3, o4 = O[i - 4], O[i - 3], O[i - 2], O[i - 1]
        l2, l3, l4 = L[i - 3], L[i - 2], L[i - 1]
        c1, c2, c3, c4 = C[i - 4], C[i - 3], C[i - 2], C[i - 1]
        if (bull(o1, c1) and long_body(o1, c1)
                and short_body(o2, c2) and o2 > c1
                and short_body(o3, c3) and short_body(o4, c4)
                and l2 > o1 and l3 > o1 and l4 > o1
                and bull(o, c) and c > c1):
            out[i] = 100
    return out


def cdlmorningstar(O, H, L, C, penetration=0.3):
    out = [0] * len(O)
    for i in range(2, len(O)):
        o, c = O[i], C[i]
        o1, o2 = O[i - 2], O[i - 1]
        c1, c2 = C[i - 2], C[i - 1]
        if (bear(o1, c1) and long_body(o1, c1) and short_body(o2, c2)
                and oc_max(o2, c2) < c1 and bull(o, c)
                and c > (c1 + body_abs(o1, c1) * penetration)):
            out[i] = 100
    return out


def cdlrisefall3methods(O, H, L, C):
    out = [0] * len(O)
    for i in range(4, len(O)):
        o, c = O[i], C[i]
        o1, o2, o3, o4 = O[i - 4], O[i - 3], O[i - 2], O[i - 1]
        h1, h2, h3, h4 = H[i - 4], H[i - 3], H[i - 2], H[i - 1]
        l1, l2, l3, l4 = L[i - 4], L[i - 3], L[i - 2], L[i - 1]
        c1, c2, c3, c4 = C[i - 4], C[i - 3], C[i - 2], C[i - 1]
        smalls = short_body(o2, c2) and short_body(o3, c3) and short_body(o4, c4)
        inside_h = h2 < h1 and h3 < h1 and h4 < h1
        inside_l = l2 > l1 and l3 > l1 and l4 > l1
        if (bull(o1, c1) and long_body(o1, c1) and smalls
                and inside_h and inside_l
                and bull(o, c) and long_body(o, c) and c > c1):
            out[i] = 100
        elif (bear(o1, c1) and long_body(o1, c1) and smalls
                and inside_l and inside_h
                and bear(o, c) and long_body(o, c) and c < c1):
            out[i] = -100
    return out


def cdlstalledpattern(O, H, L, C):
    out = [0] * len(O)
    for i in range(2, len(O)):
        o, c = O[i], C[i]
        o1, o2 = O[i - 2], O[i - 1]
        c1, c2 = C[i - 2], C[i - 1]
        if (bull(o1, c1) and long_body(o1, c1)
                and bull(o2, c2) and long_body(o2, c2) and c2 > c1
                and bull(o, c) and short_body(o, c) and c > c2
                and o > o2 and o <= c2):
            out[i] = -100
    return out


def cdltasukigap(O, H, L, C):
    out = [0] * len(O)
    for i in range(2, len(O)):
        o, c = O[i], C[i]
        o1, o2 = O[i - 2], O[i - 1]
        c1, c2 = C[i - 2], C[i - 1]
        if (bull(o1, c1) and bull(o2, c2) and o2 > c1 and bear(o, c)
                and o > o2 and o < c2 and c > o1 and c < c1):
            out[i] = 100
        elif (bear(o1, c1) and bear(o2, c2) and o2 < c1 and bull(o, c)
                and o < o2 and o > c2 and c < o1 and c > c1):
            out[i] = -100
    return out


def cdlunique3river(O, H, L, C):
    out = [0] * len(O)
    for i in range(2, len(O)):
        o, c = O[i], C[i]
        o1, o2 = O[i - 2], O[i - 1]
        l1, l2 = L[i - 2], L[i - 1]
        c1, c2 = C[i - 2], C[i - 1]
        if (bear(o1, c1) and long_body(o1, c1)
                and bear(o2, c2) and l2 < l1 and c2 > l2
                and o2 < o1 and o2 > c1
                and bull(o, c) and short_body(o, c) and c < c2):
            out[i] = 100
    return out


def cdlupsidegap2crows(O, H, L, C):
    out = [0] * len(O)
    for i in range(2, len(O)):
        o, c = O[i], C[i]
        o1, o2 = O[i - 2], O[i - 1]
        c1, c2 = C[i - 2], C[i - 1]
        if (bull(o1, c1) and long_body(o1, c1)
                and bear(o2, c2) and o2 > c1 and c2 > c1
                and bear(o, c) and o > o2 and c > c1 and c < c2):
            out[i] = -100
    return out


def cdlxsidegap3methods(O, H, L, C):
    out = [0] * len(O)
    for i in range(2, len(O)):
        o, c = O[i], C[i]
        o1, o2 = O[i - 2], O[i - 1]
        c1, c2 = C[i - 2], C[i - 1]
        if (bull(o1, c1) and bull(o2, c2) and o2 > c1 and bear(o, c)
                and o < c2 and o > o2 and c > o1 and c < c1):
            out[i] = 100
        elif (bear(o1, c1) and bear(o2, c2) and o2 < c1 and bull(o, c)
                and o > c2 and o < o2 and c < o1 and c > c1):
            out[i] = -100
    return out


PATTERNS = [
    ('cdl3linestrike', cdl3linestrike),
    ('cdlabandonedbaby', cdlabandonedbaby),
    ('cdladvanceblock', cdladvanceblock),
    ('cdlbreakaway', cdlbreakaway),
    ('cdlconcealbabyswall', cdlconcealbabyswall),
    ('cdleveningstar', cdleveningstar),
    ('cdlhikkake', cdlhikkake),
    ('cdlhikkakemod', cdlhikkakemod),
    ('cdlladderbottom', cdlladderbottom),
    ('cdlmathold', cdlmathold),
    ('cdlmorningstar', cdlmorningstar),
    ('cdlrisefall3methods', cdlrisefall3methods),
    ('cdlstalledpattern', cdlstalledpattern),
    ('cdltasukigap', cdltasukigap),
    ('cdlunique3river', cdlunique3river),
    ('cdlupsidegap2crows', cdlupsidegap2crows),
    ('cdlxsidegap3methods', cdlxsidegap3methods),
]


# --- bar series: LCG walk + crafted trigger blocks ---

class Lcg:
    def __init__(self, seed):
        self.s = seed & 0xFFFFFFFFFFFFFFFF

    def next(self):
        self.s = (self.s * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        return (self.s >> 11) / float(1 << 53)


def b(o, c, h=None, l=None):
    """Bar with default ±0.5 shadows."""
    if h is None:
        h = max(o, c) + 0.5
    if l is None:
        l = min(o, c) - 0.5
    return (o, h, l, c)


# Each block is designed to satisfy one pattern's conjunction at its
# last bar (values chosen against the transcriptions above; the
# generator ASSERTS every pattern fires, so a craft error fails loudly).
BLOCKS = [
    # 3linestrike bull: three descending bears, bull engulfs all
    [b(110, 104), b(108, 102), b(106, 100), b(99, 111)],
    # abandonedbaby bull: long bear, gapped-down doji, gapped-up bull
    [b(110, 104), b(101.0, 101.2, 101.5, 100.5), b(102, 106, 106.5, 101.8)],
    # advanceblock: three rising bulls with shrinking bodies
    [b(100, 106), b(104, 108), b(106, 109)],
    # breakaway bull: long bear, gapped bear, lower close, (free bar), bull back into gap
    [b(110, 104), b(103, 101), b(101, 100), b(100, 100.5), b(100, 103.5)],
    # concealbabyswall: two bear marubozus, bear with high poking up, bear engulfing it
    [b(112, 106, 112.3, 105.6), b(105, 99, 105.4, 98.6), b(97, 96, 99.5, 95.5), b(106, 98)],
    # eveningstar: long bull, gapped-up star, bear closing into body
    [b(100, 106), b(107, 107.5), b(106, 103)],
    # hikkake bull: bar, inside bar, bull close above first high
    [b(101, 104, 105, 100), b(102, 103, 104, 101), b(103, 106, 106.5, 102.5)],
    # hikkakemod bull: two nested inside bars, bull close above first high
    [b(101, 105, 106, 100), b(102, 104, 105, 101), b(102.5, 103.5, 104, 102), b(103, 107)],
    # ladderbottom: three descending bears, bear with long upper shadow, bull opening above
    [b(110, 104), b(106, 103), b(104, 102), b(103, 102.5, 104.5, 102), b(103.5, 105)],
    # mathold: long bull, three small bars holding above its open, bull breakout
    [b(100, 106), b(107, 106.5, 107.3, 106.2), b(106.4, 106.2, 106.8, 106.0),
     b(106.3, 106.1, 106.7, 105.9), b(106.2, 108)],
    # morningstar: long bear, gapped-down star, bull penetrating the body
    [b(106, 100), b(99, 99.4), b(100, 103)],
    # risefall3methods rising: long bull, three small inside bars, long bull breakout
    [b(100, 106), b(105, 104.2, 105.5, 103.7), b(104.4, 103.8, 104.9, 103.3),
     b(104, 104.8, 105.3, 103.5), b(103, 109)],
    # stalledpattern: two long bulls, short bull opening near prior close
    [b(100, 106), b(105, 111), b(110, 111.5)],
    # tasukigap bull (also fires xsidegap3methods bull — same gap geometry)
    [b(100, 103), b(104, 107), b(106, 102)],
    # unique3river: long bear, harami bear with lower low, short bull below its close
    [b(110, 104), b(107, 105, 107.5, 103), b(103.8, 104.4)],
    # upsidegap2crows: long bull, gapped bear, bear closing inside the gap
    [b(100, 106), b(109, 107), b(110, 106.5)],
]


def make_bars():
    rng = Lcg(20260813)
    bars = []
    close = 100.0

    def walk(n):
        nonlocal close
        for _ in range(n):
            op = close
            close = max(1.0, close + (rng.next() - 0.5) * 4.0)
            hi = max(op, close) + rng.next() * 2.0
            lo = min(op, close) - rng.next() * 2.0
            bars.append((op, hi, lo, close))

    walk(8)
    for block in BLOCKS:
        bars.extend(block)
        close = block[-1][3]  # resume the walk from the block's close
        walk(5)
    return bars


def fmt(v):
    return repr(round(v, 10))


def main():
    bars = make_bars()
    O = [x[0] for x in bars]
    H = [x[1] for x in bars]
    L = [x[2] for x in bars]
    C = [x[3] for x in bars]
    cols = [(name, fn(O, H, L, C)) for name, fn in PATTERNS]
    for name, vals in cols:
        assert any(v != 0 for v in vals), f"{name} never fires — trigger block is wrong"
    header = ['ord', 'open', 'high', 'low', 'close'] + [n for n, _ in cols]
    print(','.join(header))
    for i in range(len(bars)):
        row = [str(i), fmt(O[i]), fmt(H[i]), fmt(L[i]), fmt(C[i])]
        row += [str(vals[i]) for _, vals in cols]
        print(','.join(row))


if __name__ == '__main__':
    main()
