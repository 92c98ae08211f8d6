package graft.ta

import PatternDsl._

/** The 61 candlestick pattern recognizers (SURVEY.md §2.5), transcribed
  * 1:1 from reference `src/talib/pattern.rs` (line refs per pattern).
  * Suffix convention matches the reference loops: for lookback k, bar 1 is
  * the oldest (lag k), bar k is lag 1, `cur` is the current row.
  *
  * Note: the reference wrappers accept a `penetration` argument that the
  * kernels ignore except where hard-coded 0.3 (dark cloud, evening/morning
  * star family, piercing — pattern.rs:529-532). The default instances keep
  * that 0.3, and the `*P` builders additionally honor the argument.
  */
object Patterns {
  private val cur = Bar(0)

  private def p(name: String, k: Int, bullE: BE, bearE: BE): Pattern =
    Pattern(name, k, Some(bullE), Some(bearE))
  private def pBull(name: String, k: Int, e: BE): Pattern = Pattern(name, k, Some(e), None)
  private def pBear(name: String, k: Int, e: BE): Pattern = Pattern(name, k, None, Some(e))

  // pattern.rs:10-40 — NOTE faithful quirk: `open_in2` demands
  // o > o2 && o < c2 on a bear bar 2 (o2 > c2), which is unsatisfiable,
  // so the reference's cdl2crows never fires (classic TA-Lib wants
  // o < o2 && o > c2). Kept as written; pinned by a test.
  val cdl2crows: Pattern = { val b1 = Bar(2); val b2 = Bar(1)
    pBear("cdl2crows", 2,
      bull(b1) && longBody(b1) && bear(b2) && (b2.o > b1.c) && bear(cur) &&
        (cur.o > b2.o) && (cur.o < b2.c) && (cur.c > b1.o) && (cur.c < b1.c)) }

  // pattern.rs:43-73
  val cdl3blackcrows: Pattern = { val b1 = Bar(2); val b2 = Bar(1)
    pBear("cdl3blackcrows", 2,
      bear(b1) && longBody(b1) && bear(b2) && longBody(b2) && bear(cur) && longBody(cur) &&
        (b2.o < b1.o) && (b2.o > b1.c) && (cur.o < b2.o) && (cur.o > b2.c) &&
        (b2.c < b1.c) && (cur.c < b2.c)) }

  // pattern.rs:76-111
  val cdl3inside: Pattern = { val b1 = Bar(2); val b2 = Bar(1)
    p("cdl3inside", 2,
      bear(b1) && longBody(b1) && bull(b2) && (b2.c < b1.o) && (b2.o > b1.c) &&
        bull(cur) && (cur.c > b1.o),
      bull(b1) && longBody(b1) && bear(b2) && (b2.o < b1.c) && (b2.c > b1.o) &&
        bear(cur) && (cur.c < b1.o)) }

  // pattern.rs:114-158
  val cdl3linestrike: Pattern = { val b1 = Bar(3); val b2 = Bar(2); val b3 = Bar(1)
    p("cdl3linestrike", 3,
      bear(b1) && bear(b2) && bear(b3) && (b2.c < b1.c) && (b3.c < b2.c) &&
        (b2.o > b1.c) && (b2.o < b1.o) && (b3.o > b2.c) && (b3.o < b2.o) &&
        bull(cur) && (cur.o < b3.c) && (cur.c > b1.o),
      bull(b1) && bull(b2) && bull(b3) && (b2.c > b1.c) && (b3.c > b2.c) &&
        (b2.o < b1.c) && (b2.o > b1.o) && (b3.o < b2.c) && (b3.o > b2.o) &&
        bear(cur) && (cur.o > b3.c) && (cur.c < b1.o)) }

  // pattern.rs:160-192
  val cdl3outside: Pattern = { val b1 = Bar(2); val b2 = Bar(1)
    p("cdl3outside", 2,
      bear(b1) && bull(b2) && (b2.o <= b1.c) && (b2.c >= b1.o) && bull(cur) && (cur.c > b2.c),
      bull(b1) && bear(b2) && (b2.o >= b1.c) && (b2.c <= b1.o) && bear(cur) && (cur.c < b2.c)) }

  // pattern.rs:194-231 (emits +100; "lowerlow2" is l2 > l1 in the reference)
  val cdl3starsinsouth: Pattern = { val b1 = Bar(2); val b2 = Bar(1)
    pBull("cdl3starsinsouth", 2,
      bear(b1) && longBody(b1) && longDnShadow(b1) && bear(b2) &&
        (b2.l > b1.l) && (b2.c > b1.c) && bear(cur) && shortBody(cur) &&
        (cur.h < b2.h) && (cur.l > b2.l)) }

  // pattern.rs:234-265
  val cdl3whitesoldiers: Pattern = { val b1 = Bar(2); val b2 = Bar(1)
    pBull("cdl3whitesoldiers", 2,
      bull(b1) && longBody(b1) && bull(b2) && longBody(b2) && bull(cur) && longBody(cur) &&
        (b2.o > b1.o) && (b2.o <= b1.c) && (cur.o > b2.o) && (cur.o <= b2.c) &&
        (b2.c > b1.c) && (cur.c > b2.c)) }

  // pattern.rs:268-306
  val cdlabandonedbaby: Pattern = { val b1 = Bar(2); val b2 = Bar(1)
    p("cdlabandonedbaby", 2,
      bear(b1) && longBody(b1) && doji(b2) && (b2.h < b1.l) && bull(cur) && (cur.l > b2.h),
      bull(b1) && longBody(b1) && doji(b2) && (b2.l > b1.h) && bear(cur) && (cur.h < b2.l)) }

  /** Parameterized abandoned baby — the reference wrapper (pattern.py:60)
    * takes `penetration` (default 0.3) but its kernel ignores it
    * (pattern.rs:268-306). We pin the standard TA-Lib semantics
    * (ta_CDLABANDONEDBABY.c): on top of the default instance's strict
    * high/low gaps, the third bar must close more than pen·body1 beyond
    * the first bar's close. */
  def cdlabandonedbabyP(pen: Double = 0.3, name: String = "cdlabandonedbaby_p"): Pattern = {
    val b1 = Bar(2); val b2 = Bar(1)
    p(name, 2,
      bear(b1) && longBody(b1) && doji(b2) && (b2.h < b1.l) && bull(cur) && (cur.l > b2.h) &&
        (cur.c > (b1.c + (bodyAbs(b1) * num(pen)))),
      bull(b1) && longBody(b1) && doji(b2) && (b2.l > b1.h) && bear(cur) && (cur.h < b2.l) &&
        (cur.c < (b1.c - (bodyAbs(b1) * num(pen))))) }

  // pattern.rs:309-342 (advance block is a bearish warning: −100)
  val cdladvanceblock: Pattern = { val b1 = Bar(2); val b2 = Bar(1)
    pBear("cdladvanceblock", 2,
      bull(b1) && longBody(b1) && bull(b2) && bull(cur) &&
        (b2.o > b1.o) && (b2.o <= b1.c) && (cur.o > b2.o) && (cur.o <= b2.c) &&
        (b2.c > b1.c) && (cur.c > b2.c) && (bodyAbs(cur) < bodyAbs(b2))) }

  // pattern.rs:345-370
  val cdlbelthold: Pattern =
    p("cdlbelthold", 0,
      bull(cur) && longBody(cur) && vshortDnShadow(cur),
      bear(cur) && longBody(cur) && vshortUpShadow(cur))

  // pattern.rs:373-412 (only o1/o2/c1/c2/c3 participate)
  val cdlbreakaway: Pattern = { val b1 = Bar(4); val b2 = Bar(3); val b3 = Bar(2)
    p("cdlbreakaway", 4,
      bear(b1) && longBody(b1) && bear(b2) && (b2.o < b1.c) && (b3.c < b2.c) &&
        bull(cur) && (cur.c > b2.o) && (cur.c < b1.c),
      bull(b1) && longBody(b1) && bull(b2) && (b2.o > b1.c) && (b3.c > b2.c) &&
        bear(cur) && (cur.c < b2.o) && (cur.c > b1.c)) }

  // pattern.rs:413-439
  val cdlclosingmarubozu: Pattern =
    p("cdlclosingmarubozu", 0,
      bull(cur) && longBody(cur) && vshortUpShadow(cur),
      bear(cur) && longBody(cur) && vshortDnShadow(cur))

  // pattern.rs:442-484 (emits +100)
  val cdlconcealbabyswall: Pattern = { val b1 = Bar(3); val b2 = Bar(2); val b3 = Bar(1)
    pBull("cdlconcealbabyswall", 3,
      bear(b1) && longBody(b1) && vshortUpShadow(b1) && vshortDnShadow(b1) &&
        bear(b2) && longBody(b2) && vshortUpShadow(b2) && vshortDnShadow(b2) &&
        (b2.c < b1.c) && bear(b3) && (b3.h > b2.c) &&
        bear(cur) && longBody(cur) && (cur.o > b3.h) && (cur.c < b2.l)) }

  // pattern.rs:487-516
  val cdlcounterattack: Pattern = { val b1 = Bar(1)
    p("cdlcounterattack", 1,
      bear(b1) && longBody(b1) && bull(cur) && longBody(cur) && near(cur.c, b1.c, cur),
      bull(b1) && longBody(b1) && bear(cur) && longBody(cur) && near(cur.c, b1.c, cur)) }

  // pattern.rs:519-550. The reference wrapper takes `penetration` but the
  // kernel hard-codes 0.3; the parameterized builders below honor the
  // argument (exceeding the reference at zero risk — the default instance
  // is byte-identical to the hard-coded behavior).
  def cdldarkcloudcoverP(pen: Double = 0.3, name: String = "cdldarkcloudcover"): Pattern = {
    val b1 = Bar(1)
    pBear(name, 1,
      bull(b1) && longBody(b1) && bear(cur) && (cur.o > b1.c) &&
        (cur.c < (b1.c - (bodyAbs(b1) * num(pen)))) && (cur.c > b1.o)) }
  val cdldarkcloudcover: Pattern = cdldarkcloudcoverP()

  // pattern.rs:553-575
  val cdldoji: Pattern = pBull("cdldoji", 0, doji(cur))

  // pattern.rs:578-607
  val cdldojistar: Pattern = { val b1 = Bar(1); val mid = (cur.o + cur.c) * num(0.5)
    p("cdldojistar", 1,
      bear(b1) && longBody(b1) && doji(cur) && (mid < b1.c),
      bull(b1) && longBody(b1) && doji(cur) && (mid > b1.c)) }

  // pattern.rs:610-632
  val cdldragonflydoji: Pattern =
    pBull("cdldragonflydoji", 0, doji(cur) && longDnShadow(cur) && vshortUpShadow(cur))

  // pattern.rs:635-662
  val cdlengulfing: Pattern = { val b1 = Bar(1)
    p("cdlengulfing", 1,
      bear(b1) && bull(cur) && (cur.o <= b1.c) && (cur.c >= b1.o) &&
        ((cur.o < b1.c) || (cur.c > b1.o)),
      bull(b1) && bear(cur) && (cur.o >= b1.c) && (cur.c <= b1.o) &&
        ((cur.o > b1.c) || (cur.c < b1.o))) }

  // pattern.rs:665-700
  def cdleveningdojistarP(pen: Double = 0.3, name: String = "cdleveningdojistar"): Pattern = {
    val b1 = Bar(2); val b2 = Bar(1)
    pBear(name, 2,
      bull(b1) && longBody(b1) && doji(b2) && (ocMin(b2) > b1.c) && bear(cur) &&
        (cur.c < (b1.c - (bodyAbs(b1) * num(pen))))) }
  val cdleveningdojistar: Pattern = cdleveningdojistarP()

  // pattern.rs:703-736
  def cdleveningstarP(pen: Double = 0.3, name: String = "cdleveningstar"): Pattern = {
    val b1 = Bar(2); val b2 = Bar(1)
    pBear(name, 2,
      bull(b1) && longBody(b1) && shortBody(b2) && (ocMin(b2) > b1.c) && bear(cur) &&
        (cur.c < (b1.c - (bodyAbs(b1) * num(pen))))) }
  val cdleveningstar: Pattern = cdleveningstarP()

  // pattern.rs:739-774
  val cdlgapsidesidewhite: Pattern = { val b1 = Bar(2); val b2 = Bar(1)
    val common = bull(b2) && bull(cur) &&
      near(bodyAbs(cur), bodyAbs(b2), cur) && near(cur.o, b2.o, cur)
    p("cdlgapsidesidewhite", 2,
      bull(b1) && (b2.o > b1.c) && common,
      bear(b1) && (b2.c < b1.c) && common) }

  // pattern.rs:777-799
  val cdlgravestonedoji: Pattern =
    pBear("cdlgravestonedoji", 0, doji(cur) && longUpShadow(cur) && vshortDnShadow(cur))

  // pattern.rs:801-829
  val cdlhammer: Pattern = { val b1 = Bar(1)
    pBull("cdlhammer", 1,
      shortBody(cur) && (lowerShadow(cur) > (num(2.0) * bodyAbs(cur))) &&
        vshortUpShadow(cur) && bear(b1)) }

  // pattern.rs:831-858
  val cdlhangingman: Pattern = { val b1 = Bar(1)
    pBear("cdlhangingman", 1,
      shortBody(cur) && (lowerShadow(cur) > (num(2.0) * bodyAbs(cur))) &&
        vshortUpShadow(cur) && bull(b1)) }

  // pattern.rs:861-892
  val cdlharami: Pattern = { val b1 = Bar(1)
    p("cdlharami", 1,
      bear(b1) && longBody(b1) && bull(cur) && shortBody(cur) &&
        (cur.o > b1.c) && (cur.c < b1.o),
      bull(b1) && longBody(b1) && bear(cur) && shortBody(cur) &&
        (cur.o < b1.c) && (cur.c > b1.o)) }

  // pattern.rs:895-925
  val cdlharamicross: Pattern = { val b1 = Bar(1)
    p("cdlharamicross", 1,
      bear(b1) && longBody(b1) && doji(cur) && (ocMax(cur) < b1.o) && (ocMin(cur) > b1.c),
      bull(b1) && longBody(b1) && doji(cur) && (ocMax(cur) < b1.c) && (ocMin(cur) > b1.o)) }

  // pattern.rs:928-952
  val cdlhighwave: Pattern = {
    val mask = shortBody(cur) && longUpShadow(cur) && longDnShadow(cur)
    p("cdlhighwave", 0, mask && bull(cur), mask && bear(cur)) }

  // pattern.rs:955-983
  val cdlhikkake: Pattern = { val b1 = Bar(2); val b2 = Bar(1)
    val inside = (b2.h < b1.h) && (b2.l > b1.l)
    p("cdlhikkake", 2,
      inside && (cur.c > b1.h) && bull(cur),
      inside && (cur.c < b1.l) && bear(cur)) }

  // pattern.rs:986-1017
  val cdlhikkakemod: Pattern = { val b1 = Bar(3); val b2 = Bar(2); val b3 = Bar(1)
    val inside  = (b2.h < b1.h) && (b2.l > b1.l)
    val inside2 = (b3.h < b2.h) && (b3.l > b2.l)
    p("cdlhikkakemod", 3,
      inside && inside2 && (cur.c > b1.h) && bull(cur),
      inside && inside2 && (cur.c < b1.l) && bear(cur)) }

  // pattern.rs:1020-1044
  val cdlhomingpigeon: Pattern = { val b1 = Bar(1)
    pBull("cdlhomingpigeon", 1,
      bear(b1) && longBody(b1) && bear(cur) && shortBody(cur) &&
        (cur.o < b1.o) && (cur.c > b1.c)) }

  // pattern.rs:1047-1079
  val cdlidentical3crows: Pattern = { val b1 = Bar(2); val b2 = Bar(1)
    pBear("cdlidentical3crows", 2,
      bear(b1) && longBody(b1) && bear(b2) && longBody(b2) && bear(cur) && longBody(cur) &&
        equalPx(b2.o, b1.c, cur) && equalPx(cur.o, b2.c, cur) &&
        (b2.c < b1.c) && (cur.c < b2.c)) }

  // pattern.rs:1082-1107
  val cdlinneck: Pattern = { val b1 = Bar(1)
    pBear("cdlinneck", 1,
      bear(b1) && longBody(b1) && bull(cur) && (cur.o < b1.c) && near(cur.c, b1.c, cur)) }

  // pattern.rs:1110-1137
  val cdlinvertedhammer: Pattern = { val b1 = Bar(1)
    pBull("cdlinvertedhammer", 1,
      shortBody(cur) && (upperShadow(cur) > (num(2.0) * bodyAbs(cur))) &&
        vshortDnShadow(cur) && bear(b1)) }

  // pattern.rs:1140-1179
  val cdlkicking: Pattern = { val b1 = Bar(1)
    p("cdlkicking", 1,
      marubozuBear(b1) && marubozuBull(cur) && (cur.o > b1.o),
      marubozuBull(b1) && marubozuBear(cur) && (cur.o < b1.o)) }

  // pattern.rs:1182-1225 — the by-length refinement reduces to the plain
  // kick (bull_kick ⟹ fire regardless of body comparison); kept as written.
  val cdlkickingbylength: Pattern = { val b1 = Bar(1)
    p("cdlkickingbylength", 1,
      marubozuBear(b1) && marubozuBull(cur) && (cur.o > b1.o),
      marubozuBull(b1) && marubozuBear(cur) && (cur.o < b1.o)) }

  // pattern.rs:1228-1263
  val cdlladderbottom: Pattern = { val b1 = Bar(4); val b2 = Bar(3); val b3 = Bar(2); val b4 = Bar(1)
    pBull("cdlladderbottom", 4,
      bear(b1) && longBody(b1) && bear(b2) && (b2.c < b1.c) && bear(b3) && (b3.c < b2.c) &&
        bear(b4) && longUpShadow(b4) && bull(cur) && (cur.o > b4.o)) }

  // pattern.rs:1266-1288
  val cdllongleggeddoji: Pattern =
    pBull("cdllongleggeddoji", 0, doji(cur) && longUpShadow(cur) && longDnShadow(cur))

  // pattern.rs:1291-1317
  val cdllongline: Pattern = {
    val mask = longBody(cur) && shortUpShadow(cur) && shortDnShadow(cur)
    p("cdllongline", 0, mask && bull(cur), mask && bear(cur)) }

  // pattern.rs:1320-1345
  val cdlmarubozu: Pattern = {
    val mask = longBody(cur) && vshortUpShadow(cur) && vshortDnShadow(cur)
    p("cdlmarubozu", 0, mask && bull(cur), mask && bear(cur)) }

  // pattern.rs:1348-1372
  val cdlmatchinglow: Pattern = { val b1 = Bar(1)
    pBull("cdlmatchinglow", 1,
      bear(b1) && longBody(b1) && bear(cur) && equalPx(cur.c, b1.c, cur)) }

  // pattern.rs:1375-1412
  val cdlmathold: Pattern = { val b1 = Bar(4); val b2 = Bar(3); val b3 = Bar(2); val b4 = Bar(1)
    pBull("cdlmathold", 4,
      bull(b1) && longBody(b1) && shortBody(b2) && (b2.o > b1.c) &&
        shortBody(b3) && shortBody(b4) &&
        (b2.l > b1.o) && (b3.l > b1.o) && (b4.l > b1.o) &&
        bull(cur) && (cur.c > b1.c)) }

  /** Parameterized mat hold — the reference wrapper (pattern.py:298) takes
    * `penetration` (default 0.5) but its kernel ignores it
    * (pattern.rs:1375-1412). We pin the standard TA-Lib hold level
    * (ta_CDLMATHOLD.c): the three small bars' lows must stay above
    * close1 − pen·body1. The default instance's fixed predicate (lows
    * above open1) is the pen→1 limit of this. */
  def cdlmatholdP(pen: Double = 0.5, name: String = "cdlmathold_p"): Pattern = {
    val b1 = Bar(4); val b2 = Bar(3); val b3 = Bar(2); val b4 = Bar(1)
    val hold = b1.c - (bodyAbs(b1) * num(pen))
    pBull(name, 4,
      bull(b1) && longBody(b1) && shortBody(b2) && (b2.o > b1.c) &&
        shortBody(b3) && shortBody(b4) &&
        (b2.l > hold) && (b3.l > hold) && (b4.l > hold) &&
        bull(cur) && (cur.c > b1.c)) }

  // pattern.rs:1415-1450
  def cdlmorningdojistarP(pen: Double = 0.3, name: String = "cdlmorningdojistar"): Pattern = {
    val b1 = Bar(2); val b2 = Bar(1)
    pBull(name, 2,
      bear(b1) && longBody(b1) && doji(b2) && (ocMax(b2) < b1.c) && bull(cur) &&
        (cur.c > (b1.c + (bodyAbs(b1) * num(pen))))) }
  val cdlmorningdojistar: Pattern = cdlmorningdojistarP()

  // pattern.rs:1453-1486
  def cdlmorningstarP(pen: Double = 0.3, name: String = "cdlmorningstar"): Pattern = {
    val b1 = Bar(2); val b2 = Bar(1)
    pBull(name, 2,
      bear(b1) && longBody(b1) && shortBody(b2) && (ocMax(b2) < b1.c) && bull(cur) &&
        (cur.c > (b1.c + (bodyAbs(b1) * num(pen))))) }
  val cdlmorningstar: Pattern = cdlmorningstarP()

  // pattern.rs:1489-1515
  val cdlonneck: Pattern = { val b1 = Bar(1)
    pBear("cdlonneck", 1,
      bear(b1) && longBody(b1) && bull(cur) && (cur.o < b1.c) && near(cur.c, b1.l, cur)) }

  // pattern.rs:1518-1549
  def cdlpiercingP(pen: Double = 0.3, name: String = "cdlpiercing"): Pattern = {
    val b1 = Bar(1)
    pBull(name, 1,
      bear(b1) && longBody(b1) && bull(cur) && (cur.o < b1.c) &&
        (cur.c > (b1.c + (bodyAbs(b1) * num(pen)))) && (cur.c < b1.o)) }
  val cdlpiercing: Pattern = cdlpiercingP()

  // pattern.rs:1552-1577
  val cdlrickshawman: Pattern =
    pBull("cdlrickshawman", 0,
      doji(cur) && longUpShadow(cur) && longDnShadow(cur) &&
        near(upperShadow(cur), lowerShadow(cur), cur))

  // pattern.rs:1580-1643
  val cdlrisefall3methods: Pattern = { val b1 = Bar(4); val b2 = Bar(3); val b3 = Bar(2); val b4 = Bar(1)
    p("cdlrisefall3methods", 4,
      bull(b1) && longBody(b1) && shortBody(b2) && shortBody(b3) && shortBody(b4) &&
        (b2.h < b1.h) && (b3.h < b1.h) && (b4.h < b1.h) &&
        (b2.l > b1.l) && (b3.l > b1.l) && (b4.l > b1.l) &&
        bull(cur) && longBody(cur) && (cur.c > b1.c),
      bear(b1) && longBody(b1) && shortBody(b2) && shortBody(b3) && shortBody(b4) &&
        (b2.l > b1.l) && (b3.l > b1.l) && (b4.l > b1.l) &&
        (b2.h < b1.h) && (b3.h < b1.h) && (b4.h < b1.h) &&
        bear(cur) && longBody(cur) && (cur.c < b1.c)) }

  // pattern.rs:1646-1675
  val cdlseparatinglines: Pattern = { val b1 = Bar(1)
    p("cdlseparatinglines", 1,
      bear(b1) && longBody(b1) && bull(cur) && longBody(cur) && equalPx(cur.o, b1.o, cur),
      bull(b1) && longBody(b1) && bear(cur) && longBody(cur) && equalPx(cur.o, b1.o, cur)) }

  // pattern.rs:1678-1705
  val cdlshootingstar: Pattern = { val b1 = Bar(1)
    pBear("cdlshootingstar", 1,
      shortBody(cur) && (upperShadow(cur) > (num(2.0) * bodyAbs(cur))) &&
        vshortDnShadow(cur) && bull(b1)) }

  // pattern.rs:1708-1734
  val cdlshortline: Pattern = {
    val mask = shortBody(cur) && shortUpShadow(cur) && shortDnShadow(cur)
    p("cdlshortline", 0, mask && bull(cur), mask && bear(cur)) }

  // pattern.rs:1737-1762
  val cdlspinningtop: Pattern = {
    val mask = shortBody(cur) && (upperShadow(cur) > bodyAbs(cur)) &&
      (lowerShadow(cur) > bodyAbs(cur))
    p("cdlspinningtop", 0, mask && bull(cur), mask && bear(cur)) }

  // pattern.rs:1765-1793
  val cdlstalledpattern: Pattern = { val b1 = Bar(2); val b2 = Bar(1)
    pBear("cdlstalledpattern", 2,
      bull(b1) && longBody(b1) && bull(b2) && longBody(b2) && (b2.c > b1.c) &&
        bull(cur) && shortBody(cur) && (cur.c > b2.c) &&
        (cur.o > b2.o) && (cur.o <= b2.c)) }

  // pattern.rs:1796-1827
  val cdlsticksandwich: Pattern = { val b1 = Bar(2); val b2 = Bar(1)
    pBull("cdlsticksandwich", 2,
      bear(b1) && longBody(b1) && bull(b2) && longBody(b2) && (b2.o > b1.c) &&
        bear(cur) && longBody(cur) && equalPx(cur.c, b1.c, cur)) }

  // pattern.rs:1830-1852
  val cdltakuri: Pattern =
    pBull("cdltakuri", 0, doji(cur) && vlongDnShadow(cur) && vshortUpShadow(cur))

  // pattern.rs:1855-1890
  val cdltasukigap: Pattern = { val b1 = Bar(2); val b2 = Bar(1)
    p("cdltasukigap", 2,
      bull(b1) && bull(b2) && (b2.o > b1.c) && bear(cur) &&
        (cur.o > b2.o) && (cur.o < b2.c) && (cur.c > b1.o) && (cur.c < b1.c),
      bear(b1) && bear(b2) && (b2.o < b1.c) && bull(cur) &&
        (cur.o < b2.o) && (cur.o > b2.c) && (cur.c < b1.o) && (cur.c > b1.c)) }

  // pattern.rs:1893-1918
  val cdlthrusting: Pattern = { val b1 = Bar(1)
    pBear("cdlthrusting", 1,
      bear(b1) && longBody(b1) && bull(cur) && (cur.o < b1.c) && (cur.c > b1.c) &&
        (cur.c < (b1.c + (bodyAbs(b1) * num(0.5))))) }

  // pattern.rs:1921-1960
  val cdltristar: Pattern = { val b1 = Bar(2); val b2 = Bar(1)
    val mid1 = (b1.o + b1.c) * num(0.5)
    val mid2 = (b2.o + b2.c) * num(0.5)
    val mid3 = (cur.o + cur.c) * num(0.5)
    p("cdltristar", 2,
      doji(b1) && doji(b2) && doji(cur) && (mid2 < mid1) && (mid3 > mid2),
      doji(b1) && doji(b2) && doji(cur) && (mid2 > mid1) && (mid3 < mid2)) }

  // pattern.rs:1963-1993
  val cdlunique3river: Pattern = { val b1 = Bar(2); val b2 = Bar(1)
    pBull("cdlunique3river", 2,
      bear(b1) && longBody(b1) && bear(b2) && (b2.l < b1.l) && (b2.c > b2.l) &&
        (b2.o < b1.o) && (b2.o > b1.c) && bull(cur) && shortBody(cur) && (cur.c < b2.c)) }

  // pattern.rs:1996-2023
  val cdlupsidegap2crows: Pattern = { val b1 = Bar(2); val b2 = Bar(1)
    pBear("cdlupsidegap2crows", 2,
      bull(b1) && longBody(b1) && bear(b2) && (b2.o > b1.c) && (b2.c > b1.c) &&
        bear(cur) && (cur.o > b2.o) && (cur.c > b1.c) && (cur.c < b2.c)) }

  // pattern.rs:2026-2061
  val cdlxsidegap3methods: Pattern = { val b1 = Bar(2); val b2 = Bar(1)
    p("cdlxsidegap3methods", 2,
      bull(b1) && bull(b2) && (b2.o > b1.c) && bear(cur) &&
        (cur.o < b2.c) && (cur.o > b2.o) && (cur.c > b1.o) && (cur.c < b1.c),
      bear(b1) && bear(b2) && (b2.o < b1.c) && bull(cur) &&
        (cur.o > b2.c) && (cur.o < b2.o) && (cur.c < b1.o) && (cur.c > b1.c)) }

  // The reference's doji-star mid uses (o+c)/2.0; we emit *0.5 on both
  // engines so the structure stays identical (x/2.0 ≡ x*0.5 exactly in IEEE
  // since 0.5 and 2.0 are powers of two — no rounding difference).

  val all: Seq[Pattern] = Seq(
    cdl2crows, cdl3blackcrows, cdl3inside, cdl3linestrike, cdl3outside,
    cdl3starsinsouth, cdl3whitesoldiers, cdlabandonedbaby, cdladvanceblock,
    cdlbelthold, cdlbreakaway, cdlclosingmarubozu, cdlconcealbabyswall,
    cdlcounterattack, cdldarkcloudcover, cdldoji, cdldojistar,
    cdldragonflydoji, cdlengulfing, cdleveningdojistar, cdleveningstar,
    cdlgapsidesidewhite, cdlgravestonedoji, cdlhammer, cdlhangingman,
    cdlharami, cdlharamicross, cdlhighwave, cdlhikkake, cdlhikkakemod,
    cdlhomingpigeon, cdlidentical3crows, cdlinneck, cdlinvertedhammer,
    cdlkicking, cdlkickingbylength, cdlladderbottom, cdllongleggeddoji,
    cdllongline, cdlmarubozu, cdlmatchinglow, cdlmathold,
    cdlmorningdojistar, cdlmorningstar, cdlonneck, cdlpiercing,
    cdlrickshawman, cdlrisefall3methods, cdlseparatinglines,
    cdlshootingstar, cdlshortline, cdlspinningtop, cdlstalledpattern,
    cdlsticksandwich, cdltakuri, cdltasukigap, cdlthrusting, cdltristar,
    cdlunique3river, cdlupsidegap2crows, cdlxsidegap3methods
  )
  require(all.size == 61, s"expected 61 patterns, got ${all.size}")
}
