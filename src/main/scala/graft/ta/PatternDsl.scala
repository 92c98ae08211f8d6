package graft.ta

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

/** Tiny dual-interpreted expression algebra for candlestick patterns.
  *
  * Every CDL* op in the reference is a stateless function of the current bar
  * and up to 4 lagged bars (reference `src/talib/pattern.rs`, predicate
  * helpers at :2067-2143). Defining each pattern once over this AST yields
  * BOTH the Spark `Column` (lag/when over a per-series window) and the
  * DuckDB oracle SQL from the same source, so the two can never drift.
  *
  * Both interpreters emit the same IEEE-double expression structure
  * (left-associated, identical literals), so comparisons evaluate
  * bit-identically on both engines — patterns compare raw doubles, no
  * rounding is involved.
  */
object PatternDsl {

  // ---- numeric expressions ----
  sealed trait NE {
    def +(b: NE): NE = Bin("+", this, b)
    def -(b: NE): NE = Bin("-", this, b)
    def *(b: NE): NE = Bin("*", this, b)
    def >(b: NE): BE = Cmp(">", this, b)
    def <(b: NE): BE = Cmp("<", this, b)
    def >=(b: NE): BE = Cmp(">=", this, b)
    def <=(b: NE): BE = Cmp("<=", this, b)
  }
  final case class Src(name: String, k: Int) extends NE
  final case class Num(v: Double) extends NE
  final case class Bin(op: String, a: NE, b: NE) extends NE
  final case class Abs(a: NE) extends NE
  final case class Min2(a: NE, b: NE) extends NE
  final case class Max2(a: NE, b: NE) extends NE

  // ---- boolean expressions ----
  sealed trait BE {
    def &&(b: BE): BE = Logic("AND", this, b)
    def ||(b: BE): BE = Logic("OR", this, b)
  }
  final case class Cmp(op: String, a: NE, b: NE) extends BE
  final case class Logic(op: String, a: BE, b: BE) extends BE

  /** Bar at lag k (k=0 ⇒ current row). */
  final case class Bar(k: Int) {
    def o: NE = Src("open", k);  def h: NE = Src("high", k)
    def l: NE = Src("low", k);   def c: NE = Src("close", k)
  }
  def num(v: Double): NE = Num(v)

  // ---- predicate helpers, 1:1 with pattern.rs:2067-2143 ----
  def bull(b: Bar): BE = b.c > b.o                                   // :2068
  def bear(b: Bar): BE = b.c < b.o                                   // :2072
  def bodyAbs(b: Bar): NE = Abs(b.o - b.c)                           // :2077
  def ocMin(b: Bar): NE = Min2(b.o, b.c)                             // :2081
  def ocMax(b: Bar): NE = Max2(b.o, b.c)                             // :2085
  def upperShadow(b: Bar): NE = b.h - ocMax(b)                       // :2089
  def lowerShadow(b: Bar): NE = ocMin(b) - b.l                       // :2093
  def longBody(b: Bar): BE = bodyAbs(b) > num(0.05) * (b.o + b.c) * num(0.5)   // :2097
  def shortBody(b: Bar): BE = bodyAbs(b) < num(0.1) * (b.o + b.c) * num(0.5)   // :2101
  def doji(b: Bar): BE = bodyAbs(b) <= num(0.005) * (b.o + b.c) * num(0.5)     // :2105
  def longUpShadow(b: Bar): BE = upperShadow(b) > num(2.0) * bodyAbs(b)        // :2109
  def longDnShadow(b: Bar): BE = lowerShadow(b) > num(2.0) * bodyAbs(b)        // :2113
  def shortUpShadow(b: Bar): BE = upperShadow(b) < num(0.5) * bodyAbs(b)       // :2117
  def shortDnShadow(b: Bar): BE = lowerShadow(b) < num(0.5) * bodyAbs(b)       // :2121
  def vshortUpShadow(b: Bar): BE = upperShadow(b) < num(0.1) * bodyAbs(b)      // :2125
  def vshortDnShadow(b: Bar): BE = lowerShadow(b) < num(0.1) * bodyAbs(b)      // :2129
  def vlongDnShadow(b: Bar): BE = lowerShadow(b) > num(3.0) * bodyAbs(b)       // :2133
  /** |v1−v2| < 1% of the reference bar's (h+l)/2 — :2137. */
  def near(v1: NE, v2: NE, ref: Bar): BE = Abs(v1 - v2) < num(0.01) * (ref.h + ref.l) * num(0.5)
  /** |v1−v2| < 0.1% — :2141. */
  def equalPx(v1: NE, v2: NE, ref: Bar): BE = Abs(v1 - v2) < num(0.001) * (ref.h + ref.l) * num(0.5)
  /** Marubozu body: long body with both shadows very short (pattern.rs:1161-1170). */
  def marubozuBull(b: Bar): BE = bull(b) && longBody(b) && vshortUpShadow(b) && vshortDnShadow(b)
  def marubozuBear(b: Bar): BE = bear(b) && longBody(b) && vshortUpShadow(b) && vshortDnShadow(b)

  // ---- Spark Column interpreter ----
  def toColumn(e: NE)(implicit w: WindowSpec): Column = e match {
    case Src(name, 0) => col(name)
    case Src(name, k) => lag(col(name), k).over(w)
    case Num(v)       => lit(v)
    case Bin("+", a, b) => toColumn(a) + toColumn(b)
    case Bin("-", a, b) => toColumn(a) - toColumn(b)
    case Bin("*", a, b) => toColumn(a) * toColumn(b)
    case Bin(op, _, _)  => throw new IllegalArgumentException(op)
    case Abs(a)       => abs(toColumn(a))
    case Min2(a, b)   => least(toColumn(a), toColumn(b))
    case Max2(a, b)   => greatest(toColumn(a), toColumn(b))
  }
  def toColumn(e: BE)(implicit w: WindowSpec): Column = e match {
    case Cmp(">", a, b)  => toColumn(a) > toColumn(b)
    case Cmp("<", a, b)  => toColumn(a) < toColumn(b)
    case Cmp(">=", a, b) => toColumn(a) >= toColumn(b)
    case Cmp("<=", a, b) => toColumn(a) <= toColumn(b)
    case Cmp(op, _, _)   => throw new IllegalArgumentException(op)
    case Logic("AND", a, b) => toColumn(a) && toColumn(b)
    case Logic(op, a, b)    => toColumn(a) || toColumn(b)
  }

  // ---- DuckDB SQL interpreter (window named `w`) ----
  def toSql(e: NE): String = e match {
    case Src(name, 0) => name
    case Src(name, k) => s"lag($name, $k) OVER w"
    case Num(v)       => if (v == v.toLong.toDouble) s"CAST(${v.toLong} AS DOUBLE)" else v.toString
    case Bin(op, a, b) => s"(${toSql(a)} $op ${toSql(b)})"
    case Abs(a)       => s"abs(${toSql(a)})"
    case Min2(a, b)   => s"least(${toSql(a)}, ${toSql(b)})"
    case Max2(a, b)   => s"greatest(${toSql(a)}, ${toSql(b)})"
  }
  def toSql(e: BE): String = e match {
    case Cmp(op, a, b)   => s"(${toSql(a)} $op ${toSql(b)})"
    case Logic(op, a, b) => s"(${toSql(a)} $op ${toSql(b)})"
  }

  /** A candlestick pattern: fires +100 on `bullCase`, −100 on `bearCase`,
    * else 0. Rows whose lags fall off the series start never fire (the
    * NULL-valued predicate is not TRUE in either engine), matching the
    * reference's `for i in k..n` loop over a zeroed output. */
  final case class Pattern(name: String, lookback: Int,
                           bullCase: Option[BE], bearCase: Option[BE]) {
    def column(implicit w: WindowSpec): Column = {
      val base: Column = lit(0)
      val withBear = bearCase.fold(base)(b => when(toColumn(b), -100).otherwise(base))
      bullCase.fold(withBear)(b => when(toColumn(b), 100).otherwise(withBear))
        .cast("int").as(name)
    }
    def sqlExpr: String = {
      val bull = bullCase.map(b => s"WHEN ${toSql(b)} THEN 100").getOrElse("")
      val bear = bearCase.map(b => s"WHEN ${toSql(b)} THEN -100").getOrElse("")
      s"CAST(CASE $bull $bear ELSE 0 END AS INTEGER) AS $name"
    }
  }
}
