package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor => ffloor}

/** Canonical cross-engine rounding (SURVEY.md §7.4 item 3).
  *
  * Spark's `round(x, d)` routes doubles through `BigDecimal.valueOf`
  * (shortest decimal re-interpretation, HALF_UP) while DuckDB rounds the
  * binary value — at exact decimal midpoints (reachable because averages of
  * 2-decimal inputs terminate) the two disagree by 1 ulp of the target
  * precision. The canonicalization used throughout the engine is therefore
  * `floor(x·10^d + 0.5) / 10^d`: every step is an exact-semantics IEEE-754
  * op that evaluates bit-identically in Spark, DuckDB, or any other engine.
  * Oracle SQL is post-processed by [[fixSqlRounds]] so authors can keep
  * writing `round(e, d)` on both sides.
  */
object Canon {

  /** Shadow for `org.apache.spark.sql.functions.round` — import this AFTER
    * `functions._` and all `round(col, d)` call sites pick it up. */
  def round(c: Column, d: Int): Column = {
    val p = math.pow(10, d)
    ffloor(c * p + 0.5) / p
  }

  /** Rewrite every `round(expr, d)` in a SQL string into the floor form. */
  def fixSqlRounds(sql: String): String = {
    var i = sql.indexOf("round(")
    // skip identifiers merely ending in "round(" (word-boundary check)
    while (i > 0 && (sql(i - 1).isLetterOrDigit || sql(i - 1) == '_')) {
      i = sql.indexOf("round(", i + 1)
    }
    if (i < 0) return sql
    val open = i + 5
    var depth = 0
    var end = -1
    var k = open
    while (end < 0 && k < sql.length) {
      sql(k) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) end = k
        case _ =>
      }
      k += 1
    }
    require(end > 0, s"unbalanced parens after round( in: $sql")
    val inner = sql.substring(open + 1, end)
    var d2 = 0
    var cpos = -1
    for (m <- inner.indices) inner(m) match {
      case '(' => d2 += 1
      case ')' => d2 -= 1
      case ',' if d2 == 0 => cpos = m
      case _ =>
    }
    require(cpos > 0, s"round() without digits arg in: $inner")
    val e = fixSqlRounds(inner.substring(0, cpos))
    val dig = inner.substring(cpos + 1).trim.toInt
    val p = "1" + "0" * dig
    sql.substring(0, i) +
      s"(floor(($e) * $p.0 + 0.5) / $p.0)" +
      fixSqlRounds(sql.substring(end + 1))
  }
}
