package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gate for the mechanized order-dependent-float-mean audit: every
  * genuinely float-typed avg/sum in oracle SQL must be whitelisted with
  * a reason, every aggregate must have a binder verdict in the checked-in
  * type artifact (regenerate: `runMain graft.FloatMeanAudit` then
  * `python3 tools/float_mean_probe.py`), and the whitelist may not carry
  * stale entries. See [[FloatMeanAudit]] for the risk class and the
  * house quantization convention. */
class FloatMeanAuditSpec extends AnyFunSuite {

  test("no unwhitelisted or unprobed float means in oracle SQL") {
    val bad = FloatMeanAudit.violations()
    assert(bad.isEmpty, bad.map { case (a, st) =>
      s"${a.query}: ${a.fn}(${a.arg.replaceAll("\\s+", " ").take(80)}) [$st]"
    }.mkString("\n  float aggregates without a verdict or whitelist reason:\n  ",
      "\n  ", ""))
  }

  test("whitelist carries no stale entries") {
    val stale = FloatMeanAudit.staleWhitelist()
    assert(stale.isEmpty,
      s"whitelisted queries with no remaining float aggregate: $stale")
  }

  test("extractor finds balanced-paren aggregates with offsets") {
    val sql =
      "SELECT avg(a + f(b, c)) AS m, sum(CAST(floor(x * 1e6 + 0.5) AS BIGINT)) FROM t"
    val aggs = FloatMeanAudit.findAggs(sql)
    assert(aggs.map(_._1).sorted == Seq("avg", "sum"))
    val avgArg = aggs.find(_._1 == "avg").map(t => sql.substring(t._2, t._3)).get
    val sumArg = aggs.find(_._1 == "sum").map(t => sql.substring(t._2, t._3)).get
    assert(avgArg == "a + f(b, c)")
    assert(FloatMeanAudit.isQuantized(sumArg))
    assert(!FloatMeanAudit.isQuantized(avgArg))
  }
}
