package graft

import org.apache.spark.sql.functions._
import graft.text.GramExprs

class GramExprsSpec extends SparkSuite {
  import spark.implicits._

  private def m(a: Seq[String], b: Seq[String]): Long =
    Seq((a, b)).toDF("a", "b")
      .select(GramExprs.multisetIntersectSize(
        array_sort(col("a")), array_sort(col("b"))).as("m"))
      .head().getLong(0)

  test("counts common elements WITH multiplicity over sorted arrays") {
    assert(m(Seq("ab", "ab", "cd"), Seq("ab", "cd", "cd")) == 2) // 1×ab + 1×cd
    assert(m(Seq("ab", "ab", "ab"), Seq("ab", "ab")) == 2)
    assert(m(Seq("x"), Seq("y")) == 0)
    assert(m(Nil, Seq("a")) == 0)
    assert(m(Nil, Nil) == 0)
    assert(m(Seq("a", "b", "c"), Seq("a", "b", "c")) == 3)
  }

  test("equals the explode/groupBy/least/sum plan on random multisets") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50) {
      def arr() = Seq.fill(rnd.nextInt(30))(s"g${rnd.nextInt(8)}")
      (arr(), arr())
    }
    val df = rows.toDF("a", "b").withColumn("id", monotonically_increasing_id())
    val kernel = df.select(col("id"), GramExprs.multisetIntersectSize(
        array_sort(col("a")), array_sort(col("b"))).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val oracle = rows.zipWithIndex.map { case ((a, b), i) =>
      val ca = a.groupBy(identity).view.mapValues(_.size)
      val cb = b.groupBy(identity).view.mapValues(_.size)
      i.toLong -> ca.keys.map(k => math.min(ca(k), cb.getOrElse(k, 0)).toLong).sum
    }.toMap
    assert(kernel == oracle)
  }

  test("non-string arrays fail analysis; null arrays yield null") {
    intercept[Exception] {
      Seq((Seq(1, 2), Seq(2, 3))).toDF("a", "b")
        .select(GramExprs.multisetIntersectSize(col("a"), col("b"))).collect()
    }
    val r = Seq((Some(Seq("a")), Option.empty[Seq[String]]))
      .toDF("a", "b")
      .select(GramExprs.multisetIntersectSize(col("a"), col("b")).as("m"))
      .head()
    assert(r.isNullAt(0))
  }
}
