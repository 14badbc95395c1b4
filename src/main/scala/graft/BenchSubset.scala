package graft

import org.apache.spark.sql.SparkSession

/** Suite-pressure attribution probe: replicates graft.Bench's exact
  * configuration and two-pass/min family loop over a SUBSET of families
  * (args = family prefixes, e.g. `a x`), printing per-query pass-1/
  * pass-2 times as it goes. When a query reads N× slower inside the
  * full bench than standalone-cold (Dev --time-cold), running its
  * family alone here separates "the family's own interaction"
  * (reproduces) from "cross-family session pressure" (does not). */
object BenchSubset {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // the SAME shared builder Bench uses — the property that makes this
    // probe's suite-pressure attribution valid (SPARK_GRAFT_CODEGEN_CACHE
    // overrides DOWN to 100, the Spark default, to reproduce the thrash)
    val spark = Sessions.local("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (!sys.env.contains("SPARK_GRAFT_NOWARM"))
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
        .foreach(t => Tables.t(spark, sfDir, t).count())
    val wanted = args.toSet
    def family(name: String): String = name.takeWhile(_ != '_')
    def run1(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // an arg with '_' selects a single query; a bare prefix, its family
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) =>
        wanted.isEmpty || wanted(family(n)) || wanted(n) }
      .groupBy(q => family(q._1)).toSeq
      .sortBy(_._1)
      .foreach { case (fam, qs) =>
        val p1 = qs.map { case (n, fn) => n -> run1(n, fn) }.toMap
        qs.foreach { case (n, fn) =>
          val t2 = run1(n, fn)
          println(f"SUBSET $fam $n p1=${p1(n)}%.2f p2=$t2%.2f min=${math.min(t2, p1(n))}%.2f")
        }
        graft.functions.CacheRegistry.releaseAll()
      }
    spark.stop()
  }
}
