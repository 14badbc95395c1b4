package graft

import java.nio.file.{Files, Paths}

/** Dumps `.explain("formatted")` for the named queries to
  * `plans/<tag>/<query>_<suffix>.txt` — the before/after evidence files
  * for optimization rounds.
  * `runMain graft.PlanDump <tag> <suffix> <sfDir> <query...>`. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val suffix = args(1)
    val dir = args(2)
    val names = args.drop(3)
    val spark = Sessions.local("8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(s"plans/$tag"))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val full = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
        .flatMap(c => if (c < ' ' && c != '\n') f"\\u${c.toInt}%04x" else c.toString)
      // iterative queries repeat child trees inside InMemoryRelations;
      // the head carries the shuffle/join/pushdown evidence
      val plan =
        if (full.length <= 120000) full
        else full.take(120000) +
          s"\n... [truncated: ${full.length} chars]\n"
      Files.writeString(Paths.get(s"plans/$tag/${name}_$suffix.txt"), plan)
      println(s"wrote plans/$tag/${name}_$suffix.txt (${plan.length} chars)")
      graft.functions.CacheRegistry.releaseAll()
    }
    spark.stop()
  }
}
