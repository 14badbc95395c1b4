package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc dev runner: `runMain graft.Dev <queryName> [sfDir]` shows the
  * query result (full exceptions propagate). */
object Dev {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.analyzer.failAmbiguousSelfJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // one dispatch for both paths: "entry" is not a key in `queries`
    def build() = if (name == "entry") SparkEntry.entry(spark)
                  else SparkEntry.queries(name)(spark, dir)
    val df = build()
    if (args.contains("--explain")) df.explain("formatted")
    if (args.contains("--time")) {
      // bench-shaped timing: warmup pass, then min of 2 noop-sink runs
      def once(): Double = {
        val t0 = System.nanoTime()
        build().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val t1 = once(); val t2 = once(); val t3 = once()
      println(f"TIME $name ${math.min(t2, t3)}%.3f sec (min of 2, warm; runs: $t1%.3f $t2%.3f $t3%.3f)")
    } else df.show(50, false)
    spark.stop()
  }
}
