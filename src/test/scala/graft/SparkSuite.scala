package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test JVM. */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("graft-tests")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    .config("spark.sql.analyzer.failAmbiguousSelfJoin", "false")
    // the fleet-wide codegen-cache sizing (see Bench.scala): the suite
    // runs hundreds of distinct plans in one JVM
    .config("spark.sql.codegen.cache.maxEntries", "10000")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = TestSpark.spark
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf001 = "/root/testdata/sf0.001"
}
