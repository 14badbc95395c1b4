package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test JVM. */
object TestSpark {
  // the shared fleet configuration (graft.Sessions) minus the Catalyst
  // extensions — specs opt in per-rule
  lazy val spark: SparkSession = graft.Sessions
    .builder("local[8]", "8", extensions = false)
    .appName("graft-tests")
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
