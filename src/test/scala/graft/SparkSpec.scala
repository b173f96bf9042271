package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM per forked test run). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.build("4")
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

abstract class SparkSpec extends AnyFunSuite {
  val spark: SparkSession = TestSpark.spark
  val sf: String = TestSpark.sf
}
