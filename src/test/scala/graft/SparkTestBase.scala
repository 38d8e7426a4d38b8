package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Sessions

/** One shared local SparkSession for all suites (lazy, 4 threads). */
object SparkTestBase {
  lazy val spark: SparkSession = Sessions.local("4", "graft-test")
}

trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark
  val sf001 = "/root/testdata/sf0.001"
  /** For plan-shape assertions only — large enough that AQE/size-based
    * planning sees realistic stats; execution-heavy tests stay on sf001. */
  val sf01 = "/root/testdata/sf0.1"
}
