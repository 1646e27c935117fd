package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites — one JVM-wide local session keeps the
  * whole test run inside a single Spark context. */
object SparkTestSession {
  lazy val spark: SparkSession = Engine.session(cpus = 4, appName = "graft-test")
  val sf: String = "/root/testdata/sf0.001"
}

trait SparkSpec extends AnyFunSuite {
  def spark: SparkSession = SparkTestSession.spark
  def sf: String = SparkTestSession.sf
}
