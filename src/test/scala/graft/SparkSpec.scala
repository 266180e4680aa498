package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM, forked by sbt). */
object TestSpark {
  lazy val spark: SparkSession =
    graft.core.GraftSession.local(cores = 4, appName = "graft-test")
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath
}
