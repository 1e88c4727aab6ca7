package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (mirrors the reference's
  * tests/pyspark_test_base.py harness shape). */
trait SparkSpecBase extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSpecBase.session

  override def afterAll(): Unit = super.afterAll()
}

object SparkSpecBase {
  lazy val session: SparkSession = graft.core.GraftSession.local(4, "graft-test")
}
