package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Sessions

/** Shared local session for all suites (getOrCreate → one JVM-wide
  * session; suites must not stop() it). sf0.001 keeps each suite fast. */
trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(4, "graft-test")
  val sf = "/root/testdata/sf0.001"

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
