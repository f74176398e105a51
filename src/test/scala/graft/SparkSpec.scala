package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for suites (one per suite, SURVEY §5.2). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession =
    graft.core.GraftSession.builder("graft-test", "local[4]", 4).getOrCreate()

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
