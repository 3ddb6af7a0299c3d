package graft

import org.apache.spark.sql.SparkSession

/** Shared local SparkSession for all specs. */
object TestSpark {
  lazy val spark: SparkSession = graft.core.Sessions.local("4", "4", "graft-test")
  val sfDir = "/root/testdata/sf0.001"
}
