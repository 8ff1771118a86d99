package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (getOrCreate — building
  * a SparkSession per spec would dominate test wall-clock). */
object TestSpark {
  lazy val spark: SparkSession = Sessions.local("2")
  val sfDir = "/root/testdata/sf0.001"
}
