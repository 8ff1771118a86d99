package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Export

/** The PARALLEL CSV writer — the scale path the gate's single-file round
  * trip (csv_export) doesn't touch: keeps input parallelism (multiple
  * part files), survives a schema-checked read-back value-exact. */
class ExportSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("parallel csv export keeps partitioning and round-trips values") {
    val out = Files.createTempDirectory("graft_csv_parallel").toString
    val df = Tables.events(spark, sfDir)
      .select("event_id", "event_type", "value")
      .repartition(4)
    Export.csv(df, out)

    val parts = new java.io.File(out).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv"))
    assert(parts === 4, "parallel writer must keep one file per partition")

    val back = spark.read.schema(df.schema).option("header", "true").csv(out)
    assert(back.count() === df.count())
    // DECIMAL sum: a DOUBLE sum here differs between the two frames by
    // partition merge order — the exact non-associativity the engine's
    // own aggregates guard against
    def decSum(f: org.apache.spark.sql.DataFrame) =
      f.agg(sum(col("value").cast("decimal(18,2)"))).collect()(0).getDecimal(0)
    assert(decSum(back) === decSum(df))
    assert(back.select("event_id").distinct().count() === df.count())
  }
}
