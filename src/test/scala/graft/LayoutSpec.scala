package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ops.Layout]] layout-quality contract: the claims zone-map
  * pruning depends on, proven from the written files themselves. */
class LayoutSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("compactSorted writes the target file count with DISJOINT, " +
       "internally-sorted key ranges") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_layout").toString
    val back = ops.Layout.compactSorted(
      Tables.events(spark, sfDir), "ts", 4, path)

    // row set preserved
    assert(back.count() === Tables.events(spark, sfDir).count())

    // target file count (±0: range partitioner emits exactly N splits)
    val perFile = back
      .groupBy(input_file_name().as("f"))
      .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"),
           count(lit(1)).as("n"))
      .collect().sortBy(_.getAs[java.time.LocalDateTime]("lo"))
    assert(perFile.length === 4, perFile.mkString("\n"))

    // disjoint key ranges across files — the zone-map property: a ts
    // predicate can prune whole files by footer stats alone
    perFile.sliding(2).foreach { case Array(a, b) =>
      assert(!a.getAs[java.time.LocalDateTime]("hi")
               .isAfter(b.getAs[java.time.LocalDateTime]("lo")),
             s"overlapping file ranges:\n${perFile.mkString("\n")}")
    }

    // no pathological skew from the sampled range boundaries
    val counts = perFile.map(_.getAs[Long]("n"))
    assert(counts.min > counts.max / 4,
           s"range partitioner produced skewed files: ${counts.mkString(",")}")

    // in-file ordering: within every file, ts is non-decreasing in read
    // order (monotonically_increasing_id preserves per-file row order)
    val disorder = back
      .select(input_file_name().as("f"), col("ts"),
              monotonically_increasing_id().as("rid"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("f")).orderBy(col("rid"))))
      .filter(col("prev_ts") > col("ts"))
      .count()
    assert(disorder === 0, s"$disorder out-of-order rows inside files")
  }
}
