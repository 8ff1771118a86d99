package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-level backfill — the repair op every date-partitioned
  * 100 TB layout needs: re-run ONE day and overwrite ONLY that day's
  * directory, leaving every other partition untouched. Spark's static
  * overwrite mode would silently DELETE the whole table first (the
  * classic backfill footgun); `partitionOverwriteMode=dynamic` scopes
  * the overwrite to the partitions present in the written frame. This
  * spec pins both: the repaired day is replaced, and the untouched days
  * survive byte-for-byte (same row multiset). */
class DynamicOverwriteSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("dynamic partition overwrite replaces one day, preserves the rest") {
    val mode = "spark.sql.sources.partitionOverwriteMode"
    val old = spark.conf.getOption(mode)
    val path = java.nio.file.Files
      .createTempDirectory("graft_dynover").toString
    try {
      spark.conf.set(mode, "dynamic")
      val ev = Tables.events(spark, sfDir)
        .withColumn("day", to_date(col("ts")))
      ev.write.partitionBy("day").mode("overwrite").parquet(path)
      // order-independent multiset digest of a slice — captured EAGERLY
      // (the overwrite deletes the files a lazy frame would re-read)
      def snapshot(dayPred: org.apache.spark.sql.Column)
          : (Long, java.math.BigDecimal, java.math.BigDecimal) = {
        val df = spark.read.parquet(path).filter(dayPred)
        val r = df.agg(
          count(lit(1)),
          // ANSI mode: sum 64-bit hashes in DECIMAL, not LONG (overflow)
          sum(xxhash64(df.columns.map(col).toIndexedSeq: _*)
                .cast("decimal(38,0)")),
          sum(col("value").cast("decimal(28,6)"))).head()
        (r.getLong(0), r.getDecimal(1), r.getDecimal(2))
      }
      val days = spark.read.parquet(path).select(col("day")).distinct()
        .orderBy(col("day")).collect().map(_.getDate(0))
      assert(days.length > 1, "fixture must span multiple days")
      val target = days.head
      val (dayN0, _, daySum0) = snapshot(col("day") === lit(target))
      val (restN0, restHash0, restSum0) = snapshot(col("day") =!= lit(target))

      // backfill: rewrite ONLY the first day, values doubled (a visible
      // change), in dynamic overwrite mode
      ev.filter(to_date(col("ts")) === lit(target))
        .withColumn("value", col("value") * 2)
        .write.partitionBy("day").mode("overwrite").parquet(path)

      // repaired day: fully replaced (same rows, doubled value sum)
      val (dayN1, _, daySum1) = snapshot(col("day") === lit(target))
      assert(dayN1 === dayN0)
      assert(daySum1.compareTo(daySum0.add(daySum0)) === 0,
             s"day not rewritten: before=$daySum0 after=$daySum1")

      // every OTHER day: identical row multiset
      val (restN1, restHash1, restSum1) = snapshot(col("day") =!= lit(target))
      assert(restN1 === restN0 && restHash1.compareTo(restHash0) === 0 &&
               restSum1.compareTo(restSum0) === 0,
             "untouched partitions changed under dynamic overwrite")
    } finally old match {
      case Some(v) => spark.conf.set(mode, v)
      case None    => spark.conf.unset(mode)
    }
  }
}
