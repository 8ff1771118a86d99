package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All queries take the scale-factor directory as a parameter so the same
  * plan runs at sf0.001 (smoke), sf0.01 (correctness), sf0.1 (bench) and —
  * unchanged — against a 100 TB date-partitioned production layout: the
  * scan is a plain parquet read whose filters and column pruning Catalyst
  * pushes into the file source.
  *
  * Timestamp policy: every timestamp is normalized to TIMESTAMP_NTZ (naive
  * wall-clock, session pinned UTC) so outputs are bit-comparable with the
  * DuckDB oracle's naive TIMESTAMP. `events.ts` has shipped as parquet
  * TIMESTAMP(NANOS) in some testdata generations — Spark only reads that
  * via `spark.sql.legacy.parquet.nanosAsLong=true` (set in [[Sessions]]),
  * surfacing a raw BIGINT — and as micros TIMESTAMP_NTZ in others, so
  * the loader BRANCHES on the surfaced type: a nanos BIGINT is converted
  * to microsecond TIMESTAMP_NTZ with integer `div` (a double division
  * would lose precision above 2^53 ns), anything else passes through
  * `normalizeTs`. Don't hardcode either spelling downstream (the r15
  * round lost a plan pin and the r16 round lost the ScaleUp generator to
  * exactly that drift).
  */
object Tables {

  private def normalizeTs(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case TimestampType => col(f.name).cast(TimestampNTZType).as(f.name)
        case _             => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    val withTs =
      if (name == "events" && raw.schema("ts").dataType == LongType)
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)").cast(TimestampNTZType))
      else raw
    normalizeTs(withTs)
  }

  /** Repartition for CPU-bound per-row work ONLY when the scan
    * under-parallelizes. The test parquet arrives as ONE split, so
    * without a repartition every md5/tokenize-heavy per-doc chain runs
    * on a single core; but at production scale the same table is
    * thousands of splits and an unconditional repartition would shuffle
    * every text byte for nothing. The scan's own partition count decides
    * — results are identical either way (downstream work is per-row or
    * re-keyed later). `toRdd.getNumPartitions` plans the scan but runs
    * no job. */
  /** The width is pinned EXPLICITLY (not left to the session default):
    * a keyed repartition without a partition count is an
    * AQE-coalescable exchange, and under size-first coalescing
    * ([[Sessions]] sets coalescePartitions.parallelismFirst=false, r22)
    * the KB-sized document/event tables would collapse back to one
    * post-shuffle partition — re-serializing exactly the CPU-heavy
    * per-row work this spread exists to parallelize. An explicit count
    * is never coalesced; the value is the context's defaultParallelism,
    * i.e. derived from the machine, not a constant. */
  def spreadForCpu(df: DataFrame, by: Column): DataFrame =
    if (underParallelized(df))
      df.repartition(df.sparkSession.sparkContext.defaultParallelism, by)
    else df

  /** Round-robin variant for purely per-row chains with no natural key. */
  def spreadForCpu(df: DataFrame): DataFrame =
    if (underParallelized(df))
      df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    else df

  private def underParallelized(df: DataFrame): Boolean =
    df.queryExecution.toRdd.getNumPartitions <
      df.sparkSession.sparkContext.defaultParallelism

  def events(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "events")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
