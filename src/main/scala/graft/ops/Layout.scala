package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.Present.PresentOps

/** Storage-layout maintenance: compaction with range-clustered, in-file
  * sorted output — the op every streaming ingest needs scheduled behind
  * it. A micro-batch sink writes a file per trigger per partition;
  * after a day that is tens of thousands of small files whose footers
  * alone slow planning, and whose row groups interleave time ranges so
  * a time-predicate scan reads everything.
  *
  * `compactSorted` rewrites a table as `targetFiles` files
  * RANGE-partitioned on the sort key and sorted within each file. The
  * payoff is zone-map pruning: each file (and each parquet row group
  * inside it) covers a DISJOINT slice of the key axis, so a range
  * predicate prunes to the few files/row groups whose [min, max]
  * straddle it — LayoutSpec proves the disjointness from the written
  * files themselves, and the parquet reader's row-group stats filtering
  * does the rest at scan time.
  *
  * Scale: one range Exchange (sampled boundaries) + per-partition sort,
  * both streaming-friendly, no driver materialization. At 100 TB this
  * runs per date-partition, not globally — the `targetFiles` dial is
  * files-per-partition (sized to ~128 MB-1 GB each), and the global
  * date-partitioning column stays the directory key.
  */
object Layout {

  /** Rewrite `df` as `targetFiles` range-clustered, internally-sorted
    * parquet files at `path`, and return the re-read frame. */
  def compactSorted(df: DataFrame, sortCol: String, targetFiles: Int,
                    path: String): DataFrame = {
    df.repartitionByRange(targetFiles, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Gate query: compact `events` into 4 ts-clustered files and
    * aggregate the re-read copy — value-identical to aggregating the
    * original (the oracle), proving compaction preserves the row set
    * exactly. The layout claims themselves (file count, disjoint
    * per-file key ranges, in-file ordering) are pinned in LayoutSpec. */
  def compactRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val path = sys.props("java.io.tmpdir") + "/graft_compacted_events"
    compactSorted(Tables.events(spark, dir), "ts", 4, path)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           min(col("ts")).as("ts_min"),
           max(col("ts")).as("ts_max"))
      .presentSorted(col("event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "compact_roundtrip" -> compactRoundTrip _)

  val oracles: Map[String, String] = Map(
    "compact_roundtrip" ->
      """SELECT event_type, count(*) AS n,
        |  min(CAST(ts AS TIMESTAMP)) AS ts_min,
        |  max(CAST(ts AS TIMESTAMP)) AS ts_max
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)
}
