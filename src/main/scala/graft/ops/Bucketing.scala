package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.Present.PresentOps

/** Bucketed (pre-partitioned) tables — the storage-layout answer to the
  * shuffle problem. ops/Joins shows the right DYNAMIC strategies (shuffle
  * the fact pair, broadcast the dims); this module shows the strategy
  * that removes the fact-fact shuffle entirely: write both fact tables
  * bucketed by the join key, and every subsequent join on that key reads
  * co-located buckets — zero Exchange on either side, forever amortized
  * across every downstream query.
  *
  * At 100 TB this is not an optimization, it is the difference between a
  * join that moves 100 TB over the network per query and one that moves
  * nothing: the shuffle is paid ONCE at ingest/compaction time and the
  * bucket files act as a persistent hash partitioning (Spark records the
  * bucket spec in the catalog and EnsureRequirements recognizes both
  * sides as HashPartitioning-compatible, so it inserts no Exchange).
  * The same layout serves bucket-pruned point lookups and co-located
  * aggregations on the bucket key.
  *
  * Bucket count: production sizes it so one bucket ≈ 100-200 MB per
  * table-partition (thousands of buckets at 100 TB); here 8 keeps the
  * test write small while still proving the plan shape.
  */
object Bucketing {

  private val BucketCount = 8

  /** Write `df` as a bucketed external table (data under /tmp, bucketing
    * metadata in the session catalog — the catalog entry is what makes
    * the read side shuffle-free). DROP first: saveAsTable Overwrite on a
    * changed schema otherwise trips the v1 path's table-exists check. */
  private def writeBucketed(df: DataFrame, table: String, key: String,
                            path: String): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    // repartition on the bucket key first: without it every write task
    // emits a file per bucket VALUE it sees (up to tasks × buckets tiny
    // files — a small-files problem at any scale); hash-repartitioned to
    // the bucket count, each task holds whole buckets → BucketCount
    // files per table, and single-file buckets let the read side use the
    // sortBy order (multi-file buckets force a re-sort before SMJ)
    df.repartition(BucketCount, col(key))
      .write.format("parquet").mode("overwrite")
      .option("path", path)
      .bucketBy(BucketCount, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Register the two fact tables bucketed by their join key and return
    * them — shared by the gate query and the plan spec.
    *
    * The write is SETUP, not the operator: production pays the bucketing
    * shuffle once at ingest/compaction and every later query reads the
    * layout for free. Mirror that here — memoize per (session, source
    * dir) so the first call writes and every subsequent call (bench
    * repeats included) goes straight to the catalog tables. Without
    * this, bench repeats re-time the table WRITE inside what claims to
    * be a read-join measurement (r8's 0.77 s spread leader).
    *
    * The memo key is the live session (WeakHashMap — a GC'd session's
    * entry dies with it, so a fresh session whose catalog lacks the
    * tables always rewrites) and the SOURCE DIR is encoded into the
    * table names and data paths, so dir A and dir B get disjoint
    * tables and an A→B→A call sequence returns A's data, not B's. */
  private val prepared =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Set[String]]

  /** Catalog-safe suffix unique per source dir. */
  private def dirTag(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString

  def bucketedFacts(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    synchronized {
      val tag = dirTag(dir)
      val done = prepared.computeIfAbsent(
        spark, _ => scala.collection.mutable.Set.empty[String])
      if (!done.contains(dir)) {
        val base = sys.props("java.io.tmpdir") + s"/graft_bucketed_$tag"
        writeBucketed(
          Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority"),
          s"graft_b_orders_$tag", "o_orderkey", s"$base/orders")
        writeBucketed(
          Tables.lineitem(spark, dir)
            .select(col("l_orderkey"),
                    (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
                      .as("rev")),
          s"graft_b_lineitem_$tag", "l_orderkey", s"$base/lineitem")
        done += dir
      }
      (spark.table(s"graft_b_lineitem_$tag"),
       spark.table(s"graft_b_orders_$tag"))
    }

  /** Gate query: the [[Joins.starRevenue]]-style fact-fact join executed
    * over the bucketed layout — same values as a plain join of the raw
    * parquet (the oracle), but the join itself reads co-located buckets
    * and shuffles NOTHING (pinned in PlanSpec). The one hash exchange in
    * the whole plan is the 5-row groupBy after the join. */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val (l, o) = bucketedFacts(spark, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
           sum(col("rev").cast(DecimalType(28, 6))).cast(DoubleType)
             .as("revenue"))
      .presentSorted(col("o_orderpriority"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bucketed_join" -> bucketedJoin _)

  val oracles: Map[String, String] = Map(
    "bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)
        |               AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
