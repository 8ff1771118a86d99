package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.Present.PresentOps

/** B5: CSV batch export — `coalesce(1).write.csv(header=True)`
  * (reference: README.md:402).
  *
  * `coalesce(1)` is intentional ONLY for small end-user exports (that is
  * the reference's use too); at production scale exports go through
  * [[csv]] which keeps the input parallelism.
  */
object Export {

  /** Temp dirs awaiting reap. ONE static shutdown hook drains the queue —
    * a hook per [[csvRoundtrip]] call would retain a Thread per
    * invocation for the JVM's life in a long-lived bench/gate session. */
  private val scratchDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val reapHook: Unit = {
    sys.addShutdownHook {
      import scala.jdk.CollectionConverters._
      scratchDirs.iterator().asScala.foreach { dir =>
        // deepest-first so files go before their dirs; Using closes the
        // underlying directory-stream handle
        scala.util.Using(java.nio.file.Files.walk(dir)) { s =>
          s.iterator().asScala.toSeq.sortBy(-_.getNameCount)
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        }
      }
    }
    ()
  }

  /** Create a reaped-at-exit scratch dir — for gates that must persist
    * and read back an artifact within one query ([[csvRoundtrip]]'s
    * lifecycle, shared so other persisting gates don't each grow their
    * own shutdown hook). */
  private[graft] def scratch(prefix: String): String = {
    val outDir = java.nio.file.Files.createTempDirectory(prefix)
    reapHook          // register the single reaper (idempotent via lazy)
    scratchDirs.add(outDir)
    outDir.toString
  }

  /** Parallel CSV export — the scale path. */
  def csv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Single-file CSV export for human-sized results (reference form). */
  def csvSingleFile(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  /** Gate-visible query: export events(event_id, event_type, value) to a
    * scratch CSV with a header, read it back with an explicit schema, and
    * return the rows — green only if the header and every value survive
    * the round trip bit-exactly (Spark writes doubles in shortest
    * round-trippable form). */
  def csvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = scratch("graft_csv_export")
    csvSingleFile(
      Tables.events(spark, dir).select("event_id", "event_type", "value"),
      out)
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    spark.read.schema(schema).option("header", "true").csv(out)
      .presentSorted(col("event_id"))
  }

  /** JSON-lines round trip — the interchange format every ingest edge
    * speaks (and the reference's own wire format, SURVEY §1.2). Doubles
    * survive because Spark writes shortest-round-trippable literals;
    * timestamps are deliberately excluded (JSON has no timestamp type —
    * the string convention is a sink contract, not an engine one). */
  def jsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val outDir = java.nio.file.Files.createTempDirectory("graft_json_export")
    reapHook
    scratchDirs.add(outDir)
    val out = outDir.toString
    Tables.events(spark, dir).select("event_id", "event_type", "value")
      .write.mode("overwrite").json(out)
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    spark.read.schema(schema).json(out).presentSorted(col("event_id"))
  }

  /** ORC round trip — the second columnar format a warehouse must read
    * and write (hive-ecosystem interchange); exercises the ORC
    * reader/writer including its own predicate-pushdown/stats path. */
  def orcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val outDir = java.nio.file.Files.createTempDirectory("graft_orc_export")
    reapHook
    scratchDirs.add(outDir)
    val out = outDir.toString
    Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"), col("ts"))
      .write.mode("overwrite").orc(out)
    spark.read.orc(out).presentSorted(col("event_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "csv_export"  -> csvRoundtrip _,
    "json_export" -> jsonRoundtrip _,
    "orc_export"  -> orcRoundtrip _)

  val oracles: Map[String, String] = Map(
    "csv_export" ->
      "SELECT event_id, event_type, value FROM events ORDER BY event_id",
    "json_export" ->
      "SELECT event_id, event_type, value FROM events ORDER BY event_id",
    "orc_export" ->
      """SELECT event_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
        |FROM events ORDER BY event_id""".stripMargin)
}
