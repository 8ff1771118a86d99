package graft

/** Physical-plan capture for the optimization rounds' evidence files:
  * `runMain graft.Plans <outDir> <tag> [query...]` writes
  * `<outDir>/<query>_<tag>.txt` with each named query's
  * `explain("formatted")` output (all declared queries when none are
  * named). Plan-only — the queries are constructed, never executed as a
  * sink action (trainer gates still run their construction-time counted
  * regime checks, which is the honest plan: it is what a caller pays). */
object Plans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Plans <outDir> <tag> [query...]")
    val outDir = args(0)
    val tag = args(1)
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    Sessions.quietBenchLogs()
    val spark = Sessions.local(cpus)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- names) {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      CacheScope.release(spark)
      spark.catalog.clearCache()
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"),
          txt.getBytes("UTF-8"))
        System.err.println(s"[plans] wrote $name")
      } catch { case e: Throwable =>
        System.err.println(s"[plans] $name failed: $e")
      }
    }
    spark.stop()
  }
}
