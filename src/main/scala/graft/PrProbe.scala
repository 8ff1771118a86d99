package graft

// scratch probe for the pageRank loop — not part of the library surface
object PrProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("32")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val name = args.headOption.getOrElse("syndication_pagerank")
    val fn = SparkEntry.queries(name)
    for (rep <- 1 to 3) {
      spark.catalog.clearCache()
      t(s"rep$rep full") {
        val df = t(s"rep$rep build")(fn(spark, dir))
        t(s"rep$rep write")(df.write.format("noop").mode("overwrite").save())
      }
    }
    spark.stop()
  }
}
