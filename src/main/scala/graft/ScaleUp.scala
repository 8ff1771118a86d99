package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-probe data generator: writes a `factor`-times-larger copy of a
  * test SF directory, preserving each table's distributional shape —
  * the input of BASELINE.md's empirical sf0.1→sf1 scale curve.
  *
  * Method: `factor` disjoint copies of every scaling table, keys shifted
  * per copy by the table's key span so referential joins stay consistent
  * WITHIN a copy and never collide across copies (exactly how a bigger
  * corpus grows: more orders from more customers, not the same orders
  * twice). Two deliberate choices keep the workload's shape honest:
  *
  *  - `documents.text` is letter-ROTATED per copy (translate with a
  *    copy-specific rotated alphabet): word/shingle structure, lengths,
  *    and the per-copy near-duplicate graph are isomorphic to the
  *    original, but vocabularies are disjoint across copies — so LSH
  *    bucket sizes scale like a real 10× corpus (10× more buckets of the
  *    same size). Naive replication with UNCHANGED texts would put every
  *    text in the same bucket 10 times: candidate pairs would grow ×100
  *    by construction and the probe would measure the fixture, not the
  *    plan.
  *  - `documents.source` gets a per-copy suffix, so the syndication
  *    graph gains 10× the nodes/edges rather than 10× the edge
  *    multiplicity on a fixed node set.
  *
  * `region`/`nation` stay fixed (TPC-H-style dimension semantics).
  * `events.ts` is written as microsecond TIMESTAMP_NTZ, not the source's
  * TIMESTAMP(NANOS): the session reads nanos as a raw BIGINT
  * (`nanosAsLong`), Spark cannot write nanos back, and the DuckDB oracle
  * cannot `CAST(BIGINT AS TIMESTAMP)`. Semantics are identical on both
  * sides — Tables.load itself truncates nanos to micros, and the oracle's
  * `CAST(ts AS TIMESTAMP)` on TIMESTAMP_NS does the same truncation.
  *
  * Usage: `runMain graft.ScaleUp <srcDir> <dstDir> [factor=10]`.
  */
object ScaleUp {

  private val Lower = "abcdefghijklmnopqrstuvwxyz"

  private[graft] def rot(s: String, k: Int): String = {
    val n = ((k % s.length) + s.length) % s.length
    s.drop(n) + s.take(n)
  }

  /** Key span = max+1, so `id + c*span` never collides across copies.
    * Package-private so ScaleUpSpec can pin the r14-ADVICE guards: a
    * loud failure (not an NPE) on an empty/malformed source column, and
    * Number-widening for INT as well as BIGINT key columns. */
  private[graft] def span(df: DataFrame, key: String, src: String): Long = {
    val v = df.agg(max(col(key))).collect()(0).get(0)
    require(v != null, s"cannot size key span: $key has no non-null values " +
      s"(empty or malformed source table in $src)")
    v.asInstanceOf[Number].longValue + 1L
  }

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    require(factor >= 1, s"factor must be >= 1, got $factor")
    // The text rotation has period 26: copy c and copy c+26 would get the
    // SAME alphabet, collapsing their vocabularies into shared LSH buckets
    // — exactly the fixture artifact the rotation exists to avoid. Fail
    // loudly rather than silently skewing the probe. (The embedding
    // rotation has period `dim`, checked below once dim is known.)
    require(factor <= Lower.length,
      s"factor must be <= ${Lower.length} (text-rotation period), got $factor")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def raw(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    /** Union of `factor` transformed copies; `f(df, c)` builds copy c. */
    def scaled(name: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val base = raw(name)
      val out = (0 until factor).map(c => f(base, c)).reduce(_ unionByName _)
      out.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      System.err.println(s"[scaleup] $name -> ${factor}x")
    }

    def copyAsIs(name: String): Unit = {
      raw(name).write.mode("overwrite").parquet(s"$dst/$name.parquet")
      System.err.println(s"[scaleup] $name -> 1x (dimension)")
    }

    val ck = span(raw("customer"), "c_custkey", src)
    val sk = span(raw("supplier"), "s_suppkey", src)
    val pk = span(raw("part"), "p_partkey", src)
    val ok = span(raw("orders"), "o_orderkey", src)
    val ek = span(raw("events"), "event_id", src)
    val uk = span(raw("events"), "user_id", src)
    val dk = span(raw("documents"), "doc_id", src)
    val vk = span(raw("embeddings"), "vec_id", src)

    copyAsIs("region")
    copyAsIs("nation")
    scaled("customer")((df, c) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(c * ck)))
    scaled("supplier")((df, c) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(c * sk)))
    scaled("part")((df, c) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(c * pk)))
    scaled("orders")((df, c) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(c * ok))
        .withColumn("o_custkey", col("o_custkey") + lit(c * ck)))
    scaled("lineitem")((df, c) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(c * ok))
        .withColumn("l_partkey", col("l_partkey") + lit(c * pk))
        .withColumn("l_suppkey", col("l_suppkey") + lit(c * sk)))
    scaled("events") { (df, c) =>
      val shifted = df
        .withColumn("event_id", col("event_id") + lit(c * ek))
        .withColumn("user_id", col("user_id") + lit(c * uk))
      // Branch on the file's physical ts type (same drift-proofing as
      // Scalars.scanPruned): TIMESTAMP(NANOS) sources surface as a raw
      // BIGINT under nanosAsLong and need the micros conversion; a
      // micros TIMESTAMP_NTZ source is already the write-out type.
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          shifted.withColumn("ts", expr("timestamp_micros(ts div 1000)")
            .cast(org.apache.spark.sql.types.TimestampNTZType))
        case _ => shifted
      }
    }
    scaled("documents") { (df, c) =>
      val from = Lower + Lower.toUpperCase
      val to = rot(Lower, c) + rot(Lower.toUpperCase, c)
      df.withColumn("doc_id", col("doc_id") + lit(c * dk))
        .withColumn("text", translate(col("text"), from, to))
        .withColumn("source", concat(col("source"), lit(s"-c$c")))
    }
    // Vectors are dimension-ROTATED per copy (same reasoning as the text
    // rotation): a shared permutation of dimensions leaves every
    // within-copy dot product / norm bit-identical — the per-copy
    // neighbor graph is isomorphic to the original — while cross-copy
    // cosines decorrelate, so ANN cells and embedding-dedup blocks grow
    // in COUNT (like a real 10× corpus), not in per-block size. Naive
    // replication would put `factor` verbatim copies of every vector in
    // the same block and the quadratic verify step would measure the
    // fixture, not the plan.
    val dim = raw("embeddings")
      .select(size(col("embedding"))).limit(1).collect()(0).getInt(0)
    // Same degeneracy guard as the text rotation: the dimension rotation
    // has period `dim`, so copy c = dim would replicate copy 0 verbatim.
    require(factor <= dim,
      s"factor must be <= $dim (embedding-rotation period), got $factor")
    scaled("embeddings") { (df, c) =>
      val r = c % dim
      val rotated =
        if (r == 0) col("embedding")
        else concat(slice(col("embedding"), r + 1, dim - r),
                    slice(col("embedding"), 1, r))
      df.withColumn("vec_id", col("vec_id") + lit(c * vk))
        .withColumn("embedding", rotated)
    }

    spark.stop()
  }
}
