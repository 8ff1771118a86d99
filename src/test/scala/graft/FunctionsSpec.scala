package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ArrayDot

/** The native ArrayDot expression must be a drop-in for the
  * `aggregate(zip_with(a,b,_*_), 0d, _+_)` fold it replaced: bit-equal
  * values (same left-to-right rounding), same null/mismatch propagation,
  * in BOTH the codegen and interpreted paths — the oracle parity of
  * three gate queries rides on this. */
class FunctionsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def foldDot = aggregate(
    zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (s, p) => s + p)

  private val cases = Seq(
    (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),               // plain
    (Seq(0.1, 0.2, 0.3, 0.7), Seq(1e-3, 2e7, -3.3, 0.0)),   // rounding-sensitive
    (Seq.empty[Double], Seq.empty[Double]),                 // empty → 0.0
    (Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)),                    // length mismatch → null
    (Seq.tabulate(64)(i => math.sin(i.toDouble)),           // embedding-shaped
     Seq.tabulate(64)(i => math.cos(i.toDouble) * 1e3)))

  test("ArrayDot equals the HOF fold bit-for-bit, including null/mismatch cases") {
    val df = cases.toDF("a", "b")
      .select(ArrayDot(col("a"), col("b")).as("fused"), foldDot.as("fold"))
    df.collect().foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1), r.toString)
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
               java.lang.Double.doubleToRawLongBits(r.getDouble(1)), r.toString)
    }
  }

  test("null elements and null arrays propagate to null") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array(1.0d, cast(null as double)), array(1.0d, 2.0d)),
        |  (cast(null as array<double>), array(1.0d))
        |AS t(a, b)""".stripMargin)
      .select(ArrayDot(col("a"), col("b")).as("fused"), foldDot.as("fold"))
    df.collect().foreach { r =>
      assert(r.isNullAt(0) && r.isNullAt(1), r.toString)
    }
  }

  /** Run `body` with expression codegen fully disabled: wholeStage=false
    * alone still compiles projections via UnsafeProjection codegen, so
    * nullSafeEval would never run — factoryMode=NO_CODEGEN forces the
    * interpreted `eval` path (org.apache.spark.sql.internal.SQLConf
    * .CODEGEN_FACTORY_MODE). */
  private def interpretedOnly[A](body: => A): A = {
    val keys = Seq("spark.sql.codegen.wholeStage" -> "false",
                   "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")
    val olds = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { keys.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("interpreted path (NO_CODEGEN) agrees with codegen") {
    val viaCodegen = cases.toDF("a", "b")
      .select(ArrayDot(col("a"), col("b"))).collect().map(_.toString)
    val interpreted = interpretedOnly {
      cases.toDF("a", "b")
        .select(ArrayDot(col("a"), col("b"))).collect().map(_.toString)
    }
    assert(interpreted === viaCodegen)
  }

  test("JaccardSim equals the composed intersect/union form, both eval paths") {
    val jcases = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a", "a", "b"), Seq("b", "b", "a")),      // duplicates collapse
      (Seq("x"), Seq("y")),                          // disjoint → 0.0
      (Seq("q", "r"), Seq("q", "r")),                // identical → 1.0
      (Seq.empty[String], Seq("z")))                 // empty side
    def composed = size(array_intersect(col("a"), col("b"))).cast("double") /
      size(array_union(col("a"), col("b")))
    val df = jcases.toDF("a", "b")
      .select(graft.functions.JaccardSim(col("a"), col("b")).as("fused"),
              composed.as("comp"))
    df.collect().foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
             java.lang.Double.doubleToRawLongBits(r.getDouble(1)), r.toString)
    }
    val interp = interpretedOnly {
      jcases.toDF("a", "b")
        .select(graft.functions.JaccardSim(col("a"), col("b"))).collect().map(_.getDouble(0))
    }
    val gen = df.collect().map(_.getDouble(0))
    assert(interp.toSeq === gen.toSeq)
  }

  test("JaccardSim: null element or null array → null, both eval paths") {
    // registered for arbitrary SQL callers, so the null-element corner
    // must be DEFINED (null result), not undefined behavior on the slot
    def run() = spark.sql(
      """SELECT jaccard_sim(a, b) FROM VALUES
        |  (array('a', cast(null as string)), array('a')),
        |  (array('a'), array(cast(null as string), 'a')),
        |  (cast(null as array<string>), array('a')),
        |  (array('a'), array('a'))
        |AS t(a, b)""".stripMargin).collect()
    val gen = run()
    assert(gen.map(_.isNullAt(0)).toSeq === Seq(true, true, true, false), gen.mkString)
    assert(gen.last.getDouble(0) === 1.0)
    val interp = interpretedOnly { run().map(_.isNullAt(0)) }
    assert(interp.toSeq === Seq(true, true, true, false))
  }

  test("generated code actually compiles — no silent interpreted fallback") {
    // janino failure normally falls back to interpreted execution and a
    // test would still pass; forbidding the fallback makes a codegen bug
    // in doGenCode / the static helper call a hard failure here
    val key = "spark.sql.codegen.fallback"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val row = cases.take(2).toDF("a", "b")
        .select(ArrayDot(col("a"), col("b")).as("d"),
                graft.functions.JaccardSim(
                  split(col("a").cast("string"), ","),
                  split(col("b").cast("string"), ",")).as("j"))
        .collect()
      assert(row.length === 2)
    } finally spark.conf.set(key, old)
  }

  test("knn hot path uses the fused expression, not zip_with") {
    val plan = ext.Similarity.knnBrute(spark, TestSpark.sfDir)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("array_dot"), plan)
    assert(!plan.toLowerCase.contains("zip_with"), plan)
  }

  test("BpeEncode merge memo: a DIFFERENT merge list on the same thread " +
       "never serves a stale parse (content guard, r17 advice)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(merges: String*) =
      new GenericArrayData(merges.map(UTF8String.fromString).toArray)
    def encode(text: String, m: org.apache.spark.sql.catalyst.util.ArrayData) =
      graft.functions.BpeEncode.compute(UTF8String.fromString(text), m)
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
    // same thread, three lists with DISTINCT identities and contents —
    // each call must use ITS list, not the memoized previous one
    assert(encode("abc", arr("a b")) == Seq("ab", "c"))
    assert(encode("abc", arr("b c")) == Seq("a", "bc"))
    assert(encode("abc", arr()) == Seq("a", "b", "c"))
    // identity hit path still works: the SAME instance twice
    val same = arr("a b", "ab c")
    assert(encode("abc", same) == Seq("abc"))
    assert(encode("abcabc", same) == Seq("abc", "abc"))
    // the hazard the guard exists for: a REUSED buffer whose contents
    // were rewritten in place must not serve the old parse
    val buf = new Array[AnyRef](1)
    buf(0) = UTF8String.fromString("a b")
    val mutable = new GenericArrayData(buf.asInstanceOf[Array[Any]])
    assert(encode("abc", mutable) == Seq("ab", "c"))
    buf(0) = UTF8String.fromString("b c") // in-place rewrite, same identity
    assert(encode("abc", mutable) == Seq("a", "bc"),
           "stale memo served after an in-place buffer rewrite")
  }
}
