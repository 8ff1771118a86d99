package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}

/** Fixed-point binary logarithm: `floor-ish(log2(c) · 2^16)` computed
  * with INTEGER arithmetic only — normalize the argument's mantissa to
  * 31 bits, then extract 16 fractional bits by repeated squaring (each
  * step squares the mantissa and tests whether it crossed 2). The point
  * is CROSS-ENGINE BIT PARITY, the [[graft.ext.Classifier]] fixed-point
  * discipline applied to the logarithm: `ln`/`log2` are transcendental
  * (not IEEE-exact, so two engines' libm may differ in the last ulp and
  * flip a comparison), but shifts, multiplies and compares of 64-bit
  * integers are exact everywhere — the DuckDB oracle replays the same
  * 16 steps as a `list_reduce` over bit-packed state and lands on the
  * same BIGINT. [[graft.ext.Unigram]] builds its piece costs
  * (−log p, scaled) from this, so Viterbi segmentation compares exact
  * integers and the tokenizer gates can hash-match.
  *
  * Accuracy is ~2^-16 relative plus the mantissa truncation (arguments
  * above 2^31 drop low bits) — irrelevant for a tokenizer cost, where
  * only the deterministic ORDER of sums matters. Null or non-positive
  * input → null.
  */
case class ILog2Fp(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(c: Any): Any = {
    val v = c.asInstanceOf[Long]
    if (v <= 0L) null else ILog2Fp.compute(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""if ($c <= 0L) { ${ev.isNull} = true; }
         |else { ${ev.value} = graft.functions.ILog2Fp.compute($c); }""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "ilog2_fp"
}

object ILog2Fp {
  /** Column-API entry point (needs [[GraftExtensions]] on the session). */
  def apply(c: Column): Column = call_function("ilog2_fp", c)

  /** Called from generated code; requires c ≥ 1. The DuckDB replay of
    * this exact loop lives in [[graft.ext.Unigram.ilogSql]]. */
  def compute(c: Long): Long = {
    val e = 63 - java.lang.Long.numberOfLeadingZeros(c)
    // mantissa in [2^30, 2^31): truncating normalization (drops low
    // bits of arguments wider than 31 bits — same truncation both
    // engines)
    var m = if (e > 30) c >> (e - 30) else c << (30 - e)
    var y = e.toLong
    var i = 0
    while (i < 16) {
      // square ∈ [2^60, 2^62) — no 64-bit overflow; renormalize and
      // emit one fractional bit per step
      val m2 = (m * m) >> 30
      if (m2 >= (1L << 31)) { m = m2 >> 1; y = y * 2 + 1 }
      else { m = m2; y = y * 2 }
      i += 1
    }
    y
  }
}
