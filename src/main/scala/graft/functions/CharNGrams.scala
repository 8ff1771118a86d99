package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct character n-gram set over a STRING, first-occurrence order —
  * the candidate-verify granularity of [[graft.ext.Dedup.dedupNgramJaccard]]
  * as ONE codegen'd pass over the text.
  *
  * The composable form (`split(text, "")` → `transform(sequence(…), i =>
  * concat(element_at…))` → `array_distinct`) pays three materializations
  * per row — a per-CHARACTER array, a gram array, and the distinct copy —
  * and the transform/concat loop itself runs interpreted (Spark HOFs are
  * CodegenFallback, SURVEY §4). This expression walks the UTF-8 bytes
  * once, records code-point starts, and emits gram slices that SHARE the
  * input's byte array (zero copies until the output array build);
  * measured ~3× on the gram stage at sf0.1.
  *
  * Semantics:
  *  - grams are over CODE POINTS (one multi-byte character is one
  *    position) — the same definition SQL `substr` uses in Spark and
  *    DuckDB, so the gate's `substr(text, i, 3)` oracle agrees. (The
  *    composed `split(text, "")` form splits UTF-16 surrogate pairs of
  *    astral-plane characters in half; this expression deliberately
  *    follows substr, which treats them as one character. Identical on
  *    BMP text — the corpus and every gram oracle.)
  *  - distinct, first-occurrence order — `array_distinct`'s contract,
  *    so composed-form consumers can swap without re-sorting;
  *  - fewer than n characters → the single-element array [text]
  *    (matches the composed form's concat_ws fallback and the oracle's
  *    `ELSE [text]` branch);
  *  - null text → null; non-positive n → null (total function for
  *    arbitrary SQL callers, like [[JaccardSim]]'s corner policy).
  */
case class CharNGrams(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(t: Any, n: Any): Any =
    CharNGrams.compute(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) => {
      val r = ctx.freshName("grams")
      s"""org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.CharNGrams.compute($t, $n);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "char_ngrams"
}

object CharNGrams {
  /** Column-API entry point (needs [[GraftExtensions]] on the session). */
  def apply(text: Column, n: Column): Column =
    call_function("char_ngrams", text, n)

  /** One pass: code-point start offsets, then gram slices sharing the
    * input bytes; LinkedHashSet preserves first-occurrence order. Called
    * from generated code — must stay public and static-shaped. */
  def compute(t: UTF8String, n: Int): ArrayData = {
    if (n <= 0) return null
    val bytes = t.getBytes
    val nb = bytes.length
    var count = 0
    var i = 0
    while (i < nb) {
      i += UTF8String.numBytesForFirstByte(bytes(i))
      count += 1
    }
    if (count < n) return new GenericArrayData(Array[Any](t))
    val offs = new Array[Int](count + 1)
    var c = 0
    i = 0
    while (i < nb) {
      offs(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    offs(count) = nb
    val seen = new java.util.LinkedHashSet[UTF8String]
    var k = 0
    while (k + n <= count) {
      seen.add(UTF8String.fromBytes(bytes, offs(k), offs(k + n) - offs(k)))
      k += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size)))
  }
}
