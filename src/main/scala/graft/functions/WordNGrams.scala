package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct space-separated word n-gram set over a STRING, first-
  * occurrence order — the shingle granularity of the MinHash/LSH family
  * and decontamination ([[graft.ext.Dedup.shingleSets]]) as ONE
  * codegen'd pass over the text.
  *
  * Exactly the composed form's values (`split(text, " ")` →
  * `transform(sequence(…), i => concat_ws(" ", t[i], …, t[i+n−1]))` →
  * `array_distinct`), by the reconstruction identity: joining n
  * CONSECUTIVE split-pieces with the single-char separator reproduces
  * the original byte span between the start of piece i and the end of
  * piece i+n−1 — consecutive/leading/trailing spaces included (empty
  * pieces rebuild their runs). So the expression never tokenizes at
  * all: it records the byte offset after every 0x20 (an ASCII byte can
  * never occur inside a UTF-8 multi-byte sequence), and each gram is a
  * slice sharing the input's byte array. The composed chain paid a
  * token-array materialization plus an interpreted HOF concat loop per
  * row (CodegenFallback, SURVEY §4); this is one walk and zero copies
  * until the output array build.
  *
  * Fewer than n pieces → the EMPTY array (the composed form's
  * `otherwise` branch and the oracle's `ELSE []` — short docs must keep
  * empty shingle sets so their LSH bands stay NULL, ShortDocSpec).
  * Null text → null; non-positive n → null ([[JaccardSim]]'s
  * total-function corner policy).
  */
case class WordNGrams(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(t: Any, n: Any): Any =
    WordNGrams.compute(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) => {
      val r = ctx.freshName("shingles")
      s"""org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.WordNGrams.compute($t, $n);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "word_ngrams"
}

object WordNGrams {
  /** Column-API entry point (needs [[GraftExtensions]] on the session). */
  def apply(text: Column, n: Column): Column =
    call_function("word_ngrams", text, n)

  /** One pass: piece-start byte offsets (0 and after every space), then
    * gram slices sharing the input bytes. `starts(count)` is a virtual
    * past-end separator so the last gram's length needs no special
    * case. Called from generated code — public and static-shaped. */
  def compute(t: UTF8String, n: Int): ArrayData = {
    if (n <= 0) return null
    val bytes = t.getBytes
    val nb = bytes.length
    var spaces = 0
    var i = 0
    while (i < nb) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val count = spaces + 1 // split(-1) semantics: trailing empties kept
    if (count < n) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](count + 1)
    var c = 1
    i = 0
    while (i < nb) {
      if (bytes(i) == ' ') { starts(c) = i + 1; c += 1 }
      i += 1
    }
    starts(count) = nb + 1
    val seen = new java.util.LinkedHashSet[UTF8String]
    var k = 0
    while (k + n <= count) {
      seen.add(UTF8String.fromBytes(bytes, starts(k),
        starts(k + n) - 1 - starts(k)))
      k += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size)))
  }
}
