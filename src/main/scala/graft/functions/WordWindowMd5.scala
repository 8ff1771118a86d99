package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Positional md5 digests of every stride-1 width-`w` word window over a
  * STRING — the hot path of [[graft.ext.Curation.substrDupSpans]]
  * (ExactSubstr-style duplicated-span detection) as ONE codegen'd walk.
  *
  * Exactly the composed form's values (`split(text, " ")` →
  * `transform(sequence(0, count − w), i => md5(concat_ws(" ",
  * slice(t, i+1, w))))`), by the same reconstruction identity
  * [[WordNGrams]] uses: joining w CONSECUTIVE split-pieces with the
  * single-char separator reproduces the original byte span between the
  * start of piece i and the end of piece i+w−1, consecutive/leading/
  * trailing spaces included. So each window's MD5 is computed straight
  * off the input's byte array — no token array, no per-window
  * UTF8String concat, no intermediate gram string; the only per-window
  * allocation is the 32-byte hex digest the operator needs anyway.
  * Output index = window start position, the positional contract the
  * span merge depends on (unlike [[WordNGrams]]' first-occurrence SET).
  *
  * Fewer than w pieces → the EMPTY array (posexplode then drops the
  * row — short docs can have no duplicated window). Null text → null;
  * non-positive w → null ([[JaccardSim]]'s total-function corner
  * policy). Digest parity: MD5 over UTF-8 bytes, lowercase hex —
  * bit-identical to Spark's `md5()` and DuckDB's `md5()`, so the
  * DuckDB oracle states the composed form and hash-matches.
  */
case class WordWindowMd5(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(t: Any, w: Any): Any =
    WordWindowMd5.compute(t.asInstanceOf[UTF8String], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, w) => {
      val r = ctx.freshName("digests")
      s"""org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.WordWindowMd5.compute($t, $w);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "word_window_md5"
}

object WordWindowMd5 {
  /** Column-API entry point (needs [[GraftExtensions]] on the session). */
  def apply(text: Column, w: Column): Column =
    call_function("word_window_md5", text, w)

  private val HexDigits = "0123456789abcdef".getBytes

  /** One pass: piece-start byte offsets (0 and after every space), then
    * MD5 per window straight off the shared input bytes. `starts(count)`
    * is a virtual past-end separator so the last window's length needs
    * no special case. Called from generated code. */
  def compute(t: UTF8String, w: Int): ArrayData = {
    if (w <= 0) return null
    val bytes = t.getBytes
    val nb = bytes.length
    var spaces = 0
    var i = 0
    while (i < nb) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val count = spaces + 1 // split(-1) semantics: trailing empties kept
    if (count < w) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](count + 1)
    var c = 1
    i = 0
    while (i < nb) {
      if (bytes(i) == ' ') { starts(c) = i + 1; c += 1 }
      i += 1
    }
    starts(count) = nb + 1
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[AnyRef](count - w + 1)
    var k = 0
    while (k + w <= count) {
      md.reset()
      md.update(bytes, starts(k), starts(k + w) - 1 - starts(k))
      val d = md.digest()
      val hex = new Array[Byte](32)
      var j = 0
      while (j < 16) {
        hex(2 * j) = HexDigits((d(j) >> 4) & 0xf)
        hex(2 * j + 1) = HexDigits(d(j) & 0xf)
        j += 1
      }
      out(k) = UTF8String.fromBytes(hex)
      k += 1
    }
    new GenericArrayData(out)
  }
}
