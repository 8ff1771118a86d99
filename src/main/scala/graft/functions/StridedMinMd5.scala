package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Minimum md5 over width-`w` stride-`s` CHARACTER windows of a STRING —
  * [[graft.ext.Text.fingerprint]]'s strided min-hash as ONE walk that
  * never materializes a window row.
  *
  * Exactly the exploded form's value (`explode(sequence(1,
  * greatest(length(text) − w + 1, 1), s))` → `min(md5(substr(text, i,
  * w)))`): positions are 1-based code-point indices, the final window
  * clamps at the text end (a text shorter than `w` fingerprints as one
  * whole-text window — md5 of "" included, matching `substr`'s clamp
  * semantics), and hex strings compare exactly like their digest bytes
  * (lowercase hex is order-preserving byte-wise), so the min is taken
  * over raw 16-byte digests and only the winner is hex-encoded. What
  * the fusion removes at 100 TB: the per-position generator rows
  * (~len/s per doc), the per-window substr allocation, ~len/s hex
  * encodes per doc, and the aggregation itself — the fingerprint
  * becomes a pure per-row projection, so the operator needs NO exchange
  * at all (the exploded form needed hash-partitioned input to keep its
  * groupBy exchange-free).
  *
  * Null text → null; non-positive w or s → null ([[JaccardSim]]'s
  * total-function corner policy). Digest parity: MD5 over UTF-8 bytes,
  * lowercase hex — bit-identical to Spark's `md5()` and DuckDB's
  * `md5(substr(...))` chain, so the oracle states the exploded form.
  */
case class StridedMinMd5(first: Expression, second: Expression,
                         third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType, IntegerType, IntegerType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(t: Any, w: Any, s: Any): Any =
    StridedMinMd5.compute(t.asInstanceOf[UTF8String],
      w.asInstanceOf[Int], s.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, w, s) => {
      val r = ctx.freshName("fp")
      s"""org.apache.spark.unsafe.types.UTF8String $r =
         |  graft.functions.StridedMinMd5.compute($t, $w, $s);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "strided_min_md5"
}

object StridedMinMd5 {
  /** Column-API entry point (needs [[GraftExtensions]] on the session). */
  def apply(text: Column, w: Column, s: Column): Column =
    call_function("strided_min_md5", text, w, s)

  private val HexDigits = "0123456789abcdef".getBytes

  /** One pass: code-point start offsets, then MD5 per strided window
    * straight off the shared input bytes, keeping the byte-wise minimum
    * digest. Called from generated code. */
  def compute(t: UTF8String, w: Int, s: Int): UTF8String = {
    if (w <= 0 || s <= 0) return null
    val bytes = t.getBytes
    val nb = bytes.length
    var count = 0
    var i = 0
    while (i < nb) {
      i += UTF8String.numBytesForFirstByte(bytes(i))
      count += 1
    }
    val offs = new Array[Int](count + 1)
    var c = 0
    i = 0
    while (i < nb) {
      offs(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    offs(count) = nb
    // last window start (1-based): clamped below at 1 so a short text
    // still yields exactly one (whole-text) window
    val lastStart = math.max(count - (w - 1), 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    var best: Array[Byte] = null
    var p = 1
    while (p <= lastStart) {
      val from = offs(p - 1)
      val until = offs(math.min(p - 1 + w, count))
      md.reset()
      md.update(bytes, from, until - from)
      val d = md.digest()
      if (best == null || {
            var j = 0
            var cmp = 0
            while (j < 16 && cmp == 0) {
              cmp = (d(j) & 0xff) - (best(j) & 0xff); j += 1
            }
            cmp < 0
          }) best = d
      p += s
    }
    val hex = new Array[Byte](32)
    var j = 0
    while (j < 16) {
      hex(2 * j) = HexDigits((best(j) >> 4) & 0xf)
      hex(2 * j + 1) = HexDigits(best(j) & 0xf)
      j += 1
    }
    UTF8String.fromBytes(hex)
  }
}
