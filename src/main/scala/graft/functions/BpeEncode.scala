package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer APPLY: encode a space-separated text
  * under a learned merge list (Sennrich et al. 2016) — the production
  * artifact use of [[graft.ext.Bpe.trainBpe]]'s output: merges are
  * trained once on a reference corpus and then every document (seen or
  * unseen) encodes against the stored list, exactly like the
  * [[graft.ext.LangModel]] model-table split.
  *
  * `merges` is an ARRAY<STRING> of "left right" pairs in RANK order
  * (lowest rank = learned first). Encoding applies each merge in rank
  * order with ONE left-to-right non-overlapping pass over the word's
  * symbol sequence — equivalent to classic lowest-applicable-rank BPE
  * because a merge whose side contains a later-learned symbol cannot
  * have an earlier rank (a pair is only learnable after its parts
  * exist), so rank order is already topological. The per-word pass
  * also cannot cascade within a round: a merged symbol is strictly
  * longer than the pair's left side, so it never re-matches it.
  *
  * Per-row work is O(len · merges) with zero allocations beyond the
  * symbol buffers; the parsed merge list is memoized per thread keyed
  * on the array's identity (the same broadcast row rides every call).
  * Words are `split(' ')` pieces; empty pieces (leading/trailing/
  * double spaces) contribute no symbols. Null text or null merges →
  * null. Initial symbols are CODE POINTS, so multi-byte UTF-8 never
  * splits mid-character.
  */
case class BpeEncode(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType, ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(t: Any, m: Any): Any =
    BpeEncode.compute(t.asInstanceOf[UTF8String], m.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, m) => {
      val r = ctx.freshName("bpe")
      s"""org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.BpeEncode.compute($t, $m);
         |${ev.value} = $r;""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bpe_encode"
}

object BpeEncode {
  /** Column-API entry point (needs [[GraftExtensions]] on the session). */
  def apply(text: Column, merges: Column): Column =
    call_function("bpe_encode", text, merges)

  /** Parsed merge list memo: the merges array is one broadcast value
    * riding every row of a partition, so parse it once per thread and
    * re-parse only when a DIFFERENT array instance shows up. Identity
    * alone is not a safe key — an engine is free to reuse a mutable
    * ArrayData buffer across rows — so the hit is also guarded by a
    * FULL content compare against a snapshot of every element. Merge
    * lists are small (hundreds of short strings) and the compare is a
    * byte-equality loop, far cheaper than re-splitting, so the memo
    * still pays while no in-place rewrite — head, tail, or MIDDLE —
    * can serve a stale parse. */
  private val memo =
    new ThreadLocal[(ArrayData, Array[UTF8String], Array[Array[String]])]

  private def sameContent(snapshot: Array[UTF8String], m: ArrayData, n: Int): Boolean = {
    if (snapshot.length != n) return false
    var j = 0
    while (j < n) {
      if (snapshot(j) != m.getUTF8String(j)) return false
      j += 1
    }
    true
  }

  private def parsed(m: ArrayData): Array[Array[String]] = {
    val n = m.numElements()
    val hit = memo.get()
    if (hit != null && (hit._1 eq m) && sameContent(hit._2, m, n)) return hit._3
    val out = new Array[Array[String]](n)
    // snapshot every element's contents NOW: a UTF8String from
    // getUTF8String may view the (possibly reused) underlying buffer —
    // the very hazard the guard exists to detect
    val snapshot = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      snapshot(i) = m.getUTF8String(i).clone()
      val s = snapshot(i).toString
      val sp = s.indexOf(' ')
      // a malformed row ("no space") merges nothing rather than throwing
      out(i) =
        if (sp < 0) Array(s, "\u0000unmatchable")
        else Array(s.substring(0, sp), s.substring(sp + 1))
      i += 1
    }
    memo.set((m, snapshot, out))
    out
  }

  /** Called from generated code — public and static-shaped. */
  def compute(t: UTF8String, m: ArrayData): ArrayData = {
    val merges = parsed(m)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val text = t.toString
    var wStart = 0
    val L = text.length
    var i = 0
    while (i <= L) {
      if (i == L || text.charAt(i) == ' ') {
        if (i > wStart) encodeWord(text, wStart, i, merges, out)
        wStart = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  private def encodeWord(text: String, from: Int, until: Int,
                         merges: Array[Array[String]],
                         out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
    // initial symbols: code points
    var syms = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = from
    while (i < until) {
      val cp = text.codePointAt(i)
      val w = Character.charCount(cp)
      syms += text.substring(i, i + w)
      i += w
    }
    // rank-order merges, one left-to-right non-overlapping pass each
    var k = 0
    while (k < merges.length && syms.length > 1) {
      val a = merges(k)(0); val b = merges(k)(1)
      val next = scala.collection.mutable.ArrayBuffer.empty[String]
      var j = 0
      while (j < syms.length) {
        if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
          next += (a + b); j += 2
        } else { next += syms(j); j += 1 }
      }
      syms = next
      k += 1
    }
    syms.foreach(s => out += UTF8String.fromString(s))
  }
}
