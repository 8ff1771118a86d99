package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM tokenizer APPLY (Kudo 2018, the SentencePiece unigram
  * model): Viterbi-segment every space-separated word of `text` under a
  * piece table — the production artifact use of
  * [[graft.ext.Unigram]]'s trainer, exactly [[BpeEncode]]'s contract
  * for the OTHER canonical subword tokenizer.
  *
  * `pieces` is an ARRAY<STRING> and `costs` the aligned ARRAY<BIGINT>
  * of integer piece costs (−log2 p(piece) in 2^16 fixed point, from
  * [[ILog2Fp]] — INTEGER so two engines' Viterbi compare exactly; see
  * [[graft.ext.Unigram]] for why floats can't gate). Per word the DP
  * minimizes, in priority order: total cost (exact BIGINT sum), then
  * piece count, then the lexicographically smallest piece sequence —
  * realized by scanning candidate first-piece lengths SHORTEST-FIRST
  * over a suffix DP (a shorter first piece is a proper prefix of any
  * longer one, so it is lexicographically smaller, and array order is
  * decided at the first differing element). The oracle states the same
  * rule as `ORDER BY cost, n_pieces, pieces` over an exhaustive
  * segmentation enumeration — integer costs make the two provably
  * agree.
  *
  * A character absent from the piece table segments as itself at
  * [[UnigramEncode.OovCost]] (the fallback-alphabet rule: encoding is
  * total, out-of-vocabulary text degrades to code points instead of
  * failing — the frozen-artifact apply path depends on this). Pieces
  * are CODE-POINT substrings, so multi-byte UTF-8 never splits
  * mid-character. Null text or null tables → null. Per-row work is
  * O(len · maxPieceLen) with the parsed table memoized per thread the
  * same snapshot-guarded way as [[BpeEncode]].
  */
case class UnigramEncode(first: Expression, second: Expression,
                         third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType, ArrayType(StringType), ArrayType(LongType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(t: Any, p: Any, c: Any): Any =
    UnigramEncode.compute(t.asInstanceOf[UTF8String],
      p.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, p, c) => {
      val r = ctx.freshName("uni")
      s"""org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.UnigramEncode.compute($t, $p, $c);
         |${ev.value} = $r;""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "unigram_encode"
}

object UnigramEncode {
  /** Column-API entry point (needs [[GraftExtensions]] on the session). */
  def apply(text: Column, pieces: Column, costs: Column): Column =
    call_function("unigram_encode", text, pieces, costs)

  /** Cost charged to a single out-of-vocabulary character — far above
    * any trained piece cost (a trained cost is ≤ log2(total)·2^16 ≈
    * 62·65536 < 2^23), so the DP only falls back where no trained
    * segmentation exists at all. Mirrored verbatim in the oracle. */
  val OovCost: Long = 1L << 40

  private final class Table(val costs: java.util.HashMap[String, java.lang.Long],
                            val maxLen: Int,
                            val piecesSnap: Array[UTF8String],
                            val costsSnap: Array[Long])

  /** Parsed piece-table memo, [[BpeEncode]]'s snapshot-guard discipline:
    * the arrays are one broadcast value riding every row, but identity
    * alone can't key the memo (an engine may reuse a mutable ArrayData
    * buffer), so hits are verified against full content snapshots. */
  private val memo = new ThreadLocal[(ArrayData, ArrayData, Table)]

  private def sameContent(t: Table, p: ArrayData, c: ArrayData): Boolean = {
    val n = p.numElements()
    if (t.piecesSnap.length != n || c.numElements() != n) return false
    var i = 0
    while (i < n) {
      if (t.piecesSnap(i) != p.getUTF8String(i) ||
          t.costsSnap(i) != c.getLong(i)) return false
      i += 1
    }
    true
  }

  private def parsed(p: ArrayData, c: ArrayData): Table = {
    val hit = memo.get()
    if (hit != null && (hit._1 eq p) && (hit._2 eq c) &&
        sameContent(hit._3, p, c)) return hit._3
    val n = math.min(p.numElements(), c.numElements())
    // boxed values: j.u.HashMap#get must return null (not a silently
    // unboxed 0) for an absent piece
    val map = new java.util.HashMap[String, java.lang.Long](n * 2)
    val ps = new Array[UTF8String](n)
    val cs = new Array[Long](n)
    var maxLen = 1
    var i = 0
    while (i < n) {
      ps(i) = p.getUTF8String(i).clone()
      cs(i) = c.getLong(i)
      val s = ps(i).toString
      map.put(s, cs(i))
      val cp = s.codePointCount(0, s.length)
      if (cp > maxLen) maxLen = cp
      i += 1
    }
    val t = new Table(map, maxLen, ps, cs)
    memo.set((p, c, t))
    t
  }

  /** Called from generated code — splits on spaces, Viterbi per word. */
  def compute(t: UTF8String, p: ArrayData, c: ArrayData): ArrayData = {
    val table = parsed(p, c)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val text = t.toString
    var wStart = 0
    val L = text.length
    var i = 0
    while (i <= L) {
      if (i == L || text.charAt(i) == ' ') {
        if (i > wStart) encodeWord(text, wStart, i, table, out)
        wStart = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  private def encodeWord(text: String, from: Int, until: Int, table: Table,
                         out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
    // code-point offsets within [from, until)
    var count = 0
    var i = from
    while (i < until) { i += Character.charCount(text.codePointAt(i)); count += 1 }
    val offs = new Array[Int](count + 1)
    var ci = 0
    i = from
    while (i < until) {
      offs(ci) = i; i += Character.charCount(text.codePointAt(i)); ci += 1
    }
    offs(count) = until
    // suffix DP: cost/np/next per code-point position; position `count`
    // is the empty suffix. Candidates scanned SHORTEST FIRST so the
    // first strict improvement wins ties — the lexicographic rule.
    val cost = new Array[Long](count + 1)
    val np = new Array[Int](count + 1)
    val nxt = new Array[Int](count + 1)
    var pos = count - 1
    while (pos >= 0) {
      var bc = Long.MaxValue
      var bn = Int.MaxValue
      var bj = -1
      val jMax = math.min(count, pos + table.maxLen)
      var j = pos + 1
      while (j <= jMax) {
        val piece = text.substring(offs(pos), offs(j))
        val stored = table.costs.get(piece)
        val pc: Long =
          if (stored != null) stored.longValue()
          else if (j == pos + 1) OovCost
          else -1L
        if (pc >= 0L) {
          val cc = pc + cost(j)
          val cn = 1 + np(j)
          if (cc < bc || (cc == bc && cn < bn)) { bc = cc; bn = cn; bj = j }
        }
        j += 1
      }
      cost(pos) = bc; np(pos) = bn; nxt(pos) = bj
      pos -= 1
    }
    var at = 0
    while (at < count) {
      val j = nxt(at)
      out += UTF8String.fromString(text.substring(offs(at), offs(j)))
      at = j
    }
  }
}
