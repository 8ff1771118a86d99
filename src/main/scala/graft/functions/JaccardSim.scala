package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused Jaccard similarity over two ARRAY<STRING> columns — the verify-
  * stage analog of [[ArrayDot]].
  *
  * The composable form
  * `size(array_intersect(a,b)) / size(array_union(a,b))` MATERIALIZES
  * two result arrays (each a hash-set build plus an output copy) per
  * candidate pair when only their SIZES are wanted. This expression
  * computes both cardinalities in one pass over two hash sets — no
  * intermediate arrays — in a compiled helper the generated code calls
  * per row (the set loop itself stays JIT-compiled Scala; whole-stage
  * codegen spans are preserved).
  *
  * Values are exactly the composed form's: set semantics with
  * duplicates collapsed (|∩| over distinct elements,
  * |∪| = |distinct(a)| + |distinct(b)| − |∩|), double division — so the
  * DuckDB `list_intersect`/`list_distinct(a || b)` oracles still
  * hash-match. Null input → null; a null ELEMENT in either array also
  * yields null (the function is registered for arbitrary SQL callers via
  * `jaccard_sim`, so an undefined-behavior corner is not acceptable —
  * set semantics over a set containing null are ill-defined, and null,
  * not an exception, matches how Spark's collection functions degrade).
  * The engine's own shingle/gram arrays never contain null elements, so
  * the hot path never takes the branch.
  */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // result type inferred: AbstractDataType itself is private[sql]
  override def inputTypes = Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("jaccard")
      s"""java.lang.Double $r = graft.functions.JaccardSim.compute($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaccard_sim"
}

object JaccardSim {
  /** Column-API entry point (needs [[GraftExtensions]] on the session). */
  def apply(a: Column, b: Column): Column = call_function("jaccard_sim", a, b)

  /** |distinct(a) ∩ distinct(b)| / |distinct(a) ∪ distinct(b)| as Java
    * double division. Deliberate deviation on the empty∪empty corner:
    * this returns NaN where the composed `size(...)/size(...)` form
    * under ANSI mode (Spark 4 default) THROWS DIVIDE_BY_ZERO — a total
    * function beats a runtime error for a similarity measure (the
    * engine's shingle/gram pipelines never produce the corner anyway:
    * empty-set docs get null band keys and never become candidates).
    * Returns null (boxed) when either array contains a null element —
    * `getUTF8String` on a null slot is undefined behavior, not an error,
    * so the slot must be checked before the read. The box is the price
    * of a defined null path; the JIT elides it on the non-null hot path.
    * Called from generated code — must stay public and static-shaped. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val sa = new java.util.HashSet[UTF8String]()
    var i = 0
    val na = a.numElements()
    while (i < na) {
      if (a.isNullAt(i)) return null
      sa.add(a.getUTF8String(i)); i += 1
    }
    val sb = new java.util.HashSet[UTF8String]()
    var inter = 0
    var j = 0
    val nb = b.numElements()
    while (j < nb) {
      if (b.isNullAt(j)) return null
      val e = b.getUTF8String(j)
      if (sb.add(e) && sa.contains(e)) inter += 1
      j += 1
    }
    val union = sa.size + sb.size - inter
    java.lang.Double.valueOf(inter.toDouble / union)
  }
}
