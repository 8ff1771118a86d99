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
  * hash-match. Null input → null; null ELEMENTS are not handled (the
  * engine's shingle/gram arrays never contain them) and would differ
  * from array_intersect's null semantics — documented limitation.
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
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaccardSim.compute($a, $b);")

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
    * Called from generated code — must stay public and static-shaped. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val sa = new java.util.HashSet[UTF8String]()
    var i = 0
    val na = a.numElements()
    while (i < na) { sa.add(a.getUTF8String(i)); i += 1 }
    val sb = new java.util.HashSet[UTF8String]()
    var inter = 0
    var j = 0
    val nb = b.numElements()
    while (j < nb) {
      val e = b.getUTF8String(j)
      if (sb.add(e) && sa.contains(e)) inter += 1
      j += 1
    }
    val union = sa.size + sb.size - inter
    inter.toDouble / union
  }
}
