package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** The signed-Hadamard rotation R·v of [[graft.ext.Opq]] as ONE native
  * expression — ARRAY<DOUBLE>(64) in, ARRAY<DOUBLE>(64) out.
  *
  * Why an expression and not 64 composed [[ArrayDot]]s: the composed
  * spelling (array() of 64 dots against literal rows) stays inside
  * whole-stage codegen but generates a 14 KB method —
  * maxMethodCodeSize 14315, measured — which is past HotSpot's 8000-
  * byte JIT ceiling, so the hot projection ran in the BYTECODE
  * INTERPRETER at ~0.3 ms/row (~100× the arithmetic's cost; the 10×
  * probe read 2.35× against knn_pq's 1.19× purely from this). Here
  * the generated code is a single static call into [[compute]], a
  * ~30-line JIT-friendly loop.
  *
  * Arithmetic is EXACTLY the composed form's, so the gate hashes are
  * unchanged and the DuckDB oracle (64 list_dot_product literals ×
  * 0.125) still matches bit-for-bit: per output dim, products
  * v[j]·(±1) accumulate LEFT TO RIGHT, then one exact power-of-two
  * scale (×0.125). A null element or a non-64-length input yields
  * NULL (the dot's own propagation, lifted to the whole vector).
  */
case class HadamardRotate(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    HadamardRotate.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("rot")
      s"""org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.HadamardRotate.compute($v);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "hadamard_rotate"
}

object HadamardRotate {

  /** Order of the transform = the synthetic embeddings' dimensionality
    * (the Hadamard closed form needs a power of two). */
  val Dim = 64

  /** ±1 sign row i of H·D: entry j is (−1)^popcount(i AND j) · σ(j),
    * σ a fixed Fibonacci-hash parity — the deterministic stand-in for
    * the random sign diagonal. Source of truth for BOTH the engine
    * loop ([[signs]]) and the oracle literals ([[graft.ext.Opq]]). */
  def signRow(i: Int): Array[Double] =
    Array.tabulate(Dim) { j =>
      val h = if (java.lang.Integer.bitCount(i & j) % 2 == 0) 1.0 else -1.0
      val s = if (java.lang.Integer.bitCount(j * 0x9E3779B1) % 2 == 0) 1.0
              else -1.0
      h * s
    }

  /** Row-major flattened sign matrix, built once per JVM. */
  private val signs: Array[Double] =
    Array.tabulate(Dim * Dim)(k => signRow(k / Dim)(k % Dim)).map(identity)

  /** Called from generated code — public and static-shaped. Returns
    * null for non-64-length or null-element inputs. */
  def compute(v: ArrayData): ArrayData = {
    if (v.numElements() != Dim) return null
    val x = new Array[Double](Dim)
    var j = 0
    while (j < Dim) {
      if (v.isNullAt(j)) return null
      x(j) = v.getDouble(j)
      j += 1
    }
    val out = new Array[Double](Dim)
    var i = 0
    while (i < Dim) {
      var s = 0.0
      val base = i * Dim
      var k = 0
      while (k < Dim) {
        s += x(k) * signs(base + k)
        k += 1
      }
      out(i) = s * 0.125
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point (needs [[GraftExtensions]] on the session). */
  def apply(v: Column): Column = call_function("hadamard_rotate", v)
}
