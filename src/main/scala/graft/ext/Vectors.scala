package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Columnar vector math over ARRAY<DOUBLE> columns — no UDFs.
  *
  * The dot product is [[graft.functions.ArrayDot]], a native Catalyst
  * expression whose generated loop multiply-accumulates with NO
  * intermediate products array (the `aggregate(zip_with(...))` HOF form
  * it replaced allocates one per evaluation — per candidate pair on the
  * ANN hot path). Accumulation is a strict left-to-right sum, which makes
  * the result reproducible AND bit-identical to the DuckDB oracle's
  * `list_sum(list_zip(...))` (verified empirically: sequential fold
  * parity on the test embeddings, pinned by FunctionsSpec). A
  * float-orderless SIMD dot product would be faster per row but not
  * hash-stable across engines; the per-row cost is linear and
  * embarrassingly parallel, so determinism wins.
  */
object Vectors {

  /** ARRAY<FLOAT> → ARRAY<DOUBLE> (exact widening). */
  def asDouble(c: Column): Column = transform(c, x => x.cast(DoubleType))

  def dot(a: Column, b: Column): Column = graft.functions.ArrayDot(a, b)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
}
