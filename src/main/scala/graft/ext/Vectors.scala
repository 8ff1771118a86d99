package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Columnar vector math over ARRAY<DOUBLE> columns — built entirely from
  * codegen'd higher-order functions (`ZipWith`/`ArrayAggregate`), no UDFs.
  *
  * The fold is a strict left-to-right sum, which makes the result
  * reproducible AND bit-identical to the DuckDB oracle's `list_sum`
  * (verified empirically: sequential fold parity on the test embeddings).
  * A float-orderless SIMD dot product would be faster per row but not
  * hash-stable across engines; at 100 TB the per-row cost is still linear
  * and embarrassingly parallel, so determinism wins.
  */
object Vectors {

  /** ARRAY<FLOAT> → ARRAY<DOUBLE> (exact widening). */
  def asDouble(c: Column): Column = transform(c, x => x.cast(DoubleType))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, p) => s + p)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
}
