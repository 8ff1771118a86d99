package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the ScaleUp fixture generator's r14-ADVICE guards — the pieces a
  * malformed source directory would otherwise turn into a silent skew or
  * an opaque NPE in the middle of a multi-table write:
  *
  *  - [[ScaleUp.span]] sizes a key as max+1, widens INT key columns, and
  *    fails LOUDLY (message naming the key and source dir) when the
  *    column has no non-null values;
  *  - [[ScaleUp.rot]] is a true rotation with period |s| — the property
  *    the factor ≤ 26 / factor ≤ dim degeneracy guards rely on (copy c
  *    and copy c+period would share a vocabulary and collapse the LSH
  *    bucket structure the probe exists to measure).
  */
class ScaleUpSpec extends AnyFunSuite {
  import TestSpark.spark

  test("span sizes a BIGINT key as max+1") {
    import spark.implicits._
    assert(ScaleUp.span(Seq(3L, 7L, 1L).toDF("k"), "k", "t") === 8L)
  }

  test("span widens an INT key column") {
    import spark.implicits._
    assert(ScaleUp.span(Seq(4, 2).toDF("k"), "k", "t") === 5L)
  }

  test("span fails loudly, naming key and source, on an all-null column") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      ScaleUp.span(Seq[Option[Long]](None, None).toDF("k"), "k", "/some/src")
    }
    assert(e.getMessage.contains("k has no non-null values"))
    assert(e.getMessage.contains("/some/src"))
  }

  test("rot has period |s| and composes additively") {
    val s = "abcdefghijklmnopqrstuvwxyz"
    assert(ScaleUp.rot(s, 0) === s)
    assert(ScaleUp.rot(s, s.length) === s) // the degeneracy the guard blocks
    assert(ScaleUp.rot(s, 1) === "bcdefghijklmnopqrstuvwxyza")
    assert(ScaleUp.rot(ScaleUp.rot(s, 7), 19) === s) // 7 + 19 = 26
    assert(ScaleUp.rot(s, -1) === ScaleUp.rot(s, 25)) // negative k normalized
    // distinct copies get distinct alphabets for every c in the guard range
    val alphabets = (0 until 26).map(c => ScaleUp.rot(s, c)).toSet
    assert(alphabets.size === 26)
  }
}
