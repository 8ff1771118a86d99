package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[ext.Card.corpusCard]]'s cross-consistency with the operators
  * whose statistics it aggregates. */
class CardSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("card cells partition the corpus and agree with the stage operators") {
    val cells = ext.Card.corpusCard(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
    assert(cells.map(_.getLong(2)).sum == docs.count())
    val toks = docs.select(sum(size(split(col("text"), " ")))).head.getLong(0)
    assert(cells.map(_.getLong(3)).sum == toks)
    cells.foreach { r =>
      // rate metrics live in [0, 1e6]; the fixed-point average is the
      // integer-scaled mean of the cell's token counts
      (5 to 7).foreach { i =>
        assert(r.getLong(i) >= 0 && r.getLong(i) <= 1000000L, r.toString)
      }
      assert(r.getLong(4) == r.getLong(3) * 1000000L / r.getLong(2), r.toString)
    }
    // weighted gopher pass rate re-aggregates to the corpus pass count
    val passTotal = ext.Text.gopherRules(spark, sfDir)
      .filter(col("pass") === 1).count()
    val passFromCells = cells.map { r =>
      // n_docs * ppm DIV 1e6 loses the remainder; reconstruct bounds
      (r.getLong(2), r.getLong(5))
    }
    val lo = passFromCells.map { case (n, p) => n * p / 1000000L }.sum
    val hi = passFromCells.map { case (n, p) => (n * (p + 1) + 999999L) / 1000000L }.sum
    assert(lo <= passTotal && passTotal <= hi,
      s"pass count $passTotal outside cell-implied [$lo, $hi]")
  }
}
