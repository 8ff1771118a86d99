package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.Present.PresentOps

/** Edit-distance record linkage WITHOUT a quadratic candidate space —
  * the fuzzy self-join a cleaning pipeline runs to reconcile
  * near-identical entity names (typos, OCR slips, vendor spelling
  * drift).
  *
  * Candidate generation is deletion-neighborhood blocking (the
  * FastSS / symmetric-delete family): every string emits itself plus
  * each single-character deletion; two strings at Levenshtein
  * distance ≤ 1 are GUARANTEED to share a variant (a substitution
  * meets at the string with the edited position deleted from both; an
  * insertion meets at the shorter string itself), so an EQUI-join on
  * the variant is an exact-safe blocker — never a cartesian, never a
  * length-band range join. False candidates are removed by the
  * codegen'd built-in `levenshtein` on the pair; distinct input names
  * make distance-0 impossible, so the verify pins distance = 1.
  *
  * Scale shape at 100 TB: the variant table is O(total name chars) —
  * a linear per-row explode (array_distinct BEFORE the explode folds
  * duplicate variants per name, e.g. deleting either char of a double
  * letter). The self-join shuffles variants by content; verification
  * touches only candidate pairs, which edit-distance blocking keeps
  * near-linear for natural-language keys. Hot variants (very short
  * strings whose neighborhoods collide broadly) are the skew risk —
  * the standard mitigation is a minimum-length gate or AQE skew
  * split; the names here are two-word phrases, comfortably past it.
  * Deeper tolerance (k = 2) is the same shape with k-deletion
  * neighborhoods (O(len²) variants/name) — the cost grows in the
  * emit width, never back toward all-pairs.
  */
object FuzzyJoin {

  /** All distinct part-name pairs at Levenshtein distance exactly 1. */
  def fuzzyNamePairs(spark: SparkSession, dir: String): DataFrame = {
    val names = Tables.part(spark, dir).select(col("p_name").as("name")).distinct()
    // i = 0 keeps the string itself; i = 1..len deletes char i (1-based).
    val variants = names.select(
      col("name"),
      explode(array_distinct(expr(
        """transform(sequence(0, length(name)), i ->
          |  CASE WHEN i = 0 THEN name
          |       ELSE concat(substring(name, 1, i - 1),
          |                   substring(name, i + 1, length(name)))
          |  END)""".stripMargin))).as("variant"))
    val a = variants.select(col("name").as("name_a"), col("variant"))
    val b = variants.select(col("name").as("name_b"), col("variant"))
    a.join(b, "variant")
      .filter(col("name_a") < col("name_b"))
      .select(col("name_a"), col("name_b"))
      .distinct()                     // pairs sharing several variants
      .filter(levenshtein(col("name_a"), col("name_b")) === 1)
      .presentSorted(col("name_a"), col("name_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fuzzy_name_pairs" -> fuzzyNamePairs _)

  val oracles: Map[String, String] = Map(
    // The oracle is the semantic definition: exhaustive pairs. The
    // engine must reproduce it exactly from the blocked plan.
    "fuzzy_name_pairs" ->
      """WITH n AS (SELECT DISTINCT p_name AS name FROM part)
        |SELECT a.name AS name_a, b.name AS name_b
        |FROM n a JOIN n b ON a.name < b.name
        |WHERE levenshtein(a.name, b.name) = 1
        |ORDER BY name_a, name_b""".stripMargin)
}
