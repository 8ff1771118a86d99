package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[ext.Scoring]]'s model-seam contract — the properties the
  * DuckDB gate can't see: the executable partition path must agree with
  * the column path bit-for-bit, and the seam must batch per PARTITION
  * (one model load per partition, never per row — the whole point of
  * the iterator contract a fasttext/ONNX handle plugs into). */
class ScoringSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("partition-scored path agrees bit-for-bit with the column path") {
    val docs = Tables.documents(spark, sfDir)
    val seam = ext.Scoring.scorePartitions(docs)
      .toDF("doc_id", "score_seam")
    val col_ = ext.Scoring.qualityScore(spark, sfDir)
      .select(col("doc_id"), col("score"))
    val joined = col_.join(seam, "doc_id")
    assert(joined.count() == docs.count())
    // bit-equality, not tolerance: both paths are one integer hash and
    // one IEEE division — a ULP drift means the stub arithmetic diverged
    assert(joined.filter(col("score") =!= col("score_seam")).count() == 0)
  }

  test("the seam batches per partition: one model load per partition, not per row") {
    val docs = Tables.documents(spark, sfDir).repartition(7)
    val loads = spark.sparkContext.longAccumulator("model_loads")
    val rowsSeen = spark.sparkContext.longAccumulator("rows_scored")
    val counted = ext.Scoring.scorePartitions(docs, { it =>
      loads.add(1) // the "open the model handle" moment
      ext.Scoring.defaultScorer(it.map { r => rowsSeen.add(1); r })
    })
    val n = counted.count()
    assert(n == docs.count() && rowsSeen.value == n)
    // one load per partition — a per-row-shaped seam would show
    // loads == rows (5000 here), the JNI-call-per-row antipattern
    assert(loads.value == 7, s"expected 7 loads, got ${loads.value}")
  }

  test("band gate composes as an ordinary pushable predicate") {
    val plan = ext.Scoring.qualityScore(spark, sfDir)
      .filter(col("band") === "keep")
      .queryExecution.sparkPlan.toString
    // the score is a plain column: no shuffle appears for score+filter
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("score-weighted sample tilts toward quality without a hard cliff") {
    val all = ext.Scoring.qualityScore(spark, sfDir)
      .select(col("doc_id"), col("score")).collect()
    val kept = ext.Scoring.scoreWeightedSample(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // P(keep) = score ⇒ the kept mean must exceed the corpus mean...
    val meanAll = all.map(_.getDouble(1)).sum / all.length
    val meanKept = kept.values.sum / kept.size
    assert(meanKept > meanAll,
      s"sample not tilted: kept mean $meanKept vs corpus $meanAll")
    // ...but low-score docs still survive sometimes (no threshold cliff)
    assert(kept.values.exists(_ < 0.4), "no low-score survivors — cliff?")
    assert(kept.nonEmpty && kept.size < all.length)
  }

  test("column scoring path runs STATELESS on a stream (ingest-time gate)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = ext.Scoring.scored(input.toDF().toDF("doc_id", "text"))
      .filter(col("band") =!= "drop")
      .writeStream.format("memory").queryName("graft_scored")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_scored").toString)
      .start()
    try {
      input.addData((1L, "alpha beta gamma"), (2L, "delta epsilon"))
      q.processAllAvailable()
      val rows = spark.table("graft_scored").collect()
      // the stream path must agree with the batch path on the same rows
      val batch = ext.Scoring.scored(
        Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"))
          .toDF("doc_id", "text"))
        .filter(col("band") =!= "drop").collect()
      assert(rows.map(_.toString).sorted.toSeq ==
             batch.map(_.toString).sorted.toSeq)
      val exec = q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString
      assert(!exec.contains("StateStore"),
        s"per-row scoring must be stateless:\n$exec")
    } finally q.stop()
  }

  test("bands partition the corpus and follow the thresholds") {
    val rows = ext.Scoring.qualityScore(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (s, b) = (r.getDouble(2), r.getString(3))
      val expect = if (s >= 0.8) "keep" else if (s >= 0.4) "review" else "drop"
      assert(b == expect, s"doc ${r.getLong(0)}: score $s banded $b")
    }
    assert(rows.map(_.getString(3)).distinct.toSet == Set("keep", "review", "drop"))
  }
}
