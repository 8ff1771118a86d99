package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[ext.IvfPq]]'s production contract: the trained artifacts
  * round-trip parquet bit-identically (train once, probe forever),
  * the probe plan is cell-restricted (broadcasts only, partition
  * pruning on the persisted layout), and the approximation quality is
  * measured against exact brute force alongside full-scan PQ. */
class IvfPqSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  private def vecs =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), ext.Vectors.asDouble(col("embedding")).as("v"))

  private def codeRows(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  /** One shared train-and-persist pass — the artifacts every probe
    * test loads, exactly like a production deployment would. */
  private lazy val artifactDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_art").toString
    CacheScope.scoped(spark) {
      ext.IvfPq.writeIndex(ext.IvfPq.trainIndex(vecs), dir)
    }
    dir
  }

  test("artifacts round-trip parquet: loaded codes, re-encoded codes, and " +
       "probe results are all bit-identical to the in-training run") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    val (trained, gate) = CacheScope.scoped(spark) {
      val index = ext.IvfPq.trainIndex(vecs)
      ext.IvfPq.writeIndex(index, dir)
      (codeRows(index.codes),
       ext.IvfPq.knnIvfPq(spark, sfDir).collect().map(_.toSeq).toSeq)
    }
    val loaded = ext.IvfPq.readIndex(spark, dir)
    assert(codeRows(loaded.codes) == trained,
           "persisted codes drifted from the trained assignment")
    // re-encoding the corpus under the LOADED codebooks reproduces the
    // stored inverted lists exactly — parquet doubles are IEEE-exact,
    // so the argmin scores (fixed-order dots) cannot drift
    val reencoded = CacheScope.scoped(spark) {
      codeRows(ext.IvfPq.encode(vecs, loaded.coarse, loaded.codebooks))
    }
    assert(reencoded == trained,
           "re-encoding under loaded codebooks diverged from stored codes")
    // the probe over the loaded index answers exactly like the
    // train-inline gate query — search() is artifact-source-agnostic
    val probed = CacheScope.scoped(spark) {
      Present.sorted(
        ext.IvfPq.search(
          vecs.filter(col("vec_id") < ext.IvfPq.NumQueries)
            .select(col("vec_id").as("query_id"), col("v")),
          loaded),
        col("query_id"), col("rank")).collect().map(_.toSeq).toSeq
    }
    assert(probed == gate,
           "loaded-artifact probe diverged from the inline gate query")
  }

  test("persisted codes layout prunes unprobed cells at the file level") {
    val restricted = spark.read.parquet(s"$artifactDir/codes")
      .filter(col("ivf_cell").isin(0, 3))
    val plan = restricted.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("ivf_cell"),
           s"cell restriction did not reach the partition layout:\n$plan")
    // and the pruning is real: only the two cells' rows come back
    assert(restricted.select(col("ivf_cell")).distinct().count() <= 2)
  }

  test("append-then-compact: bit-identical codes, one file per cell, " +
       "file-level pruning intact") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_cmp").toString
    CacheScope.scoped(spark) {
      // train on ~2/3 of the corpus, then append the rest through the
      // incremental encode path — the fragmentation source compaction
      // exists for (each append lands a new file-set per touched cell)
      val base = vecs.filter(col("vec_id") % 3 =!= 0)
      val incr = vecs.filter(col("vec_id") % 3 === 0)
      ext.IvfPq.writeIndex(ext.IvfPq.trainIndex(base), dir)
      val loaded = ext.IvfPq.readIndex(spark, dir)
      ext.IvfPq.encode(incr, loaded.coarse, loaded.codebooks)
        .write.mode("append").partitionBy("ivf_cell").parquet(s"$dir/codes")
    }
    def filesPerCell: Map[String, Int] = {
      val root = new java.io.File(s"$dir/codes")
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("ivf_cell="))
        .map(d => d.getName ->
          d.listFiles().count(f => f.getName.endsWith(".parquet"))).toMap
    }
    val before = codeRows(ext.IvfPq.readIndex(spark, dir).codes)
    assert(filesPerCell.values.exists(_ > 1),
           "append produced no fragmentation — fixture broken")
    ext.IvfPq.compactCodes(spark, dir)
    val after = codeRows(ext.IvfPq.readIndex(spark, dir).codes)
    assert(after == before, "compaction changed the stored codes")
    val fpc = filesPerCell
    assert(fpc.nonEmpty && fpc.values.forall(_ == 1),
           s"compaction left fragmented cells: $fpc")
    // the ivf_cell= directory scheme survived the rewrite, so a cell
    // restriction still prunes at the file level
    val restricted = spark.read.parquet(s"$dir/codes")
      .filter(col("ivf_cell").isin(1, 2))
    val plan = restricted.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("ivf_cell"),
           s"cell restriction lost file-level pruning after compaction:\n$plan")
  }

  test("probe plan over the loaded index is broadcast-only: corpus codes " +
       "never shuffle, nothing cartesian-explodes") {
    // the production path: artifacts loaded from parquet, no training
    // in-plan — this is the plan that runs per query batch forever
    val plan = CacheScope.scoped(spark) {
      ext.IvfPq.search(
        vecs.filter(col("vec_id") < ext.IvfPq.NumQueries)
          .select(col("vec_id").as("query_id"), col("v")),
        ext.IvfPq.readIndex(spark, artifactDir))
        .queryExecution.sparkPlan.toString
    }
    // probe-set join + ADC-table join both broadcast; the probe set
    // restriction keys on ivf_cell
    assert(plan.contains("BroadcastHashJoin") && plan.contains("ivf_cell"),
           s"cell restriction is not a broadcast join:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin"),
           s"corpus codes shuffled for the probe:\n$plan")
    assert(!plan.contains("ShuffledHashJoin"),
           s"corpus codes shuffled for the probe:\n$plan")
  }

  test("residual index: loaded-artifact probe ≡ inline gate, re-encode " +
       "bit-identical, probe plan broadcast-only") {
    val dir = java.nio.file.Files.createTempDirectory("ivfadc").toString
    val (trained, gate) = CacheScope.scoped(spark) {
      val index = ext.IvfPq.trainResidualIndex(vecs)
      ext.IvfPq.writeIndex(index, dir)
      (codeRows(index.codes),
       ext.IvfPq.knnIvfAdc(spark, sfDir).collect().map(_.toSeq).toSeq)
    }
    val loaded = ext.IvfPq.readIndex(spark, dir)
    assert(codeRows(loaded.codes) == trained)
    val reencoded = CacheScope.scoped(spark) {
      codeRows(ext.IvfPq.encodeResidual(vecs, loaded.coarse, loaded.codebooks))
    }
    assert(reencoded == trained,
           "residual re-encode under loaded codebooks diverged")
    val probed = CacheScope.scoped(spark) {
      val df = ext.IvfPq.searchResidual(
        vecs.filter(col("vec_id") < ext.IvfPq.NumQueries)
          .select(col("vec_id").as("query_id"), col("v")),
        loaded)
      val plan = df.queryExecution.sparkPlan.toString
      assert(!plan.contains("SortMergeJoin") &&
             !plan.contains("ShuffledHashJoin") &&
             !plan.contains("CartesianProduct"),
             s"residual probe must stay broadcast-only:\n$plan")
      Present.sorted(df, col("query_id"), col("rank"))
        .collect().map(_.toSeq).toSeq
    }
    assert(probed == gate,
           "loaded-artifact residual probe diverged from the inline gate")
  }

  test("recall@3 vs exact brute force is measured, positive, and reported " +
       "alongside full-scan PQ") {
    def topSets(rows: Array[(Long, Long)]) =
      rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = topSets(CacheScope.scoped(spark) {
      ext.Similarity.knnBrute(spark, sfDir).collect()
        .map(r => r.getLong(0) -> r.getLong(2))
    })
    val ivfpq = topSets(CacheScope.scoped(spark) {
      ext.IvfPq.knnIvfPq(spark, sfDir).collect()
        .map(r => r.getLong(0) -> r.getLong(2))
    })
    val fullPq = topSets(CacheScope.scoped(spark) {
      ext.Pq.knnPq(spark, sfDir).collect()
        .map(r => r.getLong(0) -> r.getLong(2))
    })
    val ivfadc = topSets(CacheScope.scoped(spark) {
      ext.IvfPq.knnIvfAdc(spark, sfDir).collect()
        .map(r => r.getLong(0) -> r.getLong(2))
    })
    assert(ivfpq.keySet == brute.keySet)
    def recall(got: Map[Long, Set[Long]]) = got.map { case (q, s) =>
      (s intersect brute(q)).size.toDouble / brute(q).size
    }.sum / got.size
    val (rIvf, rFull, rRes) = (recall(ivfpq), recall(fullPq), recall(ivfadc))
    info(f"IVF-PQ raw (probe ${ext.IvfPq.ProbeCells}) recall@3 vs brute: $rIvf%.2f")
    info(f"IVFADC residual (probe ${ext.IvfPq.ProbeCells}) recall@3 vs brute: $rRes%.2f")
    info(f"full-scan PQ recall@3 vs brute: $rFull%.2f (ADC ceiling)")
    // the X10b practice: measure honestly, assert the floor — the
    // cell-restricted probes must still FIND true neighbors
    assert(rIvf > 0.0, s"cell-restricted ADC found no true neighbors: $rIvf")
    assert(rRes > 0.0, s"residual ADC found no true neighbors: $rRes")
  }
}
