package graft.ext

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** One-task LOCAL solvers for the iterative graph operators' small-graph
  * regime ([[Graph.pageRank]], [[Cluster.connectedComponents]]).
  *
  * Why they exist: below ~1M graph rows the distributed loops' cost is
  * not computation but JOB COUNT — every round is at least one eager
  * localCheckpoint job, measured 0.10–0.13 s of scheduling overhead per
  * round on a 20-node graph (r12's `syndication_pagerank` spent ~1.3 s of
  * its 4.9 s there). When the whole graph provably fits one partition
  * (the caller decides from COUNTED sizes, the same measured-switch
  * discipline as Dedup's bounded-broadcast joins), the fastest correct
  * plan is one task that materializes the partition and iterates in
  * memory — genuine per-partition imperative logic, which is exactly the
  * case where `mapPartitions` is the idiomatic Spark tool rather than a
  * workaround. The distributed loops remain the ≥1M-row scale path and
  * keep spec coverage via [[LocalSolveConf]].
  *
  * Input convention: both solvers take the operator's already-hygienic
  * CHECKPOINTED frames (dedup'd edges, closure-semi-joined to the node
  * set), tag node rows and edge rows into one narrow union, and coalesce
  * it to a single partition — one narrow read of the checkpoint blocks,
  * no shuffle, no driver-side collect (the graph lives in an executor
  * task, bounded by the caller's ~1M-row regime check).
  */
private[graft] object Iterate {

  /** Session conf that forces the DISTRIBUTED loop regardless of graph
    * size — how the specs keep the scale path covered on test-sized
    * graphs (and an operational escape hatch if a caller would rather
    * pay round jobs than a 1-partition task). */
  val LocalSolveConf = "spark.graft.iterative.localSolve"

  def localSolveEnabled(spark: SparkSession): Boolean =
    spark.conf.get(LocalSolveConf, "true").toBoolean

  /** Row ceiling for the local regime, DISTINCT from (and stricter than)
    * the generic ~1M-rows-per-task partition heuristic the distributed
    * loops size themselves by. The solvers hold the whole graph as boxed
    * values in one task's heap — ids + edge endpoints + two HashMaps ≈
    * 120–180 bytes/row — so 1M rows would be ~150 MB of single-task heap:
    * survivable on this harness's executors, but an avoidable OOM risk on
    * small-executor deployments sitting just below the regime switch. At
    * the 200k default the local graph is ≤ ~35 MB and the job-count
    * saving the regime exists for (0.10–0.13 s/round of scheduling
    * overhead) is already fully captured — gate graphs are O(100–10k)
    * rows, and a graph above 200k rows amortizes round-job overhead fine
    * distributed. Conf'd for operators who have measured their heap. */
  val LocalSolveMaxRowsConf = "spark.graft.iterative.localSolveMaxRows"

  def localSolveMaxRows(spark: SparkSession): Long =
    spark.conf.get(LocalSolveMaxRowsConf, "200000").toLong

  /** Row ceiling for the VECTOR local regime ([[LocalTrain.lloydLocal]]):
    * distinct from the graph bound because each row carries a dense
    * double array, not two scalars — at the 65536 default with the gate
    * fixtures' 64-dim vectors the one-task state is ≤ ~34 MB of primitive
    * doubles (the solver parses rows into unboxed Array[Double]), the
    * same order as the graph regime's ~35 MB budget. Above the bound the
    * distributed Lloyd loop amortizes its round jobs fine. */
  val LocalSolveMaxVecRowsConf = "spark.graft.iterative.localSolveMaxVecRows"

  def localSolveMaxVecRows(spark: SparkSession): Long =
    spark.conf.get(LocalSolveMaxVecRowsConf, "65536").toLong

  /** External-row values of orderable Spark SQL types (numerics, Decimal,
    * Date, Timestamp) implement Comparable with the natural order Spark's
    * `min` uses — EXCEPT String: `java.lang.String.compareTo` orders by
    * UTF-16 code unit, while Spark's `min` on StringType orders by UTF-8
    * byte (= code point). The two disagree exactly when one side holds an
    * astral-plane char (surrogate pair, code units 0xD800–0xDFFF) and the
    * other a BMP char in [U+E000, U+FFFF] — "" < "𐀀" in UTF-16 but
    * > in UTF-8. The local [[ccLocal]] min-label must agree with the
    * distributed loop's `min(col("label"))` exactly, so Strings compare
    * through UTF8String (ClusterSpec pins the astral case). */
  private def cmp(a: Any, b: Any): Int = a match {
    case s: String =>
      org.apache.spark.unsafe.types.UTF8String.fromString(s)
        .compareTo(org.apache.spark.unsafe.types.UTF8String
          .fromString(b.asInstanceOf[String]))
    case _ => a.asInstanceOf[Comparable[Any]].compareTo(b)
  }

  /** (tag=0, id, null) node rows ++ (tag=1, src, dst) edge rows, merged
    * narrowly onto one partition. */
  private def tagged(v: DataFrame, e: DataFrame): DataFrame = {
    val idType = v.schema("id").dataType
    v.select(lit(0).as("t"), col("id").as("a"),
             lit(null).cast(idType).as("b"))
      .unionByName(e.select(lit(1).as("t"),
                            col("src").as("a"), col("dst").as("b")))
      .coalesce(1)
  }

  /** Damped PageRank solved in one task. Mirrors the distributed loop's
    * recurrence exactly (teleport + damped in-mass + uniform dangling
    * redistribution, `(1−d)/n + d·(mass + dangling/n)` associated the
    * same way), so both regimes match GraphSpec's dense witness within
    * fp tolerance.
    *
    * @param v checkpointed distinct node frame, one column `id`
    * @param e checkpointed hygienic edge frame (`src`, `dst`): dedup'd,
    *          self-loop-free, closed over `v`
    */
  def pageRankLocal(v: DataFrame, e: DataFrame, n: Long,
                    iters: Int, damping: Double): DataFrame = {
    val outSchema = StructType(Seq(
      v.schema("id"), StructField("rank", DoubleType, nullable = false)))
    tagged(v, e).mapPartitions { it =>
      val ids = ArrayBuffer.empty[Any]
      val srcs = ArrayBuffer.empty[Any]
      val dsts = ArrayBuffer.empty[Any]
      it.foreach { r =>
        if (r.getInt(0) == 0) ids += r.get(1)
        else { srcs += r.get(1); dsts += r.get(2) }
      }
      val deg = new java.util.HashMap[Any, Long]
      srcs.foreach(s => deg.merge(s, 1L, (x, y) => x + y))
      var rank = new java.util.HashMap[Any, Double]
      ids.foreach(id => rank.put(id, 1.0 / n))
      for (_ <- 1 to iters) {
        var dangling = 0.0
        ids.foreach(id => if (!deg.containsKey(id)) dangling += rank.get(id))
        val mass = new java.util.HashMap[Any, Double]
        var i = 0
        while (i < srcs.length) {
          val share = rank.get(srcs(i)) / deg.get(srcs(i))
          mass.merge(dsts(i), share, (x, y) => x + y)
          i += 1
        }
        val next = new java.util.HashMap[Any, Double]
        ids.foreach { id =>
          next.put(id, (1.0 - damping) / n
            + damping * (mass.getOrDefault(id, 0.0) + dangling / n))
        }
        rank = next
      }
      val r = rank
      ids.iterator.map(id => Row(id, r.get(id)))
    }(Encoders.row(outSchema))
  }

  /** Connected components solved in one task: path-compressed union-find
    * with union-by-MIN root — the same labels (min reachable id) the
    * distributed pointer-jumping loop converges to, exactly.
    *
    * @param v   checkpointed distinct node frame, one column `id`
    * @param sym checkpointed symmetric dedup'd edge frame closed over `v`
    */
  def ccLocal(v: DataFrame, sym: DataFrame): DataFrame = {
    val idField = v.schema("id")
    val outSchema = StructType(Seq(idField, idField.copy(name = "label")))
    tagged(v, sym).mapPartitions { it =>
      val ids = ArrayBuffer.empty[Any]
      val parent = new java.util.HashMap[Any, Any]
      val srcs = ArrayBuffer.empty[Any]
      val dsts = ArrayBuffer.empty[Any]
      it.foreach { r =>
        if (r.getInt(0) == 0) { ids += r.get(1); parent.put(r.get(1), r.get(1)) }
        else { srcs += r.get(1); dsts += r.get(2) }
      }
      def find(x: Any): Any = {
        var root = x
        while (parent.get(root) != root) root = parent.get(root)
        var c = x
        while (parent.get(c) != root) {
          val nxt = parent.get(c); parent.put(c, root); c = nxt
        }
        root
      }
      var i = 0
      while (i < srcs.length) {
        val (ra, rb) = (find(srcs(i)), find(dsts(i)))
        if (ra != rb) {
          if (cmp(ra, rb) < 0) parent.put(rb, ra) else parent.put(ra, rb)
        }
        i += 1
      }
      ids.iterator.map(id => Row(id, find(id)))
    }(Encoders.row(outSchema))
  }
}
