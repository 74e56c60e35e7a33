package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Observation, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.ClusterRow

/**
 * Connected-components clustering over verified duplicate pairs
 * (SURVEY.md §2.12 — the north_rule requirement the reference lacks; it
 * only emits ranked pair tables).
 *
 * Algorithm: alternating small-star min-label propagation expressed purely
 * as DataFrame joins + groupBy(min) iterated to fixpoint — the standard
 * scalable CC formulation (Kiveris et al., "Connected Components in
 * MapReduce and Beyond", SoCC'14). Each iteration:
 *   label(v) ← min(label(v), min over neighbors u of label(u))
 * propagated through the edge list both ways. Convergence in O(log n)
 * iterations on real graphs; every iteration is localCheckpoint'ed to cut
 * the lineage (SURVEY.md §7 hard part (b)) so plans stay bounded at scale.
 *
 * Labels are the lexicographic-min conv_id of the component, which makes
 * cluster ids deterministic and stable across runs/cluster sizes.
 */
object ConnectedComponents {

  /** Driver-local threshold: below this many (symmetric) edges the
    * iterative join loop is pure scheduling overhead, so we collect and run
    * union-find on the driver — the same adaptive dispatch-by-input-size the
    * reference uses between all-pairs and batched modes
    * (ai_...AUTO.py:467-530, :3766-3783). Above it, the distributed
    * min-label loop runs (the only option at 10^12-turn scale).
    * Sized in BYTES on the driver: 500k edges × ~40 B/pair ≈ 20 MB
    * collected — safe on any driver; the old 2M-edge bound collected
    * 100+ MB of strings. */
  val DriverLocalMaxEdges: Long = 500000L

  /** Non-blocking-ish observation read: bounded wait for the metrics row
    * surfaced by the checkpoint action (listener callback is async). */
  private def readChanged(o: Observation): Option[Long] =
    try {
      val row = scala.concurrent.Await.result(
        o.future, scala.concurrent.duration.Duration(5, "s"))
      Option(row.getAs[Any]("chg")).map(_.asInstanceOf[Long]).orElse(Some(0L))
    } catch { case _: java.util.concurrent.TimeoutException => None }

  /** One partition-local union-find contraction pass over an edge list:
    * emits one (root, vertex) spanning-tree edge per distinct vertex per
    * partition. Preserves connectivity exactly; needs no dedup, symmetry,
    * or co-partitioning. */
  private def contract(edgeDf: DataFrame): DataFrame = {
    val spark = edgeDf.sparkSession
    import spark.implicits._
    edgeDf.as[(String, String)].mapPartitions { it =>
      val parent = scala.collection.mutable.HashMap[String, String]()
      def find(x: String): String = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      it.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val ra = find(a); val rb = find(b)
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      // snapshot keys BEFORE find(): path compression updates map values
      val ks = parent.keys.toArray
      ks.iterator.map(v => (find(v), v))
    }.toDF("src", "dst")
  }

  /** Run statistics surfaced to callers that need to attribute CC cost
    * (CcDistributed tool, scaling forensics): which path ran, forest sizes
    * per contraction round, and min-label loop iterations. */
  final class CcStats {
    var path: String = ""            // "hint-local" | "local" | "distributed"
    var forestEdges: Seq[Long] = Nil // after each contraction round
    var iterations: Int = 0          // min-label loop iterations run
  }

  /** edges: DataFrame with (conv_a, conv_b). Returns (conv_id, cluster_id,
    * cluster_size). `edgeCountHint`: an UPPER BOUND on the edge count known
    * by the caller (e.g. from an observation that already rode a checkpoint
    * action) — when it fits the driver-local budget, even the contraction
    * pass + its count barrier are skipped and the raw edges collect straight
    * into union-find, which needs neither dedup nor symmetry. */
  def cluster(edges: DataFrame, maxIters: Int = 25,
              driverLocalMaxEdges: Long = DriverLocalMaxEdges,
              edgeCountHint: Option[Long] = None,
              stats: CcStats = new CcStats): Dataset[ClusterRow] = {
    val spark = edges.sparkSession
    import spark.implicits._

    if (edgeCountHint.exists(_ <= driverLocalMaxEdges)) {
      stats.path = "hint-local"
      return clusterLocal(edges.select(col("conv_a"), col("conv_b")))
    }

    // PARTITION-LOCAL CONTRACTION FIRST (one narrow pass, ZERO shuffles):
    // union-find each partition's edges and emit one (root, vertex)
    // spanning-tree edge per distinct vertex seen. Union-find needs neither
    // dedup nor symmetry nor any particular co-partitioning, so the pass
    // runs directly on the INCOMING edge partitioning — the
    // symmetrize+distinct (a 2×-edges shuffle) and its count barrier that
    // used to precede contraction bought nothing the per-partition
    // union-find doesn't already do. Every original edge lives in some
    // partition, so the union of the per-partition forests generates exactly
    // the original connectivity — and dense near-dup families (the dominant
    // shape here: a boilerplate family of m members contributes O(m·cap)
    // pairs) collapse to O(m) forest edges. Measured at the 2.3M-turn gate
    // corpus: 934k A/B edges → the contracted forest fits the driver-local
    // budget, turning a ~15 s multi-iteration join loop into one narrow
    // pass + collect + union-find. At 100-TB scale the forest is still
    // huge → the iterative min-label loop below runs, on a graph that
    // contraction has already shrunk by the family density factor.
    //
    // The forest's size scales with the PARTITION COUNT, not just the graph
    // (a vertex contributes one spanning-tree edge per partition touching
    // it), so one pass at high parallelism can overshoot the driver budget
    // that the same edges at low parallelism meet — measured at 9.1M turns:
    // clusters 2.0 s at local[8] vs 9.7 s at local[32], purely because the
    // local[32] forest spilled into the iterative loop. RE-CONTRACT over
    // merged partitions (coalesce — no shuffle) before falling back: each
    // merge round collapses cross-partition trees by ~the merge factor, so
    // the driver-local path is reachable independent of the cluster's
    // parallelism. Connectivity is invariant under every round; the final
    // labels depend only on connectivity, so output is partition-agnostic.
    val raw = edges.select(col("conv_a").as("src"), col("conv_b").as("dst"))
    var forest = contract(raw).localCheckpoint(true)
    var nForest = forest.count()
    stats.forestEdges = Seq(nForest)
    var mergeRounds = 0
    while (nForest > driverLocalMaxEdges && mergeRounds < 2) {
      val nParts = forest.rdd.getNumPartitions
      if (nParts <= 1) { mergeRounds = 2 } // nothing left to merge
      else {
        forest = contract(forest.coalesce(math.max(1, nParts / 8)))
          .localCheckpoint(true)
        nForest = forest.count()
        stats.forestEdges = stats.forestEdges :+ nForest
        mergeRounds += 1
      }
    }
    if (nForest <= driverLocalMaxEdges) { stats.path = "local"; return clusterLocal(forest) }
    stats.path = "distributed"

    // still too large for the driver: iterate min-label propagation over the
    // contracted graph (strictly fewer edges, identical components)
    val symF = forest.select($"src", $"dst")
      .unionAll(forest.select($"dst".as("src"), $"src".as("dst")))
      .distinct()
    val partsF = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, (nForest / 50000L).toInt + 1))
    val sym = symF.repartition(partsF, col("src")).localCheckpoint(true)

    // initial label = own id
    var labels = sym.select($"src".as("id")).distinct()
      .withColumn("label", $"id")
      .localCheckpoint(true)

    var iter = 0
    var converged = false
    while (iter < maxIters && !converged) {
      // candidate label via neighbors: min(label(dst)) per src
      val viaNbr = sym
        .join(labels.withColumnRenamed("id", "dst").withColumnRenamed("label", "nbr_label"), Seq("dst"))
        .groupBy($"src").agg(min($"nbr_label").as("nbr_label"))
      val propagated = labels
        .join(viaNbr.withColumnRenamed("src", "id"), Seq("id"), "left")
        .select($"id", $"label".as("old"),
          least($"label", coalesce($"nbr_label", $"label")).as("label"))
      // pointer jumping (path compression): label(v) ← label(label(v)).
      // Neighbor-min alone needs diameter iterations; with the jump the
      // loop converges in O(log n) even on chains.
      val jumped = propagated.as("n")
        .join(propagated.select($"id".as("label"), $"label".as("label2")),
          Seq("label"), "left")
        .select($"id", $"old",
          least($"label", coalesce($"label2", $"label")).as("label"))
      // convergence signal rides the SAME checkpoint action via observe —
      // the old label is carried through the iteration, so no second join
      // + count job per iteration (that per-iteration driver barrier was
      // measured serial residue in the 2→8 scaling budget)
      val obs = Observation()
      val next = jumped
        .observe(obs, max(when($"label" =!= $"old", 1L).otherwise(0L)).as("chg"))
        .select($"id", $"label")
        .localCheckpoint(true)
      val changed = readChanged(obs).getOrElse(
        // fallback if the checkpoint action did not surface the metric:
        // a cheap limit-1 probe over the now-materialized checkpoint blocks
        jumped.filter($"label" =!= $"old").limit(1).count())
      labels = next
      converged = changed == 0L
      iter += 1
      stats.iterations = iter
    }

    val sizes = labels.groupBy($"label").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, Seq("label"))
      .select($"id".as("conv_id"), $"label".as("cluster_id"), $"cluster_size")
      .as[ClusterRow]
  }

  /** Driver-local union-find path for small edge sets (same output contract:
    * cluster_id = lexicographic-min member). */
  private def clusterLocal(sym: DataFrame): Dataset[ClusterRow] = {
    val spark = sym.sparkSession
    import spark.implicits._
    val pairs = sym.as[(String, String)].collect()
    val parent = scala.collection.mutable.HashMap[String, String]()
    def find(x: String): String = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val ra = find(a); val rb = find(b)
      // union by lexicographic min so the root IS the min label
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val assign = parent.keys.map(k => (k, find(k))).toSeq
    val sizes = assign.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    spark.createDataset(assign.map { case (id, root) =>
      ClusterRow(id, root, sizes(root)) })
  }
}
