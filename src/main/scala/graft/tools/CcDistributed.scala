package graft.tools

import org.apache.spark.sql.functions._
import graft.model.DedupConfig
import graft.operators._
import graft.sources.ConversationGen

/**
 * Distributed-CC evidence run (VERDICT r04 next #4): the min-label +
 * pointer-jump loop (`ConnectedComponents.cluster`, distributed branch) is
 * the clusters stage at real scale — at 100 TB the contracted forest
 * exceeds any driver budget — but only tiny specs exercised it. This tool
 * runs it at bench scale: build the pipeline's A/B edge set on the gate
 * corpus, cluster it once with `driverLocalMaxEdges = 0` (forcing
 * contraction → re-contraction → the iterative loop) and once through the
 * default driver-local path, assert cluster-assignment parity, and print
 * one JSON line (iterations, forest sizes, wall per path) for BASELINE.md.
 *
 * Usage: sbt "runMain graft.tools.CcDistributed [nBase]"   (default 100000)
 */
object CcDistributed {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._
    val nBase = if (args.nonEmpty) args(0).toLong else 100000L
    val corpus = ConversationGen.corpus(spark,
      ConversationGen.CorpusSpec(nBase, 60, 400)).persist()
    val nTurns = corpus.count()
    val r = Pipeline.runPipelined(corpus, DedupConfig.balanced, runId = "ccdist")
    r.clusters.count() // full pipeline first: edges reflect the real run
    val edges = r.tiered.filter($"tier" === "A" || $"tier" === "B")
      .select($"conv_a", $"conv_b").toDF().localCheckpoint(true)
    val nEdges = edges.count()

    def run(maxLocal: Long): (Map[String, String], Double, ConnectedComponents.CcStats) = {
      val st = new ConnectedComponents.CcStats
      val t0 = System.nanoTime()
      val out = ConnectedComponents.cluster(edges, driverLocalMaxEdges = maxLocal,
        stats = st)
        .select($"conv_id", $"cluster_id").as[(String, String)].collect()
        .toMap
      (out, (System.nanoTime() - t0) / 1e9, st)
    }
    val (distAssign, distSec, distStats) = run(0L)
    val (localAssign, localSec, localStats) = run(ConnectedComponents.DriverLocalMaxEdges)
    require(distStats.path == "distributed",
      s"distributed run took path '${distStats.path}' — raise the corpus size")

    // Parity: identical assignment maps (labels are min-member ids, so they
    // are comparable directly, not merely up to relabeling).
    val onlyDist = distAssign.keySet -- localAssign.keySet
    val onlyLocal = localAssign.keySet -- distAssign.keySet
    val mismatched = distAssign.count { case (k, v) => localAssign.get(k).exists(_ != v) }
    require(onlyDist.isEmpty && onlyLocal.isEmpty && mismatched == 0,
      s"PARITY FAILURE: onlyDist=${onlyDist.size} onlyLocal=${onlyLocal.size} mismatched=$mismatched")

    println(s"""{"metric":"cc_distributed","n_turns":$nTurns,"n_edges":$nEdges,"n_vertices":${distAssign.size},"n_clusters":${distAssign.values.toSet.size},"parity":true,"dist_sec":${f"$distSec%.2f"},"dist_iterations":${distStats.iterations},"dist_forest_edges":[${distStats.forestEdges.mkString(",")}],"local_sec":${f"$localSec%.2f"},"local_path":"${localStats.path}","local_forest_edges":[${localStats.forestEdges.mkString(",")}]}""")
    spark.stop()
  }
}
