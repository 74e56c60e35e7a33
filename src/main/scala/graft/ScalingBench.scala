package graft

import org.apache.spark.sql.SparkSession

/**
 * Two-cluster-size scaling evidence (BASELINE.json north_rule): the same
 * dedup job on the same input at local[8] and local[32] — the sandbox proxy
 * for N vs 4N executors. Prints one JSON line with throughput at both
 * parallelism levels and the scaling efficiency
 * (= (thr32 / thr8) / 4, target ≥ 0.8).
 *
 * Methodology: one warm-up run at the small parallelism to pay JVM/codegen
 * warmup outside the measurement, then timed runs. The corpus is generated
 * deterministically, so both levels process identical data.
 */
object ScalingBench {

  private def timedRun(cpus: Int, nBase: Long): (Long, Double) = {
    val spark = Bench.session(cpus.toString)
    try {
      val spec = sources.ConversationGen.CorpusSpec(nBase, 60, 400)
      val corpus = sources.ConversationGen.corpus(spark, spec)
      val nTurns = corpus.count()
      val t0 = System.nanoTime()
      val result = operators.Pipeline.run(corpus, model.DedupConfig.balanced)
      result.clusters.count()
      (nTurns, (System.nanoTime() - t0) / 1e9)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val nBase = sys.env.getOrElse("SPARK_GRAFT_SCALE_CONVS", "30000").toLong
    // warm-up (JIT/codegen) at small size
    val warm = Bench.session("8")
    try {
      val r = operators.Pipeline.run(
        sources.ConversationGen.corpus(warm, sources.ConversationGen.smoke))
      r.clusters.count()
    } finally warm.stop()

    val (turns8, sec8) = timedRun(8, nBase)
    val (turns32, sec32) = timedRun(32, nBase)
    require(turns8 == turns32)
    val thr8 = turns8 / sec8
    val thr32 = turns32 / sec32
    val eff = (thr32 / thr8) / 4.0
    println(s"""{"metric":"scaling_efficiency","value":${f"$eff%.3f"},"unit":"ratio","n_turns":$turns8,"sec_local8":${f"$sec8%.2f"},"sec_local32":${f"$sec32%.2f"},"turns_per_sec_local8":${f"$thr8%.1f"},"turns_per_sec_local32":${f"$thr32%.1f"}}""")
  }
}
