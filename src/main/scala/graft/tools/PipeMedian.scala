package graft.tools
import graft.sources.ConversationGen
import graft.model.DedupConfig
import graft.operators.Pipeline
/** Dev probe: per-stage wall at a given parallelism (args: cpus [nBase]). */
object PipeMedian {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0) else "32"
    val nBase = if (args.length > 1) args(1).toLong else 40000L
    val spark = graft.Bench.session(cpus)
    val corpus = ConversationGen.corpus(spark,
      ConversationGen.CorpusSpec(nBase, 60, 400)).persist()
    val n = corpus.count()
    graft.Bench.sizeShuffleForCorpus(spark, n): Unit
    (0 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val r = Pipeline.runPipelined(corpus, DedupConfig.balanced, runId = s"m$i")
      r.clusters.count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[med] cpus=$cpus run$i sec=$s%.1f " +
        r.metrics.filter(_.duration_ms >= 0)
          .map(m => f"${m.stage}=${m.duration_ms / 1000.0}%.1f").mkString(" "))
      // cache hygiene between samples (Bench/PipeOnce do the same): each
      // run's localCheckpointed stage blocks would otherwise stay pinned
      // and spill/evict DURING the later timed runs
      Seq(r.sigs, r.candidates, r.verified, r.tiered, r.clusters)
        .foreach(_.unpersist())
    }
    spark.stop()
  }
}
