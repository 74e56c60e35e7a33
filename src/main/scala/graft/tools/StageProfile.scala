package graft.tools

import graft.model.DedupConfig
import graft.operators.Pipeline
import graft.sources.ConversationGen

/** Dev profiler: per-stage wall times for the dedup pipeline at a given
  * corpus size. Not part of the driver contract. */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val nBase = if (args.nonEmpty) args(0).toLong else 20000L
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val t00 = System.nanoTime()
    val corpus = ConversationGen.corpus(spark,
      ConversationGen.CorpusSpec(nBase, 60, 400)).persist()
    val n = corpus.count()
    println(f"[profile] corpus n_turns=$n gen=${(System.nanoTime() - t00) / 1e9}%.1fs")
    val t0 = System.nanoTime()
    val r = Pipeline.run(corpus, DedupConfig.balanced)
    r.clusters.count()
    println(f"[profile] pipeline total=${(System.nanoTime() - t0) / 1e9}%.1fs")
    r.metrics.foreach(m =>
      println(f"[profile] stage=${m.stage}%-12s in=${m.input_count}%9d out=${m.output_count}%9d ${m.duration_ms / 1000.0}%8.1fs"))
    spark.stop()
  }
}
