package graft.tools
import graft.sources.ConversationGen
import graft.model.DedupConfig
import graft.operators.Pipeline
/** Dev probe: median-of-N pipelined wall clock. */
object PipeMedian {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.session("32")
    val corpus = ConversationGen.corpus(spark,
      ConversationGen.CorpusSpec(40000, 60, 400)).persist()
    val n = corpus.count()
    val secs = (0 to 3).map { i =>
      val t0 = System.nanoTime()
      val r = Pipeline.runPipelined(corpus, DedupConfig.balanced, runId = s"m$i")
      r.clusters.count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[med] run$i sec=$s%.1f")
      s
    }.drop(1).sorted // drop warmup
    println(f"[med] median=${secs(secs.length / 2)}%.1f turns_per_sec=${n / secs(secs.length / 2)}%.0f n=$n")
    spark.stop()
  }
}
