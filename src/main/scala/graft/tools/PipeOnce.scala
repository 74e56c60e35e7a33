package graft.tools
import graft.sources.ConversationGen
import graft.model.DedupConfig
import graft.operators._
/** Dev probe: pipelined runs under feature toggles (not part of contract). */
object PipeOnce {
  def main(args: Array[String]): Unit = {
    val nBase = if (args.nonEmpty) args(0).toLong else 40000L
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._
    val corpus = ConversationGen.corpus(spark,
      ConversationGen.CorpusSpec(nBase, 60, 400)).persist()
    val n = corpus.count()
    def timed(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[pipe] $tag sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    val cfg = DedupConfig.balanced
    // warm
    val w = Pipeline.runPipelined(corpus, cfg, runId = "warm"); w.clusters.count()
    Seq(w.sigs, w.candidates, w.verified, w.tiered).foreach(_.unpersist())
    // full current
    timed("full_sa") { val r = Pipeline.runPipelined(corpus, cfg, runId = "a"); r.clusters.count()
      Seq(r.sigs, r.candidates, r.verified, r.tiered).foreach(_.unpersist()) }
    // lcs span engine
    timed("full_lcs") { val r = Pipeline.runPipelined(corpus, cfg.copy(spanEngine = "lcs"), runId = "b"); r.clusters.count()
      Seq(r.sigs, r.candidates, r.verified, r.tiered).foreach(_.unpersist()) }
    // stage-by-stage, persisted (isolate each)
    val sigs = Signatures.compute(Reassembly.assemble(corpus), cfg).persist()
    timed("sigs")  { sigs.count() }
    val cands = LshJoin.candidates(sigs, cfg).persist()
    timed("cands") { cands.count() }
    val ver = Verification.verify(cands, sigs, cfg).persist()
    timed("verify_sa") { ver.count() }
    val verL = Verification.verify(cands, sigs, cfg.copy(spanEngine = "lcs")).persist()
    timed("verify_lcs") { verL.count() }
    val prof = IntraDup.convProfile(corpus).persist()
    timed("profile") { prof.count() }
    val tier = TierGate(ver, cfg, Some(prof.toDF())).persist()
    timed("tier_with_prof") { tier.count() }
    val tierNP = TierGate(ver, cfg, None).persist()
    timed("tier_no_prof") { tierNP.count() }
    timed("cc") {
      ConnectedComponents.cluster(
        tier.filter($"tier" === "A" || $"tier" === "B").select($"conv_a", $"conv_b").toDF()).count()
    }
    spark.stop()
  }
}
