package graft.tools
import org.apache.spark.sql.functions._
import graft.model.DedupConfig
import graft.operators._
import graft.sources.ConversationGen
/** Dev probe: CC sub-step timings (not part of the contract). */
object CcProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.session("32")
    sys.env.get("SPARK_GRAFT_DUALRUN").foreach(v =>
      spark.conf.set("spark.sql.analyzer.singlePassResolver.dualRunWithLegacy", v))
    import spark.implicits._
    val nBase = if (args.nonEmpty) args(0).toLong else 40000L
    val corpus = ConversationGen.corpus(spark,
      ConversationGen.CorpusSpec(nBase, 60, 400)).persist()
    corpus.count()
    val cfg = DedupConfig.balanced
    val r = Pipeline.runPipelined(corpus, cfg); r.clusters.count()
    val edges = r.tiered.filter($"tier" === "A" || $"tier" === "B")
      .select($"conv_a", $"conv_b").toDF().persist()
    println(s"[cc] edges=${edges.count()}")
    var t0 = System.nanoTime()
    val symRaw = edges.select(col("conv_a").as("src"), col("conv_b").as("dst"))
      .unionAll(edges.select(col("conv_b").as("src"), col("conv_a").as("dst")))
      .distinct()
      .localCheckpoint(true)
    println(f"[cc] symRaw_checkpoint=${(System.nanoTime()-t0)/1e9}%.1f")
    t0 = System.nanoTime()
    val n = symRaw.count()
    println(f"[cc] count($n)=${(System.nanoTime()-t0)/1e9}%.1f")
    t0 = System.nanoTime()
    val pairs = symRaw.as[(String, String)].collect()
    println(f"[cc] collect(${pairs.length})=${(System.nanoTime()-t0)/1e9}%.1f")
    t0 = System.nanoTime()
    val out = ConnectedComponents.cluster(edges)
    out.count()
    println(f"[cc] full_cluster=${(System.nanoTime()-t0)/1e9}%.1f")
    t0 = System.nanoTime()
    val edgesT = edges.localCheckpoint(true)
    println(f"[cc] truncate=${(System.nanoTime()-t0)/1e9}%.1f")
    t0 = System.nanoTime()
    val out2 = ConnectedComponents.cluster(edgesT)
    out2.count()
    println(f"[cc] cluster_after_truncate=${(System.nanoTime()-t0)/1e9}%.1f")
    spark.stop()
  }
}
