package graft.tools

import graft.model.DedupConfig
import graft.operators.{LshJoin, Reassembly, Signatures, SuffixSpans, Verification}
import graft.sources.ConversationGen

/** Dev probe: per-call suffix-array LCS cost + the needSpan pair count that
  * multiplies it inside the verify kernel. Args: [nBase]. */
object SpanBench {
  def main(args: Array[String]): Unit = {
    // microbench: two 8000-char semi-similar texts
    val rnd = new java.util.Random(42)
    def text(seed: Int): String = {
      val sb = new StringBuilder
      val r = new java.util.Random(seed)
      while (sb.length < 8000) sb.append("word" + r.nextInt(500)).append(' ')
      sb.toString.take(8000)
    }
    val a = text(1)
    val b = text(1).take(3000) + text(2).drop(3000) // shared 3k prefix
    // warm
    (0 until 20).foreach(_ => SuffixSpans.lcsWithPositions(a, b))
    var t0 = System.nanoTime()
    val reps = 200
    var sink = 0
    (0 until reps).foreach(_ => sink += SuffixSpans.lcsWithPositions(a, b)._1)
    println(f"[spanbench] lcsWithPositions(8k,8k) = ${(System.nanoTime() - t0) / 1e6 / reps}%.2f ms/call (sink=$sink)")

    val dis = text(3); val dis2 = text(4) // dissimilar
    t0 = System.nanoTime()
    (0 until reps).foreach(_ => sink += SuffixSpans.lcsWithPositions(dis, dis2)._1)
    println(f"[spanbench] dissimilar = ${(System.nanoTime() - t0) / 1e6 / reps}%.2f ms/call")

    if (args.nonEmpty) {
      val nBase = args(0).toLong
      val spark = graft.Bench.session("32")
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val cfg = DedupConfig.balanced
      val corpus = ConversationGen.corpus(spark,
        ConversationGen.CorpusSpec(nBase, 60, 400)).persist()
      corpus.count()
      val sigs = Signatures.compute(Reassembly.assemble(corpus), cfg)
        .localCheckpoint(true)
      val cands = LshJoin.candidates(sigs, cfg).localCheckpoint(true)
      val v = Verification.verify(cands, sigs, cfg).localCheckpoint(true)
      val n = v.count()
      // needSpan recon: inconclusive pairs that ran the span kernel
      val needSpan = v.filter($"jaccard" < cfg.tierAJaccard &&
        $"bundle_dist" > cfg.simhashMaxDist && $"minhash_est" >= 0.15).count()
      val avgHead = sigs.select(avg(length($"head_text"))).head().getDouble(0)
      println(f"[spanbench] pairs=$n needSpan=$needSpan (${needSpan * 100.0 / n}%.1f%%) avgHead=$avgHead%.0f chars")
      spark.stop()
    }
  }
}
