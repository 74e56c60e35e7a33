package graft.tools

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration.Duration
import graft.model.DedupConfig
import graft.operators.{IntraDup, LshJoin, Reassembly, Signatures, TierGate, Verification}
import graft.sources.ConversationGen

/** Dev probe: decompose the tiered-stage wall (BD/BF replicated a tiered
  * anti-scaling signal at the 9.1M-turn corpus on the data-sized-shuffle
  * code). Times, separately: the concurrent convProfile future's residual
  * Await at tiered time, the z-score edge groupBy + join-backs, and the
  * pair-type join + truth-table gate. Args: [cpus] [nBase]. */
object TierWall {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0) else "32"
    val nBase = if (args.length > 1) args(1).toLong else 400000L
    val spark = graft.Bench.session(cpus)
    val cfg = DedupConfig.balanced

    val corpus = ConversationGen.corpus(spark,
      ConversationGen.CorpusSpec(nBase, 60, 400)).persist()
    val nTurns = corpus.count()
    graft.Bench.sizeShuffleForCorpus(spark, nTurns): Unit
    println(s"[tierwall] cpus=$cpus nTurns=$nTurns parts=" +
      spark.sessionState.conf.numShufflePartitions)

    // mirror runPipelined: profile future launched alongside the stages
    val tProf0 = System.nanoTime()
    val profF = Future {
      val p = IntraDup.convProfile(corpus).localCheckpoint(true)
      println(f"[tierwall] profile future done at +${(System.nanoTime() - tProf0) / 1e9}%.1fs")
      p
    }

    val sigs = Signatures.compute(Reassembly.assemble(corpus), cfg)
      .localCheckpoint(true)
    println(f"[tierwall] sigs done at +${(System.nanoTime() - tProf0) / 1e9}%.1fs")
    val cands = LshJoin.candidates(sigs, cfg).localCheckpoint(true)
    println(f"[tierwall] cands=${cands.count()} at +${(System.nanoTime() - tProf0) / 1e9}%.1fs")
    val verified = Verification.verify(cands, sigs, cfg).localCheckpoint(true)
    println(f"[tierwall] verified=${verified.count()} at +${(System.nanoTime() - tProf0) / 1e9}%.1fs")

    (0 to 1).foreach { rep =>
      val t0 = System.nanoTime()
      val prof = Await.result(profF, Duration.Inf)
      val tAwait = System.nanoTime()
      val zRaw = TierGate.withZScore(verified)
      val z = zRaw.localCheckpoint(true)
      z.count()
      val tZ = System.nanoTime()
      val gatedRaw = TierGate.gate(TierGate.withPairType(z, Some(prof)), cfg)
      val gated = gatedRaw.localCheckpoint(true)
      val nT = gated.count()
      val tG = System.nanoTime()
      println(f"[tierwall] cpus=$cpus rep=$rep tiered_n=$nT " +
        f"await=${(tAwait - t0) / 1e9}%.2fs zscore=${(tZ - tAwait) / 1e9}%.2fs " +
        f"gate=${(tG - tZ) / 1e9}%.2fs total=${(tG - t0) / 1e9}%.2fs")
      // the fused endpoint-attr pass (what Pipeline actually runs): one
      // attrs table, pair table exchanged twice instead of four times
      val fused = TierGate(verified, cfg, Some(prof)).localCheckpoint(true)
      val nF = fused.count()
      val tF = System.nanoTime()
      println(f"[tierwall] cpus=$cpus rep=$rep fused_n=$nF " +
        f"fused=${(tF - tG) / 1e9}%.2fs (vs separate ${(tG - t0) / 1e9}%.2fs)")
      if (rep == 0)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"/tmp/tierwall_zplan_$cpus.txt"),
          zRaw.queryExecution.executedPlan.toString + "\n=== gated ===\n" +
            gatedRaw.queryExecution.executedPlan.toString)
      z.unpersist(); gated.unpersist(); fused.unpersist()
    }
    spark.stop()
  }
}
