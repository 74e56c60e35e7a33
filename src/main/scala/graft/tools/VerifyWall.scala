package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import graft.model.DedupConfig
import graft.operators.{LshJoin, Reassembly, Signatures, Verification}
import graft.sources.ConversationGen

/** Dev probe: decompose the verification-stage wall (join shape, shuffle
  * bytes, spill) at a given parallelism. Args: [cpus] [nBase]. */
object VerifyWall {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0) else "32"
    val nBase = if (args.length > 1) args(1).toLong else 100000L
    val spark = graft.Bench.session(cpus)
    val cfg = DedupConfig.balanced

    @volatile var taskTimeMs = 0L
    val listener = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        taskTimeMs += m.executorRunTime
        println(f"[verifywall-stage] id=${s.stageInfo.stageId} tasks=${s.stageInfo.numTasks} " +
          f"taskTime=${m.executorRunTime / 1000.0}%.1fs cpuTime=${m.executorCpuTime / 1e9}%.1fs " +
          f"shufRead=${m.shuffleReadMetrics.totalBytesRead / 1e6}%.0fMB " +
          f"shufWrite=${m.shuffleWriteMetrics.bytesWritten / 1e6}%.0fMB " +
          f"spill=${m.memoryBytesSpilled / 1e6}%.0fMB")
      }
    }

    val corpus = ConversationGen.corpus(spark,
      ConversationGen.CorpusSpec(nBase, 60, 400)).persist()
    corpus.count()
    val sigs = Signatures.compute(Reassembly.assemble(corpus), cfg)
      .localCheckpoint(true)
    val cands = LshJoin.candidates(sigs, cfg).localCheckpoint(true)
    println(s"[verifywall] cands=${cands.count()}")

    (0 to 2).foreach { rep =>
      taskTimeMs = 0L
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val v = Verification.verify(cands, sigs, cfg)
      val qe = v.queryExecution
      qe.executedPlan
      val tPlan = System.nanoTime()
      val ck = v.localCheckpoint(true)
      val n = ck.count()
      val tExec = System.nanoTime()
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(300)
      if (rep == 1)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get("/tmp/verify_plan100k.txt"),
          qe.executedPlan.toString)
      val wallExec = (tExec - tPlan) / 1e9
      println(f"[verifywall] cpus=$cpus rep=$rep n=$n plan=${(tPlan - t0) / 1e9}%.2fs " +
        f"exec=$wallExec%.2fs taskTime=${taskTimeMs / 1000.0}%.1fs " +
        f"util=${taskTimeMs / 1000.0 / (wallExec * cpus.toInt)}%.2f")
      ck.unpersist()
    }
    spark.stop()
  }
}
