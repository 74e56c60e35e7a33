package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import graft.model.DedupConfig
import graft.operators.{LshJoin, Pipeline, Reassembly, Signatures}
import graft.sources.ConversationGen

/** Dev probe: decompose the candidates-stage WALL at a given parallelism —
  * driver planning vs execution vs scheduler overhead (jobs/stages/task-time
  * utilization). Args: [cpus] [nBase]. Not part of the driver contract. */
object CandWall {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0) else "32"
    val nBase = if (args.length > 1) args(1).toLong else 100000L
    val spark = graft.Bench.session(cpus)
    val cfg = DedupConfig.balanced

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var taskTimeMs = 0L
    @volatile var jobGapMs = 0L
    @volatile var lastJobEnd = 0L
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1
        if (lastJobEnd > 0) jobGapMs += math.max(0, j.time - lastJobEnd)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = { lastJobEnd = j.time }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        val m = s.stageInfo.taskMetrics
        taskTimeMs += m.executorRunTime
        println(f"[candwall-stage] id=${s.stageInfo.stageId} tasks=${s.stageInfo.numTasks} " +
          f"taskTime=${m.executorRunTime / 1000.0}%.1fs cpuTime=${m.executorCpuTime / 1e9}%.1fs " +
          f"shufRead=${m.shuffleReadMetrics.totalBytesRead / 1e6}%.0fMB " +
          f"shufWrite=${m.shuffleWriteMetrics.bytesWritten / 1e6}%.0fMB " +
          f"spill=${m.memoryBytesSpilled / 1e6}%.0fMB name=${s.stageInfo.name.takeWhile(_ != '\n').take(60)}")
      }
    }

    val corpus = ConversationGen.corpus(spark,
      ConversationGen.CorpusSpec(nBase, 60, 400)).persist()
    corpus.count()

    (0 to 2).foreach { rep =>
      val sigs = Signatures.compute(Reassembly.assemble(corpus), cfg)
        .localCheckpoint(true)
      // measure ONLY the candidates stage, pipeline-identically
      jobs = 0; stages = 0; taskTimeMs = 0L; jobGapMs = 0L; lastJobEnd = 0L
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      // pipeline-identical call: the bucket observation rides along (rep 2
      // omits it, isolating the CollectMetrics cost/plan difference)
      val raw = LshJoin.candidates(sigs, cfg,
        if (rep == 2) None else Some(org.apache.spark.sql.Observation()))
      val qe = raw.queryExecution
      qe.executedPlan // force analysis + optimization + physical planning
      val tPlan = System.nanoTime()
      val ck = raw.localCheckpoint(true)
      val n = ck.count()
      val tExec = System.nanoTime()
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(300) // let listener drain
      if (rep == 1)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get("/tmp/cand_plan100k.txt"),
          qe.executedPlan.toString)
      val wallExec = (tExec - tPlan) / 1e9
      val util = taskTimeMs / 1000.0 / (wallExec * cpus.toInt)
      println(f"[candwall] cpus=$cpus rep=$rep n=$n plan=${(tPlan - t0) / 1e9}%.2fs " +
        f"exec=$wallExec%.2fs jobs=$jobs stages=$stages " +
        f"taskTime=${taskTimeMs / 1000.0}%.1fs util=$util%.2f jobGap=${jobGapMs / 1000.0}%.1fs")
      ck.unpersist()
      sigs.unpersist()
    }
    spark.stop()
  }
}
