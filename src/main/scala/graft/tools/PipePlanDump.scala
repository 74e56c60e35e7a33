package graft.tools

import graft.model.DedupConfig
import graft.operators.{LshJoin, Pipeline, Reassembly, Signatures, TierGate, Verification}
import graft.sources.ConversationGen

/** Dev probe (optimization r06): dump `.explain("formatted")` for the
  * PIPELINE-INTERNAL stages the optimization round touched — the
  * flag_dedup_* query plans are post-checkpoint LogicalRDD scans, so the
  * stage plans have to be captured from the stage expressions themselves.
  * Args: [outDir] [nBase]. Not part of the driver contract. */
object PipePlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "/tmp/pipeplans"
    val nBase = if (args.length > 1) args(1).toLong else 2000L
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val cfg = DedupConfig.balanced
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"$name.txt"),
        df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))

    val corpus = ConversationGen.corpus(spark,
      ConversationGen.CorpusSpec(nBase, 60, 400)).persist()
    corpus.count(): Unit
    val sigs = Signatures.compute(Reassembly.assemble(corpus), cfg)
      .localCheckpoint(true)
    dump("pipeline_candidates", LshJoin.candidates(sigs, cfg).toDF())
    val cands = LshJoin.candidates(sigs, cfg).localCheckpoint(true)
    val ver = Verification.verify(cands, sigs, cfg).localCheckpoint(true)
    val prof = graft.operators.IntraDup.convProfile(corpus).localCheckpoint(true)
    // small-pairs broadcast shape vs the at-scale shuffle-hash shape: the
    // hint value is the only difference, so the pair of dumps IS the
    // before/after plan diff for the tiered stage
    dump("pipeline_tiergate_broadcast",
      TierGate(ver, cfg, Some(prof), pairCountHint = Some(1L)).toDF())
    dump("pipeline_tiergate_shufflehash",
      TierGate(ver, cfg, Some(prof), pairCountHint = Some(Long.MaxValue)).toDF())
    spark.stop()
  }
}
