package graft.tools
import graft.model.DedupConfig
import graft.operators.{LshJoin, Reassembly, Signatures}
import graft.sources.ConversationGen
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.session("8")
    val turns = ConversationGen.corpus(spark, ConversationGen.smoke)
    val sigs = Signatures.compute(Reassembly.assemble(turns), DedupConfig.balanced).localCheckpoint(true)
    val cand = LshJoin.candidates(sigs, DedupConfig.balanced)
    cand.collect()
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/cand_plan.txt"),
      cand.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
