package graft.tools

import org.apache.spark.sql.functions._
import graft.model.DedupConfig
import graft.operators.{DocDedup, LshJoin, Reassembly, Signatures}

/** Dev probe: decompose minhash_docs_lsh cost on the documents table. */
object DocLshProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._
    def timed[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[dlsh] $tag sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").persist()
    println(s"[dlsh] docs=${docs.count()} " +
      s"avg_len=${docs.agg(avg(length(col("text")))).head().getDouble(0)}")
    (0 until 2).foreach { round =>
      val cfg = DedupConfig.balanced.copy(shingleK = 3, simThreshold = 0.5)
      val asDocs = docs.select(col("doc_id").cast("string").as("conv_id"),
        lit(1).as("n_turns"), col("text").as("doc_text")).as[graft.model.ConvDoc]
      val sigs = timed(s"r$round sigs") {
        val s = Signatures.compute(asDocs, cfg).localCheckpoint(true); s.count(); s
      }
      timed(s"r$round candidates") { LshJoin.candidates(sigs, cfg).count() }
      timed(s"r$round full_query") {
        DocDedup.minhashLshCandidates(spark, docs).count()
      }
    }
    spark.stop()
  }
}
