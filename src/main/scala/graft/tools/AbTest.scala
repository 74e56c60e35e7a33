package graft.tools

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.{DedupConfig, Turn}
import graft.operators.Pipeline
import graft.sources.{ConversationGen, GtPair}

/**
 * Paired preprocessing A/B harness (VERDICT r04 missing #3) — the Spark
 * analog of the reference's CLAHE A/B module
 * (/root/reference/clahe_ab_test.py:115-303): run the SAME corpus through
 * two configs differing in one knob, join each arm's evidence against the
 * planted ground truth, and report per-transform-category deltas so a user
 * tuning one preprocessing flag sees exactly which dup categories it helps
 * or hurts — not just one global number.
 *
 * Arm evidence mirrors the reference's per-pair (ssim, ncc) deltas in text
 * space: detection (tier A/B), verified jaccard, and the minhash estimate.
 * The `hard_negative` category row reads as a false-positive rate, so a
 * "normalization" that buys recall by admitting negatives is visible in the
 * same table (the reference's verdict logic, clahe_ab_test.py:288-303).
 */
object AbTest {

  /** One arm: per-GT-pair detection + evidence under `cfg`. */
  private def arm(turns: Dataset[Turn], gt: DataFrame, cfg: DedupConfig,
                  runId: String): DataFrame = {
    val r = Pipeline.runPipelined(turns, cfg, runId)
    val ev = r.tiered.toDF()
      .select(col("conv_a"), col("conv_b"), col("tier"),
        col("jaccard"), col("minhash_est"))
    val joined = gt.join(ev, Seq("conv_a", "conv_b"), "left")
      .withColumn("detected",
        when(col("tier") === "A" || col("tier") === "B", 1.0).otherwise(0.0))
    val out = joined.groupBy(col("transform_type").as("category"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("detected")), 4).as("detect_rate"),
        round(coalesce(avg(col("jaccard")), lit(0.0)), 4).as("mean_jaccard"),
        round(coalesce(avg(col("minhash_est")), lit(0.0)), 4).as("mean_est"))
      .localCheckpoint(true)
    Seq(r.sigs, r.candidates, r.verified, r.tiered, r.clusters)
      .foreach(_.unpersist())
    out
  }

  /**
   * Paired A/B over planted ground truth: one row per transform category
   * with both arms' detect rate / mean verified jaccard / mean estimate and
   * their deltas (B − A). For `hard_negative`, detect_rate IS the FP rate.
   */
  def compare(turns: Dataset[Turn], gtPairs: Seq[GtPair],
              cfgA: DedupConfig, cfgB: DedupConfig,
              runId: String = "ab"): DataFrame = {
    val spark = turns.sparkSession
    import spark.implicits._
    val gt = spark.createDataset(gtPairs)
      .select($"conv_a", $"conv_b", $"transform_type")
    val a = arm(turns, gt, cfgA, s"${runId}_a")
    val b = arm(turns, gt, cfgB, s"${runId}_b")
    a.select($"category", $"n",
        $"detect_rate".as("detect_a"), $"mean_jaccard".as("jaccard_a"),
        $"mean_est".as("est_a"))
      .join(b.select($"category",
        $"detect_rate".as("detect_b"), $"mean_jaccard".as("jaccard_b"),
        $"mean_est".as("est_b")), Seq("category"))
      .withColumn("delta_detect", round($"detect_b" - $"detect_a", 4))
      .withColumn("delta_jaccard", round($"jaccard_b" - $"jaccard_a", 4))
      .withColumn("delta_est", round($"est_b" - $"est_a", 4))
      .orderBy($"category")
  }

  /** CLI: A/B the maskToolPayloads preprocessing flag on the recall corpus
    * (args: [nBase], default the recall spec's 5000). */
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val spec =
      if (args.nonEmpty)
        ConversationGen.CorpusSpec(args(0).toLong, 38, 300)
      else ConversationGen.recall
    val turns = ConversationGen.corpus(spark, spec).persist()
    turns.count()
    val cfgA = DedupConfig.balanced                          // mask ON (default)
    val cfgB = cfgA.copy(maskToolPayloads = false)           // mask OFF
    val rep = compare(turns, ConversationGen.gtPairs(spec), cfgA, cfgB)
      .collect()
    println(f"${"category"}%-22s ${"n"}%5s ${"det_A"}%7s ${"det_B"}%7s ${"Δdet"}%7s ${"jac_A"}%7s ${"jac_B"}%7s ${"Δjac"}%7s")
    rep.foreach { r =>
      println(f"${r.getString(0)}%-22s ${r.getLong(1)}%5d ${r.getDouble(2)}%7.4f ${r.getDouble(5)}%7.4f ${r.getDouble(8)}%7.4f ${r.getDouble(3)}%7.4f ${r.getDouble(6)}%7.4f ${r.getDouble(9)}%7.4f")
    }
    // the reference's verdict print (clahe_ab_test.py:288-303): net recall
    // delta on true dups vs FP delta on hard negatives
    val dups = rep.filter(_.getString(0) != "hard_negative")
    val negs = rep.filter(_.getString(0) == "hard_negative")
    val dDet = dups.map(_.getDouble(8)).sum / math.max(1, dups.length)
    val dFp = negs.map(_.getDouble(8)).sum
    println(f"[abtest] mean_delta_detect=$dDet%+.4f fp_delta=$dFp%+.4f verdict=" +
      (if (dDet > 0.01 && dFp <= 0.0) "B (clear win)"
       else if (dDet > 0.0 && dFp <= 0.0) "B (marginal)"
       else "A (keep default)"))
    spark.stop()
  }
}
