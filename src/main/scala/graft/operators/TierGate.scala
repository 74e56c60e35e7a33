package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.{DedupConfig, TieredPair, VerifiedPair}

/**
 * Evidence z-score + tier gating (SURVEY.md §2.3 X12, §2.9 T1/T2).
 *
 * ZScore: degree-normalized similarity per endpoint — for each conversation,
 * the mean/stddev of its candidate-edge scores; a pair's z is the MIN of its
 * two endpoint z's (exactly the reference's CLIP z-score
 * `min((s_ij−μ_i)/σ_i, (s_ij−μ_j)/σ_j)`,
 * /root/reference/ai_pdf_panel_duplicate_check_AUTO.py:1496-1602). This
 * kills template-lookalike families: a doc whose every neighbor scores
 * similarly (boilerplate hub) yields low z for all its pairs.
 *
 * TierGate: a single Catalyst `when` expression tree over evidence columns —
 * the port of apply_tier_gating's disjunction-of-paths with first-match
 * provenance and an FP veto (ai_...AUTO.py:688-1023). Fully codegen'd,
 * constant-folded, no UDF.
 */
object TierGate {

  /** Attach clip_z_analog via two per-endpoint window aggregations. */
  def withZScore(pairs: Dataset[VerifiedPair]): DataFrame = {
    // endpoint stats must see the edge from BOTH sides: explode to
    // (endpoint, score) and aggregate, then join back per side.
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs.select($"conv_a".as("ep"), $"minhash_est".as("s"))
      .unionAll(pairs.select($"conv_b".as("ep"), $"minhash_est".as("s")))
    val stats = edges.groupBy($"ep").agg(
      avg($"s").as("mu"), stddev_pop($"s").as("sigma"), count(lit(1)).as("deg"))
    def z(side: String) =
      when(col(s"sigma_$side") > 1e-9,
        (col("minhash_est") - col(s"mu_$side")) / col(s"sigma_$side"))
        .otherwise(lit(10.0)) // degenerate: single/uniform neighborhood → no veto
    pairs.toDF()
      .join(stats.select($"ep".as("conv_a"), $"mu".as("mu_a"), $"sigma".as("sigma_a")), Seq("conv_a"), "left")
      .join(stats.select($"ep".as("conv_b"), $"mu".as("mu_b"), $"sigma".as("sigma_b")), Seq("conv_b"), "left")
      .withColumn("clip_z_analog", least(z("a"), z("b")))
      .drop("mu_a", "sigma_a", "mu_b", "sigma_b")
  }

  /** The tier truth table. Input: verified pairs + clip_z_analog column. */
  def gate(verifiedWithZ: DataFrame, cfg: DedupConfig): Dataset[TieredPair] = {
    val spark = verifiedWithZ.sparkSession
    import spark.implicits._

    // Tier-A paths, first-match priority (≙ tier_path provenance,
    // ai_...AUTO.py:995-1021):
    val exactPath   = col("bundle_dist") <= cfg.simhashMaxDist           // ① pHash≤3 analog
    val strictPath  = col("jaccard") >= cfg.tierAJaccard &&
                      col("jaccard_patch_topk") >= cfg.tierAJaccard - 0.05 // ② CLIP≥0.99∧SSIM≥0.95
    val spanPath    = col("max_span_len") >= cfg.spanMinLen &&
                      col("span_frac") >= cfg.spanMinFrac                // ③ ORB-geometry analog
    val relaxedPath = col("jaccard") >= cfg.tierARelaxJaccard &&
                      (col("minhash_est") + col("jaccard")) >= cfg.tierARelaxSum // ④ relaxed sum gate

    // FP veto (≙ confocal-FP veto, ai_...AUTO.py:870-885): high candidate
    // score but weak exact evidence and a low-z template neighborhood.
    // Exact/strict/span paths are IMMUNE to the veto, exactly like the
    // reference's Tier-A mask excluding the veto for geometric evidence.
    val fpVeto = col("clip_z_analog") < cfg.zVeto &&
                 col("jaccard") < cfg.tierARelaxJaccard &&
                 col("max_span_len") < cfg.spanMinLen

    val tierPath =
      when(exactPath, "exact_fingerprint")
        .when(strictPath, "strict_jaccard")
        .when(spanPath, "substring_span")
        .when(relaxedPath && !fpVeto, "relaxed_sum")
        .otherwise(lit(null).cast("string"))

    val tierB = col("jaccard") >= cfg.tierBJaccard ||
                col("simhash_dist") <= cfg.simhashMaxDist * 3 ||
                col("max_span_len") >= cfg.spanMinLen / 2

    verifiedWithZ
      .withColumn("tier_path", tierPath)
      .withColumn("tier",
        when(col("tier_path").isNotNull, "A")
          // the veto guards only the relaxed Tier-A path (as in the
          // reference, where the FP veto gates Tier A but Tier B bands
          // remain, ai_...AUTO.py:988-1021) — vetoing B would cost recall
          .when(tierB, "B")
          .otherwise("other"))
      .withColumn("tier_path", coalesce(col("tier_path"),
        when(col("tier") === "B", "band_b").otherwise("none")))
      .select($"pair_key", $"conv_a", $"conv_b", $"minhash_est", $"jaccard",
        $"jaccard_patch_topk", $"simhash_dist", $"bundle_dist",
        $"max_span_len", $"span_frac", $"clip_z_analog", $"tier", $"tier_path",
        $"source")
      .as[TieredPair]
  }

  def apply(pairs: Dataset[VerifiedPair], cfg: DedupConfig): Dataset[TieredPair] =
    gate(withZScore(pairs), cfg)

  /**
   * Optional scored-gate column (SURVEY.md §2.3 X18 — the reference's
   * logistic PairClassifier over [cosine, ssim, hamming],
   * /root/reference/duplicate_detector/utils/classifier.py:15-44; OFF by
   * default like models/config.py:137): a deterministic linear score +
   * sigmoid over the text-domain evidence, pure column arithmetic (no
   * MLlib, fully codegen'd). Weights mirror the reference's signal order —
   * similarity positive, fingerprint distance negative.
   */
  def pairScore(verified: DataFrame,
                wEst: Double = 3.0, wJac: Double = 4.0,
                wDist: Double = -0.25, bias: Double = -3.0): DataFrame =
    verified.withColumn("pair_score",
      lit(1.0) / (lit(1.0) + exp(-(
        lit(wEst) * col("minhash_est") + lit(wJac) * col("jaccard") +
        lit(wDist) * col("simhash_dist") + lit(bias)))))
}
