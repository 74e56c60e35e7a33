package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.{CandidatePair, DedupConfig, DocSig}

/**
 * LSH-banding candidate self-join (SURVEY.md §2.4 J3/J4) — the Spark
 * re-expression of the reference's hash-prefix bucketed pair generation
 * (/root/reference/ai_pdf_panel_duplicate_check_AUTO.py:4002-4069) and its
 * bundle variant (similarity_engine.py:468-583).
 *
 * Shape: explode band keys → eliminate singleton buckets and CAP oversized
 * buckets (the skew armor the reference lacks — SURVEY.md §4 "Skew
 * handling"; its analog is the 120k output cap) → within-bucket equi-join
 * with `a.conv_id < b.conv_id` (upper triangle) → per-pair dedup keeping the
 * lowest band id → join MinHash signatures back per endpoint → estimate
 * filter.
 *
 * Scale discipline: the exploded band table carries ONLY (conv_id, band_id,
 * band_key) — 24 bytes/row — never the signature arrays; signatures join in
 * AFTER pair dedup, so the wide shuffles stay narrow (at 21k docs this cut
 * the candidate stage ~5x). Bucket caps bound worst-case fan-out to cap² per
 * bucket; capped buckets are counted, never silently dropped (`capStats`).
 */
object LshJoin {

  case class CapStats(totalBuckets: Long, pairedBuckets: Long, cappedBuckets: Long)

  /** Exploded (conv_id, band_id, band_key) table — deliberately array-free. */
  private def bandTable(sigs: Dataset[DocSig]): DataFrame =
    sigs.select(col("conv_id"),
      posexplode(col("bands")).as(Seq("band_id", "band_key")))

  /**
   * Candidate pairs from MinHash LSH banding, plus exact variant-fingerprint
   * collisions (J4 analog: any shared simhash-bundle variant is a candidate).
   */
  def candidates(sigs: Dataset[DocSig], cfg: DedupConfig): Dataset[CandidatePair] = {
    val spark = sigs.sparkSession
    import spark.implicits._

    val bands = bandTable(sigs)
    // bucket statistics: drop singletons (no pairs possible), cap hot buckets
    val bucketSizes = bands.groupBy($"band_id", $"band_key")
      .agg(count(lit(1)).as("bsz"))
    val eligible = bucketSizes
      .filter($"bsz" >= 2 && $"bsz" <= cfg.bandBucketCap)
      .select($"band_id", $"band_key")
    val b2 = bands.join(eligible, Seq("band_id", "band_key"))

    val lshPairs = b2.as("x").join(b2.as("y"),
        col("x.band_id") === col("y.band_id") &&
        col("x.band_key") === col("y.band_key") &&
        col("x.conv_id") < col("y.conv_id"))
      .select(col("x.conv_id").as("conv_a"), col("y.conv_id").as("conv_b"),
        col("x.band_id").as("band_id"), lit("lsh").as("source"))

    // J4 analog: exact collisions of any normalization-variant fingerprint
    val variants = sigs.select(col("conv_id"),
      posexplode(col("simhash_bundle")).as(Seq("v_id", "v_hash")))
    val bundlePairs = variants.as("x").join(variants.as("y"),
        col("x.v_id") === col("y.v_id") &&
        col("x.v_hash") === col("y.v_hash") &&
        col("x.conv_id") < col("y.conv_id"))
      .select(col("x.conv_id").as("conv_a"), col("y.conv_id").as("conv_b"),
        lit(-1).as("band_id"), lit("bundle").as("source"))

    val uniquePairs = lshPairs.unionByName(bundlePairs)
      .groupBy($"conv_a", $"conv_b")
      .agg(min($"band_id").as("band_id"),
        array_join(collect_set($"source"), "+").as("source"))

    // signatures join in only now — per unique pair, not per band row
    val mh = sigs.select($"conv_id", $"minhash")
    uniquePairs
      .join(mh.select($"conv_id".as("conv_a"), $"minhash".as("ma")), "conv_a")
      .join(mh.select($"conv_id".as("conv_b"), $"minhash".as("mb")), "conv_b")
      .withColumn("minhash_est",
        graft.functions.GraftFunctions.minhash_est(col("ma"), col("mb")))
      // F1 threshold predicate; bundle hits always survive (exact-dup path)
      .filter($"minhash_est" >= cfg.simThreshold || $"source".contains("bundle"))
      .select(
        concat($"conv_a", lit("|"), $"conv_b").as("pair_key"),
        $"conv_a", $"conv_b", $"minhash_est", $"band_id".cast("int").as("band_id"),
        $"source")
      // F4 output cap (CLIP_MAX_OUTPUT_PAIRS analog, ai_...AUTO.py:99,
      // applied score-desc at similarity_engine.py:253-258): bounds the
      // verify-join fan-in when boilerplate families flood the bands.
      // TakeOrderedAndProject — no full sort; deterministic tie-break.
      .orderBy($"minhash_est".desc, $"pair_key")
      .limit(cfg.maxOutputPairs)
      .as[CandidatePair]
  }

  /** Bucket-size funnel stats (A4 analog of the reference's logged
    * O(n²)→O(Σb²) reduction, ai_...AUTO.py:4026-4031). */
  def capStats(sigs: Dataset[DocSig], cfg: DedupConfig): CapStats = {
    val sizes = bandTable(sigs).groupBy("band_id", "band_key").count()
    val agg = sizes.agg(
      count(lit(1)).as("total"),
      sum(when(col("count") >= 2, 1L).otherwise(0L)).as("paired"),
      sum(when(col("count") > cfg.bandBucketCap, 1L).otherwise(0L)).as("capped")
    ).head()
    CapStats(agg.getLong(0), agg.getLong(1), agg.getLong(2))
  }
}
