package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import graft.functions.TextKernel
import graft.model._

/**
 * Candidate-pair verification (SURVEY.md §2.3 X4/X8/X15, §2.4 J5): the
 * salted-repartition candidate-pair join pulling per-doc signature payloads
 * to the verifiers, then a narrow evidence map per pair.
 *
 * Evidence computed per pair —
 *   - exact Jaccard of bottom-k shingle sketches (global SSIM analog)
 *   - per-block Jaccard, top-k mean + min (3x3 patch-grid SSIM analog,
 *     /root/reference/duplicate_detector/core/similarity_engine.py:640-797)
 *   - SimHash Hamming distance + min-over-bundle distance with short-circuit
 *     (hamming_min_transform analog, similarity_engine.py:359-400)
 *   - longest-common-substring span over capped head text — exact
 *     generalized-suffix-array kernel (SuffixSpans, the north_rule's
 *     per-partition suffix-array stage; cfg.spanEngine="lcs" selects the
 *     rolling-hash fallback) — computed ONLY on triggered pairs
 *     (progressive gating: the reference runs ORB only on CLIP≥0.985 ∨
 *     pHash≤4 triggers, geometric_verifier.py:424-441; here the expensive
 *     span check runs only where cheap evidence is inconclusive)
 *
 * Scale notes: pairs are repartitioned on the uniform pair_key hash so heavy
 * conversations never hot-spot one task (north_rule salting requirement);
 * the two payload joins are plain shuffled hash joins with AQE skew
 * splitting; per-pair work is bounded by the sketch caps and headChars.
 */
object Verification {

  /** Per-conversation evidence surfaces for the DuckDB replay oracle of
    * `flag_dedup_verified`: the exploded global sketch, the exploded
    * per-block sketches, and the per-doc scalars (simhash, array sizes,
    * head length) the evidence map reads. With these dumped, every
    * verified-pair column except the suffix-array span is re-derivable in
    * pure SQL (jaccard = merge-scan set ratio, patch stats = ordered
    * top-k over per-block jaccards, hamming = bit_count(xor)). */
  def oracleSurface(sigs: Dataset[graft.model.DocSig]): Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
    "pipe_sketch" -> sigs.select(col("conv_id"),
      explode(col("sketch")).as("sk")),
    "pipe_blocks" -> sigs
      .select(col("conv_id"), posexplode(col("block_sketches")).as(Seq("block_id", "bks")))
      .select(col("conv_id"), col("block_id"), explode(col("bks")).as("bk")),
    "pipe_doc" -> sigs.select(col("conv_id"), col("simhash"),
      size(col("sketch")).as("sketch_n"),
      size(col("block_sketches")).as("n_blocks"),
      length(col("head_text")).as("head_len")))

  private case class Payload(
    conv_id: String, simhash: Long, simhash_bundle: Array[Long],
    sketch: Array[Long], block_sketches: Array[Array[Long]],
    head_text: String, n_tokens: Int)

  def verify(pairs: Dataset[CandidatePair], sigs: Dataset[DocSig],
             cfg: DedupConfig): Dataset[VerifiedPair] = {
    val spark = pairs.sparkSession
    import spark.implicits._

    val payload = sigs.select($"conv_id", $"simhash", $"simhash_bundle",
      $"sketch", $"block_sketches", $"head_text", $"n_tokens")

    def side(s: String) = payload.toDF(payload.columns.map(_ + s): _*)

    // No pre-repartition: the conv_a equi-join re-shuffles the pair table
    // anyway (an explicit pair_key spread here was pure wasted exchange),
    // and per-task skew is already bounded by the per-doc candidate cap —
    // a hot conversation contributes at most maxPairsPerDoc pairs per side.
    // SHUFFLE_HASH on the payload side: sort-merge would SORT the fat
    // (pair + full payload) stream — measured 2.0 GB of sort spill per run
    // at 100k docs — while a hash join builds on the per-doc payload shard
    // (|docs|·payload / shuffle-partition) and streams the pair side
    // unsorted into the evidence map.
    val joined = pairs.toDF()
      .join(side("_a").hint("shuffle_hash"), col("conv_a") === col("conv_id_a"))
      .join(side("_b").hint("shuffle_hash"), col("conv_b") === col("conv_id_b"))

    val topK = cfg.patchTopK
    val strictJ = cfg.tierAJaccard
    val cutoff = cfg.simhashMaxDist
    val useSa = cfg.spanEngine == "sa"
    val blockFloor = cfg.blockVerifyJaccard

    joined.select(
        $"pair_key", $"conv_a", $"conv_b", $"minhash_est", $"source",
        $"simhash_a", $"simhash_bundle_a", $"sketch_a", $"block_sketches_a",
        $"head_text_a", $"n_tokens_a",
        $"simhash_b", $"simhash_bundle_b", $"sketch_b", $"block_sketches_b",
        $"head_text_b", $"n_tokens_b")
      .as[(String, String, String, Double, String,
           Long, Array[Long], Array[Long], Array[Array[Long]], String, Int,
           Long, Array[Long], Array[Long], Array[Array[Long]], String, Int)]
      .map { case (pk, a, b, est, src,
                   shA, bunA, skA, blkA, headA, _,
                   shB, bunB, skB, blkB, headB, _) =>
        val jac = TextKernel.jaccardSorted(skA, skB)
        val nBlk = math.min(blkA.length, blkB.length)
        val blockJ = new Array[Double](nBlk)
        var i = 0
        var verifiedBlocks = 0
        while (i < nBlk) {
          val bj = TextKernel.jaccardSorted(blkA(i), blkB(i))
          blockJ(i) = bj
          if (bj >= blockFloor) verifiedBlocks += 1 // T4 "verified tile"
          i += 1
        }
        java.util.Arrays.sort(blockJ)
        var s = 0.0; var c = 0; var j = nBlk - 1
        while (j >= 0 && c < topK) { s += blockJ(j); c += 1; j -= 1 }
        val patchTopK = if (c == 0) 0.0 else s / c
        val patchMin = if (nBlk == 0) 0.0 else blockJ(0)
        val shDist = TextKernel.hamming(shA, shB)
        val bunDist = TextKernel.minHammingBundle(bunA, bunB, cutoff)
        // progressive gating: expensive span check only when cheap evidence
        // is inconclusive but the pair is plausible
        val needSpan = jac < strictJ && bunDist > cutoff && est >= 0.15
        // X15 span evidence: exact generalized-suffix-array LCS by default
        // (the north_rule's per-partition suffix-array stage, running where
        // the two texts are already co-located); rolling-hash LCS fallback.
        // The SA path also yields the span's alignment offset (X10 analog).
        val (span, offset) =
          if (!needSpan) (0, 0)
          else if (useSa) {
            val (l, pa, pb) = SuffixSpans.lcsWithPositions(headA, headB)
            (l, pa - pb)
          } else (TextKernel.longestCommonSubstring(headA, headB), 0)
        val minLen = math.max(1, math.min(headA.length, headB.length))
        VerifiedPair(pk, a, b, est, jac, patchTopK, patchMin, verifiedBlocks,
          shDist, bunDist,
          variant_matched = bunDist <= cutoff,
          max_span_len = span, span_frac = span.toDouble / minLen,
          span_offset = offset, source = src)
      }
  }
}
