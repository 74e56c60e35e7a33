package graft.operators

import org.apache.spark.sql.{Column, Dataset}
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
 * Byte discipline (this stage is the pipeline's weakest scaler — the
 * memory-bus wall the scaling series attributes): the full DocSig payload
 * is ~16 KB/doc at the bench corpus (1024×8 B sketch + 9×256×8 B block
 * sketches + ~5 KB head text), and join1's output — (pair + payload_a) —
 * re-exchanges by conv_b, so every payload byte ships once more PER PAIR.
 * Two structural cuts:
 *   1. Sketches cross the joins as their HIGH-32-BIT truncations
 *      (`Array[Int]`): mix64 is a bijection, so sketch values are distinct
 *      uniform 64-bit keys and two distinct values collide in their high
 *      32 bits with p = 2⁻³² — per pair of k-sized sketches an expected
 *      k²·2⁻³² ≈ 2×10⁻⁴ spurious intersections, invisible next to the
 *      bottom-k sampling error. Truncation of a sorted array is monotonic,
 *      so the merge-scan kernel runs unchanged on ints at HALF the memory
 *      traffic; `array_distinct` guards the rare in-doc collision so
 *      intersection counting stays set-exact. The DuckDB replay consumes
 *      the SAME truncated values (oracleSurface dumps sk/bk post-
 *      truncation), so `flag_dedup_verified` remains hash-exact.
 *   2. head_text never enters the pair joins. Pass 1 computes every cheap
 *      evidence column payload-slim; the expensive span kernel's trigger
 *      (needSpan: inconclusive-but-plausible) is a pass-1 OUTPUT, so pass 2
 *      joins heads back for ONLY the triggered slice (typically a small
 *      fraction of pairs) and the union re-assembles the stage. The pass-1
 *      boundary is an eager localCheckpoint — the pipeline's stage idiom —
 *      so the fat join executes exactly once, not once per branch.
 *
 * Scale notes: pairs are repartitioned on the uniform pair_key hash so heavy
 * conversations never hot-spot one task (north_rule salting requirement);
 * the payload joins are plain shuffled hash joins with AQE skew
 * splitting; per-pair work is bounded by the sketch caps and headChars.
 * SHUFFLE_HASH on the payload side: sort-merge would SORT the fat
 * (pair + payload) stream — measured 2.0 GB of sort spill per run at 100k
 * docs — while a hash join builds on the per-doc payload shard
 * (|docs|·payload / shuffle-partition) and streams the pair side unsorted
 * into the evidence map.
 */
object Verification {

  /** High-32-bit truncation of a sorted mixed-64 sketch column: monotonic
    * (order-preserving on the signed sort), in-int-range by construction
    * (ANSI-safe cast), deduped against the ~2⁻³²-probability in-doc
    * collision so downstream intersection/union counting is set-exact. */
  private[graft] def sketch32(c: Column): Column =
    array_distinct(transform(c, v => shiftright(v, 32).cast("int")))

  private[graft] def blocks32(c: Column): Column =
    transform(c, a => sketch32(a))

  /** Per-conversation evidence surfaces for the DuckDB replay oracle of
    * `flag_dedup_verified`: the exploded global sketch, the exploded
    * per-block sketches, and the per-doc scalars (simhash, array sizes,
    * head length) the evidence map reads. sk/bk are dumped EXACTLY as the
    * evidence map consumes them — the high-32-bit truncated, deduped
    * values — and sketch_n counts the truncated array, so the SQL replay
    * (intersection via equi-join, union via skn_a + skn_b − i) reproduces
    * the kernel bit-for-bit. With these dumped, every verified-pair column
    * except the suffix-array span is re-derivable in pure SQL (jaccard =
    * merge-scan set ratio, patch stats = ordered top-k over per-block
    * jaccards, hamming = bit_count(xor)). */
  def oracleSurface(sigs: Dataset[graft.model.DocSig]): Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
    "pipe_sketch" -> sigs.select(col("conv_id"),
      explode(sketch32(col("sketch"))).as("sk")),
    "pipe_blocks" -> sigs
      .select(col("conv_id"), posexplode(blocks32(col("block_sketches"))).as(Seq("block_id", "bks")))
      .select(col("conv_id"), col("block_id"), explode(col("bks")).as("bk")),
    "pipe_doc" -> sigs.select(col("conv_id"), col("simhash"),
      size(sketch32(col("sketch"))).as("sketch_n"),
      size(col("block_sketches")).as("n_blocks"),
      length(col("head_text")).as("head_len")))

  def verify(pairs: Dataset[CandidatePair], sigs: Dataset[DocSig],
             cfg: DedupConfig): Dataset[VerifiedPair] = {
    val spark = pairs.sparkSession
    import spark.implicits._

    // Pass-1 payload: everything the cheap evidence needs, NO head text,
    // sketches truncated to ints — ~2.8 KB/doc at the bench corpus vs the
    // full DocSig's ~16 KB, a ~5.7× cut of the (pair + payload_a) exchange
    // feeding join2, which is this stage's dominant byte mover.
    val payload = sigs.select($"conv_id", $"simhash", $"simhash_bundle",
      sketch32($"sketch").as("sketch"),
      blocks32($"block_sketches").as("block_sketches"))

    def side(s: String) = payload.toDF(payload.columns.map(_ + s): _*)

    // No pre-repartition: the conv_a equi-join re-shuffles the pair table
    // anyway (an explicit pair_key spread here was pure wasted exchange),
    // and per-task skew is already bounded by the per-doc candidate cap —
    // a hot conversation contributes at most maxPairsPerDoc pairs per side.
    val joined = pairs.toDF()
      .join(side("_a").hint("shuffle_hash"), col("conv_a") === col("conv_id_a"))
      .join(side("_b").hint("shuffle_hash"), col("conv_b") === col("conv_id_b"))

    val topK = cfg.patchTopK
    val strictJ = cfg.tierAJaccard
    val cutoff = cfg.simhashMaxDist
    val useSa = cfg.spanEngine == "sa"
    val blockFloor = cfg.blockVerifyJaccard

    val pass1 = joined.select(
        $"pair_key", $"conv_a", $"conv_b", $"minhash_est", $"source",
        $"simhash_a", $"simhash_bundle_a", $"sketch_a", $"block_sketches_a",
        $"simhash_b", $"simhash_bundle_b", $"sketch_b", $"block_sketches_b")
      .as[(String, String, String, Double, String,
           Long, Array[Long], Array[Int], Array[Array[Int]],
           Long, Array[Long], Array[Int], Array[Array[Int]])]
      .map { case (pk, a, b, est, src,
                   shA, bunA, skA, blkA,
                   shB, bunB, skB, blkB) =>
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
        (VerifiedPair(pk, a, b, est, jac, patchTopK, patchMin, verifiedBlocks,
          shDist, bunDist,
          variant_matched = bunDist <= cutoff,
          max_span_len = 0, span_frac = 0.0, span_offset = 0, source = src),
         needSpan)
      }
      .select($"_1.*", $"_2".as("need_span"))
      // eager stage boundary: the fat join above must run ONCE, not once
      // per consuming branch below (and the checkpoint is narrow — the
      // evidence columns, ~150 B/row)
      .localCheckpoint(true)

    val done = pass1.filter(!$"need_span").drop("need_span").as[VerifiedPair]

    // Pass 2 — X15 span evidence for the triggered slice only: exact
    // generalized-suffix-array LCS by default (the north_rule's
    // per-partition suffix-array stage, running where the two texts are
    // already co-located); rolling-hash LCS fallback. The SA path also
    // yields the span's alignment offset (X10 analog). Heads join in
    // per TRIGGERED pair — the untriggered majority never ships a byte
    // of text.
    val heads = sigs.select($"conv_id", $"head_text")
    val spanned = pass1.filter($"need_span").drop("need_span")
      .join(heads.select($"conv_id".as("conv_a"), $"head_text".as("head_a"))
        .hint("shuffle_hash"), "conv_a")
      .join(heads.select($"conv_id".as("conv_b"), $"head_text".as("head_b"))
        .hint("shuffle_hash"), "conv_b")
      .select($"pair_key", $"conv_a", $"conv_b", $"minhash_est", $"jaccard",
        $"jaccard_patch_topk", $"jaccard_patch_min", $"n_verified_blocks",
        $"simhash_dist", $"bundle_dist", $"variant_matched", $"source",
        $"head_a", $"head_b")
      .as[(String, String, String, Double, Double, Double, Double,
           Int, Int, Int, Boolean, String, String, String)]
      .map { case (pk, a, b, est, jac, patchTopK, patchMin,
                   verifiedBlocks, shDist, bunDist, variantMatched,
                   src, headA, headB) =>
        val (span, offset) =
          if (useSa) {
            val (l, pa, pb) = SuffixSpans.lcsWithPositions(headA, headB)
            (l, pa - pb)
          } else (TextKernel.longestCommonSubstring(headA, headB), 0)
        val minLen = math.max(1, math.min(headA.length, headB.length))
        VerifiedPair(pk, a, b, est, jac, patchTopK, patchMin, verifiedBlocks,
          shDist, bunDist, variant_matched = variantMatched,
          max_span_len = span, span_frac = span.toDouble / minLen,
          span_offset = offset, source = src)
      }

    done.unionByName(spanned)
  }
}
