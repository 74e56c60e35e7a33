package graft

import graft.model._
import graft.operators.{Adaptive, LshJoin}
import graft.sources.ConversationGen

/** Size-adaptive dispatch (X6/auto_configure analog) + F2 group
  * suppression knob. */
class AdaptiveSpec extends SparkSpec {

  test("configure tightens selectivity and caps monotonically with corpus size") {
    val tiers = Seq(1000L, 100000L, 10000000L, 1000000000L).map(Adaptive.configure(_))
    // LSH threshold (1/b)^(1/r) is non-decreasing with corpus size
    val thr = tiers.map(c => math.pow(1.0 / c.bands, 1.0 / c.rows))
    assert(thr == thr.sorted, s"thresholds $thr")
    // skew caps are non-increasing
    val caps = tiers.map(_.bandBucketCap)
    assert(caps == caps.sorted.reverse, s"caps $caps")
    val ppd = tiers.map(_.maxPairsPerDoc)
    assert(ppd == ppd.sorted.reverse, s"pairs/doc $ppd")
    // bands*rows never exceeds the signature length
    tiers.foreach(c => assert(c.bands * c.rows <= c.numPerms))
  }

  test("runAuto dispatches on corpus size and meets the smoke recall floor") {
    import spark.implicits._
    val turns = ConversationGen.corpus(spark, ConversationGen.smoke)
    val (cfg, result) = Adaptive.runAuto(turns)
    assert(cfg.bandBucketCap == 512, "smoke corpus should pick the small-corpus tier")
    val gt = ConversationGen.gtPairs(ConversationGen.smoke).filter(_.should_detect)
    val detected = result.tiered
      .filter(t => t.tier == "A" || t.tier == "B")
      .select($"conv_a", $"conv_b").as[(String, String)].collect()
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    val recall = gt.count(g => detected.contains((g.conv_a, g.conv_b))).toDouble / gt.size
    assert(recall >= 0.90, s"auto-config recall=$recall")
  }

  test("coarse-tier banding (32×4, minBandHits=1) keeps recall on ≥-threshold transforms") {
    import spark.implicits._
    // the <100M-doc tier: 32 bands × 4 rows ⇒ LSH threshold ≈ 0.42. A
    // just-above-threshold pair (J ≈ 0.5) expects only ~2 band collisions,
    // so the tier MUST run with minBandHits=1 (ADVICE r02) — with the
    // 64×2-calibrated default of 2 this gate drops to ~0.60 recall.
    val cfg = Adaptive.configure(10000000L)
    assert(cfg.minBandHits == 1, "coarse tiers must not require 2 band hits")
    val turns = ConversationGen.corpus(spark, ConversationGen.smoke)
    val result = operators.Pipeline.runPipelined(turns, cfg, runId = "coarse")
    // subst10 (J ≈ 0.42) sits below this tier's design threshold by intent
    // (the tier trades weakest-transform recall for join selectivity at
    // 10⁷–10⁸ docs); every other planted transform has J ≥ 0.6
    val gt = ConversationGen.gtPairs(ConversationGen.smoke)
      .filter(g => g.should_detect && g.transform_type != "subst10")
    val detected = result.tiered
      .filter(t => t.tier == "A" || t.tier == "B")
      .select($"conv_a", $"conv_b").as[(String, String)].collect()
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    val recall = gt.count(g => detected.contains((g.conv_a, g.conv_b))).toDouble / gt.size
    assert(recall >= 0.90, s"coarse-tier recall=$recall over ${gt.size} pairs")
  }

  test("100-TB-tier banding (16×8, minBandHits=1) keeps recall on strong near-dups") {
    import spark.implicits._
    // the ≥100M-doc tier — the config every 100-TB run would use (VERDICT
    // r04 next #5): 16 bands × 8 rows ⇒ LSH threshold ≈ 0.71. minBandHits
    // calibration at r=8: a just-above-threshold pair (J ≈ 0.71) expects
    // only 16·0.71⁸ ≈ 1.0 band collisions, so the tier MUST run with
    // minBandHits=1 — requiring ≥2 distinct hits would halve
    // near-threshold recall.
    val cfg = Adaptive.configure(1000000000L)
    assert(cfg.bands == 16 && cfg.rows == 8)
    assert(cfg.minBandHits == 1, "r=8 tiers must not require 2 band hits")
    val turns = ConversationGen.corpus(spark, ConversationGen.smoke)
    val result = operators.Pipeline.runPipelined(turns, cfg, runId = "tier100tb")
    val detected = result.tiered
      .filter(t => t.tier == "A" || t.tier == "B")
      .select($"conv_a", $"conv_b").as[(String, String)].collect()
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    // The gate is CONFIG-RELATIVE (the BASELINE contract is recall at the
    // same shingle/signature config): this tier's 0.71 banding threshold
    // trades sub-threshold pairs away BY DESIGN — subst5 (J ≈ 0.63),
    // subst10 (J ≈ 0.42), and truncate15 of SHORT conversations (keep =
    // max(2, 85%) of turns removes up to a third of a 3-turn conv). So
    // compute every planted pair's TRUE shingle Jaccard with the pipeline's
    // own kernel and require: (a) full recall over pairs above the
    // threshold + noise margin, (b) every miss sits below that margin —
    // i.e. the tier trades exactly what it claims to trade, nothing else.
    val allGt = ConversationGen.gtPairs(ConversationGen.smoke).filter(_.should_detect)
    val ids = allGt.flatMap(g => Seq(g.conv_a, g.conv_b)).toSet
    val byConv = turns.filter(t => ids.contains(t.conv_id)).collect().groupBy(_.conv_id)
    def shingles(id: String): Set[Long] = {
      val texts = byConv(id).sortBy(_.turn_idx).map(t =>
        if (t.role == "tool") s"[tool:${Option(t.tool).getOrElse("?")}]" else t.text)
      val norm = functions.TextKernel.normalize(texts.mkString("\n"))
      functions.TextKernel.shingleSet(
        functions.TextKernel.tokens(norm), cfg.shingleK).toSet
    }
    val withJ = allGt.map { g =>
      val (sa, sb) = (shingles(g.conv_a), shingles(g.conv_b))
      (g, (sa & sb).size.toDouble / (sa | sb).size)
    }
    // margin above the 0.707 banding threshold: the S-curve knee plus
    // est-noise (1/√128 ≈ 0.09 on the 0.60 simThreshold filter)
    val strong = withJ.filter(_._2 >= 0.78)
    assert(strong.size >= 10, s"only ${strong.size} strong pairs planted — gate too weak")
    val missedStrong = strong.filterNot { case (g, _) =>
      detected.contains((g.conv_a, g.conv_b)) }
    assert(missedStrong.isEmpty,
      s"100-TB tier missed ABOVE-threshold pairs: ${missedStrong.map { case (g, j) =>
        f"${g.conv_b}(${g.transform_type}, J=$j%.2f)" }.mkString(",")}")
    val missedAll = withJ.filterNot { case (g, _) =>
      detected.contains((g.conv_a, g.conv_b)) }
    assert(missedAll.forall(_._2 < 0.78),
      s"a miss above the design threshold: ${missedAll.map { case (g, j) =>
        f"${g.conv_b}(J=$j%.2f)" }.mkString(",")}")
    // and the hard negatives stay out even at the coarsest banding
    val negs = ConversationGen.gtPairs(ConversationGen.smoke)
      .filter(!_.should_detect)
    val fp = negs.count(g => detected.contains((g.conv_a, g.conv_b)))
    assert(fp == 0, s"$fp hard negatives leaked through the 16×8 tier")
  }

  test("pipeline-level group suppression: groupGap drops same-group planted dups, OFF leaves them") {
    import spark.implicits._
    val spec = ConversationGen.smoke
    val turns = ConversationGen.corpus(spark, spec)
    // group every dup clone with its source (same "page"): group id = source index
    val dupGt = ConversationGen.gtPairs(spec).filter(_.category != "hard_negative")
    val groupRows = dupGt.flatMap(g =>
        Seq((g.conv_a, g.conv_a.stripPrefix("c").toLong),
            (g.conv_b, g.conv_a.stripPrefix("c").toLong)))
      .distinct
    val groups = groupRows.toDF("conv_id", "group_id")
    val groupOf = groupRows.toMap
    def sameGroup(a: String, b: String) =
      groupOf.get(a).exists(ga => groupOf.get(b).contains(ga))

    // OFF (reference default): planted same-group dups are found
    val off = operators.Pipeline.runPipelined(turns, DedupConfig.balanced, runId = "gs_off")
    val offPairs = off.candidates.select($"conv_a", $"conv_b")
      .as[(String, String)].collect().toSet
    assert(offPairs.exists { case (a, b) => sameGroup(a, b) },
      "planted dups must surface when OFF")

    // ON with gap 0: every same-group pair is suppressed before verification
    val on = operators.Pipeline.runPipelined(turns,
      DedupConfig.balanced.copy(groupGap = Some(0)), runId = "gs_on",
      groups = Some(groups))
    val onPairs = on.candidates.select($"conv_a", $"conv_b")
      .as[(String, String)].collect().toSet
    assert(!onPairs.exists { case (a, b) => sameGroup(a, b) },
      "same-group pairs must be suppressed when groupGap=Some(0)")
    // pairs with any ungrouped or cross-group endpoint are untouched
    assert(onPairs == offPairs.filterNot { case (a, b) => sameGroup(a, b) },
      "suppression must only remove same-group pairs")
  }

  test("suppressGroups: same/adjacent-group pairs drop, distant/ungrouped survive") {
    import spark.implicits._
    val pairs = Seq(
      CandidatePair("a|b", "a", "b", 0.9, 0, "lsh"),  // same group
      CandidatePair("a|c", "a", "c", 0.9, 0, "lsh"),  // adjacent group
      CandidatePair("a|d", "a", "d", 0.9, 0, "lsh"),  // distant group
      CandidatePair("a|e", "a", "e", 0.9, 0, "lsh")   // e ungrouped
    ).toDS()
    val groups = Seq(("a", 10L), ("b", 10L), ("c", 11L), ("d", 50L))
      .toDF("conv_id", "group_id")
    val same = LshJoin.suppressGroups(pairs, groups, gap = 0)
      .collect().map(_.pair_key).toSet
    assert(same == Set("a|c", "a|d", "a|e"))
    val adj = LshJoin.suppressGroups(pairs, groups, gap = 1)
      .collect().map(_.pair_key).toSet
    assert(adj == Set("a|d", "a|e"))

    // duplicate conv_id rows in the groups table must not MULTIPLY surviving
    // pairs through the two left joins (ADVICE r03): output stays one row
    // per input pair
    val dupGroups = groups.unionAll(groups).unionAll(
      Seq(("d", 51L)).toDF("conv_id", "group_id"))
    val out = LshJoin.suppressGroups(pairs, dupGroups, gap = 0).collect()
    assert(out.length == out.map(_.pair_key).distinct.length,
      s"duplicated groups rows multiplied pairs: ${out.map(_.pair_key).toSeq}")
    assert(out.map(_.pair_key).toSet == Set("a|c", "a|d", "a|e"))
  }
}
