package graft

import graft.model.DedupConfig
import graft.sources.ConversationGen
import graft.tools.ParamSweep
import graft.tools.ParamSweep.SweepResult

/** Config sweep harness (param_grid_sweep.py analog): deterministic ranking
  * + a real two-preset sweep over the smoke corpus. */
class ParamSweepSpec extends SparkSpec {

  private def row(p: String, passes: Int, rec: Double, fp: Double) =
    SweepResult(p, 0.25, 64, 2, 0.32, 100L, passes, fp, 0.5, 0.1, 1.0, rec)

  test("ranking is deterministic and total-ordered") {
    val rows = Seq(
      row("a", 3, 0.95, 0.10),
      row("b", 4, 0.90, 0.20),
      row("c", 4, 0.95, 0.20),
      row("d", 4, 0.95, 0.10),
      row("e", 4, 0.95, 0.10)) // ties with d on every metric → name breaks it
    val ranked = ParamSweep.rank(rows).map(_.preset)
    assert(ranked == Seq("d", "e", "c", "b", "a"))
    // permutation-invariant (determinism under input order)
    val perms = Seq(rows.reverse, rows.sortBy(_.fp_rate), scala.util.Random.shuffle(rows))
    perms.foreach(p => assert(ParamSweep.rank(p).map(_.preset) == ranked))
  }

  test("real sweep over the smoke corpus scores and ranks presets") {
    val turns = ConversationGen.corpus(spark, ConversationGen.smoke).persist()
    val gt = Some(ConversationGen.gtDataset(spark, ConversationGen.smoke))
    val cfgs = Seq("balanced" -> DedupConfig.balanced,
      "precise" -> DedupConfig.precise)
    val out = ParamSweep.sweep(turns, cfgs, gt)
    assert(out.map(_.preset).toSet == Set("balanced", "precise"))
    val byName = out.map(r => r.preset -> r).toMap
    // balanced catches every planted transform on the smoke corpus; precise
    // (LSH threshold ≈ 0.71) by design only keeps strong near-dups
    assert(byName("balanced").gt_recall >= 0.95,
      s"balanced recall ${byName("balanced").gt_recall}")
    assert(byName("balanced").gt_recall >= byName("precise").gt_recall)
    out.foreach { r =>
      assert(r.n_pairs > 0 && r.policy_passes >= 0 && r.policy_passes <= 4)
      assert(r.fp_rate >= 0.0 && r.anchor_precision >= 0.0)
    }
    // ranking of the real results is reproducible
    assert(ParamSweep.rank(out) == out)
  }
}
