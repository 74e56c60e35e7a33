package graft

import graft.model.DedupConfig
import graft.sources.ConversationGen
import graft.tools.AbTest

/** Paired preprocessing A/B harness (clahe_ab_test.py analog): per-category
  * delta report over planted ground truth. */
class AbTestSpec extends SparkSpec {

  test("identical configs produce zero deltas across every category") {
    val turns = ConversationGen.corpus(spark, ConversationGen.smoke)
    val cfg = DedupConfig.balanced
    val rep = AbTest.compare(turns, ConversationGen.gtPairs(ConversationGen.smoke),
      cfg, cfg, runId = "ab_same").collect()
    assert(rep.nonEmpty)
    rep.foreach { r =>
      assert(r.getDouble(r.fieldIndex("delta_detect")) == 0.0, r.toString)
      assert(r.getDouble(r.fieldIndex("delta_jaccard")) == 0.0, r.toString)
      assert(r.getDouble(r.fieldIndex("delta_est")) == 0.0, r.toString)
    }
  }

  test("mask A/B reports one row per planted category with sane values") {
    val spec = ConversationGen.smoke
    val turns = ConversationGen.corpus(spark, spec)
    val gt = ConversationGen.gtPairs(spec)
    val rep = AbTest.compare(turns, gt,
      DedupConfig.balanced, DedupConfig.balanced.copy(maskToolPayloads = false),
      runId = "ab_mask").collect()
    val cats = rep.map(_.getString(0)).toSet
    val expected = gt.map(_.transform_type).toSet
    assert(cats == expected, s"categories $cats != planted $expected")
    // category row counts match the planted manifest
    val nByCat = gt.groupBy(_.transform_type).view.mapValues(_.size.toLong).toMap
    rep.foreach { r =>
      assert(r.getLong(r.fieldIndex("n")) == nByCat(r.getString(0)), r.toString)
      Seq("detect_a", "detect_b").foreach { c =>
        val v = r.getDouble(r.fieldIndex(c))
        assert(v >= 0.0 && v <= 1.0, s"$c out of range in $r")
      }
    }
    // both arms must detect exact duplicates regardless of masking
    val exact = rep.find(_.getString(0) == "exact").get
    assert(exact.getDouble(exact.fieldIndex("detect_a")) == 1.0)
    assert(exact.getDouble(exact.fieldIndex("detect_b")) == 1.0)
    // hard negatives appear as an FP-rate row, low in both arms
    val hn = rep.find(_.getString(0) == "hard_negative").get
    assert(hn.getDouble(hn.fieldIndex("detect_a")) <= 0.1)
    assert(hn.getDouble(hn.fieldIndex("detect_b")) <= 0.1)
    // the knob must be LOAD-BEARING: arm B (mask off) sees tool payload
    // bodies arm A masks away, so SOME category's evidence must shift —
    // if every delta is zero, cfgB never reached the second arm and the
    // harness is comparing a config against itself
    assert(rep.exists { r =>
      r.getDouble(r.fieldIndex("delta_detect")) != 0.0 ||
        r.getDouble(r.fieldIndex("delta_jaccard")) != 0.0 ||
        r.getDouble(r.fieldIndex("delta_est")) != 0.0
    }, s"mask-off arm identical to masked arm across every category:\n" +
      rep.map(_.toString).mkString("\n"))
  }
}
