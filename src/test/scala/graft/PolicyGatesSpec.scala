package graft

import graft.operators.PolicyGates

/** Run-policy gate evaluator (local_eval_policy.py:23-31 analog): fixture
  * with hand-computed gate values, plus the groups-table cross axis. */
class PolicyGatesSpec extends SparkSpec {

  // (conv_a, conv_b, jaccard, simhash_dist, max_span_len, span_frac, tier)
  private def fixture = {
    import spark.implicits._
    Seq(
      ("c00000001", "d0_exact", 0.95, 0,  500, 0.90, "A"),     // anchor, A, cross
      ("c00000002", "d1_subst", 0.50, 10, 300, 0.40, "A"),     // span anchor, A, cross
      ("hn1_a",     "hn1_b",    0.10, 20, 50,  0.05, "other"), // FP proxy, same class
      ("c00000003", "c00000004",0.20, 12, 10,  0.00, "B"),     // FP proxy, same class
      ("c00000005", "d2_shuf",  0.40, 9,  100, 0.10, "B"),     // clean, cross
      ("c00000006", "d3_shuf",  0.80, 2,  250, 0.50, "B"))     // anchor but B
      .toDF("conv_a", "conv_b", "jaccard", "simhash_dist",
        "max_span_len", "span_frac", "tier")
  }

  test("gate values and pass flags match the hand computation") {
    val out = PolicyGates.evaluate(fixture).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getBoolean(3), r.getLong(4))))
      .toMap
    assert(out("fp_rate") == ((0.3333, 0.35, true, 6L)))          // 2/6
    assert(out("cross_group_ratio") == ((0.6667, 0.40, true, 6L))) // 4/6
    assert(out("tier_a_share") == ((0.3333, 0.05, true, 6L)))      // 2/6
    assert(out("anchor_precision") == ((0.6667, 0.90, false, 3L))) // 2/3 anchors A
  }

  test("groups table drives the cross axis; duplicate group rows don't multiply") {
    import spark.implicits._
    // put rows 1+2's endpoints in ONE group → only row 5/6 cross; ungrouped
    // endpoints always count as cross
    val groups = Seq(
      ("c00000001", 1L), ("d0_exact", 1L),
      ("c00000002", 2L), ("d1_subst", 2L),
      ("hn1_a", 3L), ("hn1_b", 3L),
      ("c00000003", 4L), ("c00000004", 4L),
      // duplicates that must not multiply the pair rows
      ("c00000001", 1L), ("d0_exact", 1L)
    ).toDF("conv_id", "group_id")
    val out = PolicyGates.evaluate(fixture, Some(groups)).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(4)))).toMap
    // cross pairs: rows 5 and 6 (ungrouped endpoints) → 2/6
    assert(out("cross_group_ratio") == ((0.3333, 6L)))
    assert(out("fp_rate")._2 == 6L, "duplicate group rows must not inflate n")
  }

  test("opaque uniform ids: heuristic cross gate abstains (pass=null), never false-fails") {
    import spark.implicits._
    // production-shaped ids with NO class prefix variation: the id-class
    // heuristic resolves everything to one class, so without a groups table
    // the cross-group gate must abstain rather than read 0 → fail
    // (VERDICT r04 wrong #2)
    import org.apache.spark.sql.functions.{abs, concat, hash, lit}
    val uniform = fixture
      .withColumn("conv_a", concat(lit("u"), abs(hash($"conv_a"))))
      .withColumn("conv_b", concat(lit("u"), abs(hash($"conv_b"))))
    val rows = PolicyGates.evaluate(uniform).collect()
      .map(r => r.getString(0) -> r).toMap
    val cross = rows("cross_group_ratio")
    assert(cross.isNullAt(3), s"degenerate heuristic must abstain, got ${cross.get(3)}")
    assert(cross.getDouble(1) == 0.0)
    // the other three gates are unaffected by id opacity
    assert(!rows("fp_rate").isNullAt(3) && rows("fp_rate").getBoolean(3))
    assert(!rows("tier_a_share").isNullAt(3))
    assert(!rows("anchor_precision").isNullAt(3))
    // and a groups table restores a real verdict on the same opaque ids
    val (idA, idB) = uniform.select($"conv_a", $"conv_b")
      .as[(String, String)].head()
    val groups = Seq((idA, 1L), (idB, 2L)).toDF("conv_id", "group_id")
    val withG = PolicyGates.evaluate(uniform, Some(groups)).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(!withG("cross_group_ratio").isNullAt(3),
      "groups-table mode must always produce a verdict")
  }

  test("corpus-probed degeneracy: collapsed detections on a classful corpus FAIL, opaque corpus abstains") {
    import spark.implicits._
    // detections all within one id class (the collapse the 0.40 threshold
    // guards against) — pairs-endpoint probing alone cannot distinguish
    // this from opaque ids and would abstain
    val collapsed = Seq(
      ("c00000001", "c00000002", 0.9, 1, 400, 0.8, "A"),
      ("c00000003", "c00000004", 0.8, 2, 300, 0.6, "A"))
      .toDF("conv_a", "conv_b", "jaccard", "simhash_dist",
        "max_span_len", "span_frac", "tier")
    // corpus ids DO carry classes (c*/d*/hn*): the gate must FAIL (ratio 0)
    val classful = Seq("c00000001", "c00000002", "c00000003", "c00000004",
      "d0_exact", "hn1_a").toDF("conv_id")
    val failed = PolicyGates.evaluate(collapsed, corpusIds = Some(classful))
      .collect().map(r => r.getString(0) -> r).toMap
    val cf = failed("cross_group_ratio")
    assert(!cf.isNullAt(3) && !cf.getBoolean(3),
      s"collapsed detections on a classful corpus must FAIL, got ${cf.get(3)}")
    // same detections but the whole corpus id space is one class: abstain
    val opaque = Seq("c00000001", "c00000002", "c00000003", "c00000004")
      .toDF("conv_id")
    val abstained = PolicyGates.evaluate(collapsed, corpusIds = Some(opaque))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(abstained("cross_group_ratio").isNullAt(3),
      "an opaque corpus id space must abstain")
  }

  test("empty input yields defined gates, anchor precision defaults pass, cross abstains") {
    val empty = fixture.limit(0)
    val out = PolicyGates.evaluate(empty).collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), if (r.isNullAt(3)) None else Some(r.getBoolean(3))))).toMap
    assert(out("fp_rate") == ((0.0, Some(true))))
    assert(out("anchor_precision") == ((1.0, Some(true))))
    assert(out("tier_a_share") == ((0.0, Some(false))))
    // zero pairs in heuristic mode: zero id classes → no cross verdict
    assert(out("cross_group_ratio") == ((0.0, None)))
  }
}
