package graft

import graft.functions.Hashing
import graft.operators.RobustStats

/**
 * X14 robust-outlier engines: the exact `percentile` path (oracle parity)
 * and its bounded-memory `approx_percentile` scale twin must agree when
 * groups fit inside the sketch accuracy (VERDICT r02 "What's wrong #5" —
 * the engine needs a variant a hot key with 10⁸ rows cannot OOM).
 */
class RobustStatsSpec extends SparkSpec {

  test("approx engine flags the same outliers as exact on bounded groups") {
    import spark.implicits._
    // 50 users × 201 values in [0, 10] (robust z ≤ ~1.4, far below the 3.5
    // gate) + a planted +500 spike for every 5th user (z ≫ 10): no value
    // sits near the decision boundary, so a sub-ULP median difference
    // between engines cannot flip a flag
    val rows = for { u <- 0 until 50; i <- 0 until 201 } yield {
      val h = Hashing.mix64(u * 1000L + i)
      val base = java.lang.Long.remainderUnsigned(h, 1000L).toDouble / 100.0
      val v = if (i == 200 && u % 5 == 0) base + 500.0 else base
      (u.toLong * 1000 + i, s"u$u", v)
    }
    val events = rows.toDF("event_id", "user_id", "value")
    val exIds = RobustStats.madOutliers(events, exact = true)
      .select($"event_id").as[Long].collect().toSet
    val apIds = RobustStats.madOutliers(events, exact = false)
      .select($"event_id").as[Long].collect().toSet
    // EXACT flag set, not containment: the planted spikes and NOTHING else
    // — cross-engine agreement alone would stay green if a loosened gate
    // flooded false positives identically through both engines
    val planted = (0 until 50 by 5).map(_.toLong * 1000 + 200).toSet
    assert(exIds == planted,
      s"flag set != planted spikes: extra=${exIds -- planted}, missed=${planted -- exIds}")
    assert(exIds == apIds,
      s"engines disagree: only-exact=${exIds -- apIds}, only-approx=${apIds -- exIds}")
  }

  test("a zero-MAD group still flags its deviant (no blanket immunity)") {
    import spark.implicits._
    // >50% identical values → median = 5, MAD = 0; the 1e9 event is
    // blatantly an outlier and the old filter(mad > 1e-9) silently dropped
    // the whole group. The constant-valued group (u2) must stay silent.
    val events = Seq(
      (1L, "u1", 5.0), (2L, "u1", 5.0), (3L, "u1", 5.0),
      (4L, "u1", 5.0), (5L, "u1", 5.0), (6L, "u1", 1e9),
      (10L, "u2", 7.0), (11L, "u2", 7.0), (12L, "u2", 7.0))
      .toDF("event_id", "user_id", "value")
    val out = RobustStats.madOutliers(events, exact = true)
      .select($"event_id", $"robust_z").as[(Long, Double)].collect().toMap
    assert(out.keySet == Set(6L),
      s"expected exactly the 1e9 spike flagged, got ${out.keySet}")
    assert(out(6L) == 9999.0)
  }
}
