package graft

import org.apache.spark.sql.SparkSession

/**
 * Two-cluster-size scaling evidence (BASELINE.json north_rule): the same
 * dedup job on the same input at two parallelism levels — the sandbox proxy
 * for N vs 4N executors. Prints one JSON line with throughput at both
 * levels and the scaling efficiency (= (thrLarge / thrSmall) / factor).
 *
 * Methodology:
 *  - One warm-up pipeline run pays JVM/codegen warmup outside measurement.
 *  - Each level is measured `reps` times ALTERNATING (small, large, small,
 *    large, …) and the median is used — this box shows ±30% run-to-run
 *    noise, so single runs are meaningless.
 *  - A pure-JVM multithreaded hash loop measures the HARDWARE's own
 *    scaling ceiling between the same two thread counts (the host
 *    advertises 32 CPUs but sustains only ~2.7× more raw hash throughput
 *    at 32 threads than at 8 — SMT / vCPU throttling). `efficiency_vs_hw`
 *    = job efficiency / hardware efficiency isolates what the JOB loses
 *    to serial sections and shuffle, which is the quantity the N→4N
 *    executor criterion is about (real executors add real cores).
 *  - The corpus is generated deterministically, so both levels process
 *    identical data.
 */
object ScalingBench {

  // ---- hardware calibration: raw parallel hash throughput ----------------
  private def burn(iters: Long): Long = {
    var x = 0L; var i = 0L
    while (i < iters) { x ^= functions.Hashing.mix64(x + i); i += 1 }
    x
  }

  /** ops/sec sustained by `threads` concurrent hash loops. */
  private def calibrate(threads: Int, iters: Long = 300000000L): Double = {
    val sink = new java.util.concurrent.atomic.AtomicLong()
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { _ =>
      val t = new Thread(() => { sink.addAndGet(burn(iters)) })
      t.start(); t
    }
    ts.foreach(_.join())
    threads.toDouble * iters / ((System.nanoTime() - t0) / 1e9)
  }

  private def timedRun(cpus: Int, nBase: Long,
                       floorParts: Int): (Long, Double, Map[String, Double]) = {
    val spark = Bench.session(cpus.toString)
    try {
      val spec = sources.ConversationGen.CorpusSpec(nBase, 60, 400)
      // persist + count BEFORE the clock: the timed window measures the
      // dedup job, not synthetic-input generation
      val corpus = sources.ConversationGen.corpus(spark, spec).persist()
      val nTurns = corpus.count()
      // identical-plan guarantee at ANY corpus size: sizeShuffleForCorpus
      // floors at the session's OWN core count, so for corpora whose
      // data-derived value sits below the large level's cores the two
      // levels would get different shuffle-partition counts (different
      // physical plans — the exact confound this methodology removes).
      // Both levels therefore also floor at the LARGE level's core count,
      // passed in as floorParts; at the gate corpora (2.3M/9.1M turns:
      // 36/142 partitions) the data term dominates and this is a no-op.
      val parts = math.max(Bench.sizeShuffleForCorpus(spark, nTurns), floorParts)
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val t0 = System.nanoTime()
      val result = operators.Pipeline.runPipelined(corpus, model.DedupConfig.balanced)
      result.clusters.count()
      val stages = result.metrics.filter(_.duration_ms >= 0)
        .map(m => m.stage -> m.duration_ms / 1000.0).toMap
      (nTurns, (System.nanoTime() - t0) / 1e9, stages)
    } finally spark.stop()
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted; s(s.length / 2)
  }

  def main(args: Array[String]): Unit = {
    val nBase = sys.env.getOrElse("SPARK_GRAFT_SCALE_CONVS", "40000").toLong
    val small = sys.env.getOrElse("SPARK_GRAFT_SCALE_SMALL", "8").toInt
    val large = sys.env.getOrElse("SPARK_GRAFT_SCALE_LARGE", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "3").toInt
    val factor = large.toDouble / small

    // hardware ceiling between the same two thread counts
    val hwSmall = calibrate(small)
    val hwLarge = calibrate(large)
    val hwEff = (hwLarge / hwSmall) / factor

    // Warm-up (JIT/codegen) outside measurement — at BOTH levels with a
    // mid-size corpus. With only a smoke-corpus warm-up at the small level,
    // the first measured large-level rep paid the whole C2/codegen warm-in
    // inside its window (observed +95% vs its own steady state, which
    // poisons a 3-rep median); a substantive run per level moves that cost
    // outside the measured reps for both.
    val warmConvs = sys.env.getOrElse("SPARK_GRAFT_SCALE_WARM_CONVS", "10000").toLong
    Seq(small, large).foreach { cpus =>
      val warm = Bench.session(cpus.toString)
      try {
        val c = sources.ConversationGen.corpus(warm,
          sources.ConversationGen.CorpusSpec(warmConvs, 20, 100)).persist()
        c.count()
        val r = operators.Pipeline.runPipelined(c, model.DedupConfig.balanced,
          runId = s"warm$cpus")
        r.clusters.count()
      } finally warm.stop()
    }

    // Alternating measured runs; medians defeat the host's ±30% noise.
    // The FIRST pair at the target corpus size is discarded by default:
    // across independent sessions the first full-size run per level is
    // systematically ~1.8× its own steady state (observed 660 s vs
    // 355/373 s on back-to-back runs — size-dependent warm-in the mid-size
    // warm-up does not cover), which would bias a 3-rep median. Discarded
    // runs are still published in the JSON.
    val discard = sys.env.getOrElse("SPARK_GRAFT_SCALE_DISCARD", "1").toInt
    val secS = collection.mutable.ArrayBuffer[Double]()
    val secL = collection.mutable.ArrayBuffer[Double]()
    val dropS = collection.mutable.ArrayBuffer[Double]()
    val dropL = collection.mutable.ArrayBuffer[Double]()
    val stagesS = collection.mutable.ArrayBuffer[Map[String, Double]]()
    val stagesL = collection.mutable.ArrayBuffer[Map[String, Double]]()
    var nTurns = 0L
    (1 to reps + discard).foreach { i =>
      val (n1, s1, st1) = timedRun(small, nBase, large); nTurns = n1
      val (n2, s2, st2) = timedRun(large, nBase, large); require(n1 == n2)
      if (i > discard) { secS += s1; secL += s2; stagesS += st1; stagesL += st2 }
      else { dropS += s1; dropL += s2 }
    }
    // per-stage medians at each level: every scaling run self-reports its
    // decomposition, so a ratio regression is attributable without a
    // separate profiling session
    def stageMedians(ms: Seq[Map[String, Double]]): Seq[(String, Double)] =
      ms.flatMap(_.keys).distinct.sorted.map { k =>
        k -> median(ms.map(_.getOrElse(k, 0.0)))
      }
    def stageJson(ms: Seq[Map[String, Double]]): String =
      stageMedians(ms).map { case (k, v) => s""""$k":${f"$v%.1f"}""" }
        .mkString("{", ",", "}")
    val mS = median(secS.toSeq); val mL = median(secL.toSeq)
    val thrS = nTurns / mS; val thrL = nTurns / mL
    val eff = (thrL / thrS) / factor
    val effVsHw = eff / hwEff
    println(s"""{"metric":"scaling_efficiency","value":${f"$eff%.3f"},"unit":"ratio","n_turns":$nTurns,"parallelism_small":$small,"parallelism_large":$large,"reps":$reps,"sec_small":${f"$mS%.2f"},"sec_large":${f"$mL%.2f"},"turns_per_sec_small":${f"$thrS%.1f"},"turns_per_sec_large":${f"$thrL%.1f"},"hw_efficiency_ceiling":${f"$hwEff%.3f"},"efficiency_vs_hw":${f"$effVsHw%.3f"},"runs_small_sec":[${secS.map(s => f"$s%.1f").mkString(",")}],"runs_large_sec":[${secL.map(s => f"$s%.1f").mkString(",")}],"discarded_small_sec":[${dropS.map(s => f"$s%.1f").mkString(",")}],"discarded_large_sec":[${dropL.map(s => f"$s%.1f").mkString(",")}],"stage_sec_small":${stageJson(stagesS.toSeq)},"stage_sec_large":${stageJson(stagesL.toSeq)}}""")
  }
}
