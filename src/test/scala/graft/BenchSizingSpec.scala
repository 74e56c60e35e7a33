package graft

/**
 * Data-sized shuffle partitioning (Bench.sizeShuffleForCorpus): the knob
 * that bounds the pipeline's shuffled-hash-join build maps. Pinning it to
 * the core count OOM'd the 9.1M-turn corpus at local[8]; a flat 128 floor
 * doubled the candidate stage on a 460k-turn corpus (A/B in BASELINE.md).
 */
class BenchSizingSpec extends SparkSpec {

  private def withRestoredConf(body: => Unit): Unit = {
    val before = spark.sessionState.conf.numShufflePartitions
    try body
    finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("small corpus keeps the session's configured partitions") {
    withRestoredConf {
      val before = spark.sessionState.conf.numShufflePartitions
      val got = Bench.sizeShuffleForCorpus(spark, nTurns = 100000L)
      assert(got == before) // 100k turns / 64k < configured 8 → unchanged
      assert(spark.sessionState.conf.numShufflePartitions == before)
    }
  }

  test("large corpus raises partitions to ~64k turns per build shard") {
    withRestoredConf {
      val got = Bench.sizeShuffleForCorpus(spark, nTurns = 9114974L)
      assert(got == 9114974L / 64000L) // 142 — the validated OOM-free shard size
      assert(spark.sessionState.conf.numShufflePartitions == got)
    }
  }

  test("never lowers a caller's higher setting; caps at 4096") {
    withRestoredConf {
      spark.conf.set("spark.sql.shuffle.partitions", 500)
      assert(Bench.sizeShuffleForCorpus(spark, nTurns = 1000L) == 500)
      assert(Bench.sizeShuffleForCorpus(spark, nTurns = Long.MaxValue / 2) == 4096)
    }
  }

  test("the 4096 cap bounds only the data-derived value, never a caller's setting") {
    withRestoredConf {
      // an operator who pre-sized ABOVE the cap for a huge corpus keeps
      // their choice — capping after the max would silently downgrade the
      // session and re-grow every SHJ build map
      spark.conf.set("spark.sql.shuffle.partitions", 8192)
      assert(Bench.sizeShuffleForCorpus(spark, nTurns = Long.MaxValue / 2) == 8192)
      assert(spark.sessionState.conf.numShufflePartitions == 8192)
    }
  }
}
