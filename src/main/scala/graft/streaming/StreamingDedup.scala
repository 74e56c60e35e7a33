package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.{Hashing, TextKernel}
import graft.model.Turn

/**
 * Structured Streaming ingestion path (SURVEY.md §2.10: the reference is
 * batch-only; this is the incremental-recompute analog of its
 * hash-validated caches, re-expressed as stateful streaming).
 *
 * Turns arrive as a stream; per-conversation state accumulates an
 * incremental signature (turn count, rolling content hash, simhash of the
 * token stream so far) via mapGroupsWithState. Event-time watermark bounds
 * state; a processing-time timeout finalizes idle conversations. Downstream,
 * finalized fingerprints feed the same LSH band join as batch.
 *
 * At scale this runs per-partition with state in the state store backend —
 * the keyBy(conv_id) shuffle is the only wide edge.
 */
object StreamingDedup {

  import graft.model.DedupConfig

  /**
   * Per-conversation incremental signature state. MinHash accumulates
   * per-shingle minima as turns arrive: `tailHashes` carries the last k−1
   * token hashes so shingles SPANNING a turn boundary are produced exactly
   * once, and `headHashes` keeps the first k−1 so a conversation that ends
   * shorter than k tokens can emit the batch kernel's whole-text shingle.
   * For IN-ORDER turn arrival the emitted minhash/simhash are BIT-EQUAL to
   * the batch `Signatures` kernel over the reassembled document
   * (StreamingSpec parity gate); out-of-order arrivals keep content_hash
   * exact (turn_idx-keyed XOR) and simhash exact (order-free votes) while
   * minhash misses only the boundary-spanning shingles of the gap.
   */
  case class ConvState(nTurns: Int, contentHash: Long, simhashVotes: Array[Int],
                       lastTs: Long, nTokens: Int, headHashes: Array[Long],
                       tailHashes: Array[Long], minhash: Array[Long])

  case class ConvFingerprint(conv_id: String, n_turns: Int, content_hash: Long,
                             simhash: Long, minhash: Array[Long],
                             last_ts: Timestamp, finalized: Boolean)

  /** Batch-parity masking: signature text sees the tool NAME, not the
    * payload body (Reassembly.assemble default). */
  private def sigText(t: Turn): String =
    if (t.role == "tool") s"[tool:${Option(t.tool).getOrElse("?")}]" else t.text

  private def fold(cfg: DedupConfig): (ConvState, Turn) => ConvState = {
    val k = cfg.shingleK
    val (pa, pb) = Hashing.minhashParams(cfg.numPerms, cfg.minhashSeed)
    (st: ConvState, t: Turn) => {
    val th = TextKernel.tokenHashes(TextKernel.tokens(TextKernel.normalize(sigText(t))))
    val votes = st.simhashVotes.clone()
    th.foreach { h =>
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    // every full k-window over (tail ++ new) contains ≥1 new token (the
    // tail is k−1 long), and every window ending in this turn's tokens is
    // here — so each shingle of the growing document updates the minima
    // exactly once
    val combined = st.tailHashes ++ th
    val sig = st.minhash.clone()
    var start = 0
    while (start + k <= combined.length) {
      var h = TextKernel.ShingleSeed
      var j = start
      while (j < start + k) { h = Hashing.xxh64Long(combined(j), h); j += 1 }
      var p = 0
      while (p < sig.length) {
        val v = pa(p) * h + pb(p)
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      start += 1
    }
    val newHead =
      if (st.headHashes.length >= k - 1) st.headHashes
      else (st.headHashes ++ th).take(k - 1)
    val newTail = combined.takeRight(k - 1)
    // order-sensitive rolling content hash keyed by turn_idx so late/out-of-
    // order arrivals of DIFFERENT turns still produce a deterministic value
    val ch = st.contentHash ^ Hashing.xxh64Long(
      Hashing.xxh64(t.text, TextKernel.TokenSeed) * 31 + t.turn_idx, 0x57AEA17L)
    ConvState(st.nTurns + 1, ch, votes,
      math.max(st.lastTs, if (t.ts == null) 0L else t.ts.getTime),
      st.nTokens + th.length, newHead, newTail, sig)
    }
  }

  private def toFingerprint(cfg: DedupConfig)(id: String, st: ConvState,
                                              finalized: Boolean): ConvFingerprint = {
    var sim = 0L
    var b = 0
    while (b < 64) { if (st.simhashVotes(b) > 0) sim |= (1L << b); b += 1 }
    // batch-kernel parity for documents shorter than k tokens: the batch
    // shingle set is ONE whole-text shingle (TextKernel.shingleSetFromHashes)
    val mh =
      if (st.nTokens > 0 && st.nTokens < cfg.shingleK) {
        val (pa, pb) = Hashing.minhashParams(cfg.numPerms, cfg.minhashSeed)
        var h = TextKernel.ShingleSeed
        st.headHashes.take(st.nTokens).foreach(t => h = Hashing.xxh64Long(t, h))
        TextKernel.minhash(Array(h), pa, pb)
      } else st.minhash
    ConvFingerprint(id, st.nTurns, st.contentHash, sim, mh,
      new Timestamp(st.lastTs), finalized)
  }

  /** Incremental per-conversation fingerprints over a (possibly streaming)
    * Dataset[Turn]. Emits an updated fingerprint per group per trigger.
    * Pass idleTimeoutMs = Some(ms) to finalize + evict idle conversations —
    * note a processing-time timeout makes Spark schedule batches
    * continuously (state expiry checks), so leave it None for
    * processAllAvailable-style tests and bounded backfills. */
  def incrementalFingerprints(turns: Dataset[Turn],
                              idleTimeoutMs: Option[Long] = None,
                              cfg: DedupConfig = DedupConfig.balanced): Dataset[ConvFingerprint] = {
    val spark = turns.sparkSession
    import spark.implicits._
    val timeoutConf = if (idleTimeoutMs.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout() else GroupStateTimeout.NoTimeout()
    val foldFn = fold(cfg)
    val emit = toFingerprint(cfg) _
    val initState = ConvState(0, 0L, new Array[Int](64), 0L, 0,
      Array.empty[Long], Array.empty[Long],
      Array.fill(cfg.numPerms)(Long.MaxValue))
    turns.groupByKey(_.conv_id)
      .mapGroupsWithState[ConvState, ConvFingerprint](timeoutConf) {
        case (id, it, state: GroupState[ConvState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            emit(id, st, true)
          } else {
            val st0 = state.getOption.getOrElse(initState)
            // deterministic fold order within the batch: sort by turn_idx
            val st = it.toSeq.sortBy(_.turn_idx).foldLeft(st0)(foldFn)
            state.update(st)
            idleTimeoutMs.foreach(ms => state.setTimeoutDuration(ms))
            emit(id, st, false)
          }
      }
  }

  // ---- streaming → LSH candidate handoff ---------------------------------

  /**
   * Fingerprint → band rows in ONE disjoint key space:
   *  - 4×16-bit simhash chunks (Hamming ≤ 3 guarantees ≥ 1 equal chunk by
   *    pigeonhole — DocDedup.simhashFingerprints' contract), keys mixed
   *    with the chunk index;
   *  - the incremental MinHash signature's LSH band keys — the SAME
   *    `TextKernel.bandKeys` banding the batch J3 join uses, so the
   *    streaming path has the batch path's near-dup recall, not just the
   *    exact/near-exact simhash tier.
   */
  private def bandRows(fps: DataFrame, cfg: DedupConfig): DataFrame = {
    val bandUdf = udf((mh: Seq[Long]) =>
      if (mh == null || mh.isEmpty) Array.empty[Long]
      else TextKernel.bandKeys(mh.toArray, cfg.bands, cfg.rows))
    val chunkKeys = array((0 until 4).map(i =>
      xxhash64(lit(0xC0 + i),
        shiftright(col("simhash"), 16 * i).bitwiseAND(lit(0xFFFFL)))): _*)
    fps.select(col("conv_id"), col("simhash"), col("minhash"),
      explode(concat(chunkKeys, bandUdf(col("minhash")))).as("bkey"))
  }

  /**
   * Incremental candidate join: a micro-batch DELTA of fingerprints vs an
   * accumulated corpus — the streaming handoff into the same LSH band-join
   * shape the batch path uses (equi-join on band key, never all-pairs).
   * Pairs are canonicalized (conv_a < conv_b), then verified by simhash
   * Hamming OR MinHash estimate (the F1 threshold), exactly the batch
   * evidence pair. Reference analog: the incremental cache reuse that lets
   * the reference re-run only new inputs
   * (/root/reference/ai_pdf_panel_duplicate_check_AUTO.py:3356-3383).
   */
  def incrementalCandidates(delta: DataFrame, corpus: DataFrame,
                            maxDist: Int = 3,
                            cfg: DedupConfig = DedupConfig.balanced): DataFrame = {
    val d = bandRows(delta, cfg).toDF("conv_new", "sim_new", "mh_new", "bkey")
    val c = bandRows(corpus, cfg).toDF("conv_old", "sim_old", "mh_old", "bkey")
    d.join(c, Seq("bkey"))
      .filter(col("conv_new") =!= col("conv_old"))
      .select(
        least(col("conv_new"), col("conv_old")).as("conv_a"),
        greatest(col("conv_new"), col("conv_old")).as("conv_b"),
        graft.functions.GraftFunctions.hamming64(col("sim_new"), col("sim_old"))
          .as("hamming"),
        graft.functions.GraftFunctions.minhash_est(col("mh_new"), col("mh_old"))
          .as("minhash_est"))
      .filter(col("hamming") <= maxDist || col("minhash_est") >= cfg.simThreshold)
      .groupBy(col("conv_a"), col("conv_b"))
      .agg(min(col("hamming")).as("hamming"),
        max(col("minhash_est")).as("minhash_est"))
  }

  /**
   * foreachBatch wiring of the handoff: per micro-batch, take each
   * conversation's LATEST fingerprint, band-join it against the accumulated
   * store (plus the batch itself, so dups arriving together still pair),
   * append the found pairs, and upsert the delta into the store. Store and
   * pairs live behind the TableProvider seam (parquet here; Iceberg tables
   * on a cluster). At scale the only wide edge per batch is the chunk
   * equi-join of |delta| rows vs the store's band table.
   */
  def startIncremental(fps: Dataset[ConvFingerprint],
                       provider: graft.sources.TableProvider,
                       storeTbl: String, pairsTbl: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.expressions.Window
    fps.writeStream.outputMode(OutputMode.Update())
      .foreachBatch { (batch: Dataset[ConvFingerprint], _: Long) =>
        val spark = batch.sparkSession
        val latest = Window.partitionBy(col("conv_id"))
          .orderBy(col("n_turns").desc, col("last_ts").desc)
        def latestPerConv(df: DataFrame): DataFrame =
          df.withColumn("rn", row_number().over(latest))
            .filter(col("rn") === 1).drop("rn")
        // materialize BEFORE any overwrite of a table being read
        val delta = latestPerConv(batch.toDF()).localCheckpoint(true)
        val store = if (provider.exists(spark, storeTbl))
          Some(provider.read(spark, storeTbl)) else None
        val universe = store.map(_.unionByName(delta)).getOrElse(delta)
        val newPairs = incrementalCandidates(delta, universe)
        val allPairs = (if (provider.exists(spark, pairsTbl))
            provider.read(spark, pairsTbl).unionByName(newPairs)
              .dropDuplicates("conv_a", "conv_b")
          else newPairs).localCheckpoint(true)
        provider.write(allPairs, pairsTbl)
        val merged = latestPerConv(universe).localCheckpoint(true)
        provider.write(merged, storeTbl)
        ()
      }.start()
  }

  /** Watermarked sliding-window turn-rate aggregation (event-time windows —
    * the streaming analog of the per-stage funnel metrics). */
  def turnRates(turns: DataFrame): DataFrame =
    turns
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("role"))
      .agg(count(lit(1)).as("n_turns"),
        approx_count_distinct(col("conv_id")).as("n_convs"))
}
