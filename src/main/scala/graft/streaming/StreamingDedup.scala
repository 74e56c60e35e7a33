package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Column, DataFrame, Dataset}
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
    * payload body, iff cfg.maskToolPayloads — the SAME knob
    * Reassembly.assemble honors in the batch pipeline (masking it
    * unconditionally here would silently break the documented bit-equal
    * streaming/batch fingerprint parity for every tool-bearing
    * conversation whenever a user runs both with the knob off). */
  private def sigText(mask: Boolean)(t: Turn): String =
    if (mask && t.role == "tool") s"[tool:${Option(t.tool).getOrElse("?")}]"
    else t.text

  private def fold(cfg: DedupConfig): (ConvState, Turn) => ConvState = {
    val k = cfg.shingleK
    val (pa, pb) = Hashing.minhashParams(cfg.numPerms, cfg.minhashSeed)
    val sigOf = sigText(cfg.maskToolPayloads) _
    (st: ConvState, t: Turn) => {
    val th = TextKernel.tokenHashesFromNorm(TextKernel.normalize(sigOf(t)))
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

  /** Latest emitted fingerprint per conversation (n_turns is monotone under
    * mapGroupsWithState, so the max-n_turns row is the newest state). */
  private def latestPerConv(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val latest = Window.partitionBy(col("conv_id"))
      .orderBy(col("n_turns").desc, col("last_ts").desc)
    df.withColumn("rn", row_number().over(latest))
      .filter(col("rn") === 1).drop("rn")
  }

  /**
   * Fingerprint → SLIM band rows (conv_id, bkey) in ONE disjoint key space:
   *  - 4×16-bit simhash chunks (Hamming ≤ 3 guarantees ≥ 1 equal chunk by
   *    pigeonhole — DocDedup.simhashFingerprints' contract), keys mixed
   *    with the chunk index;
   *  - the incremental MinHash signature's LSH band keys — the SAME
   *    `TextKernel.bandKeys` banding the batch J3 join uses, so the
   *    streaming path has the batch path's near-dup recall, not just the
   *    exact/near-exact simhash tier.
   * Slim on purpose: these rows are what the incremental band STORE
   * accumulates — 16 bytes/row, never the 1 KB signature arrays.
   */
  private def bandRows(fps: DataFrame, cfg: DedupConfig): DataFrame = {
    val nKeys = cfg.bands * cfg.rows
    val bandUdf = udf((mh: Seq[Long]) =>
      if (mh == null || mh.isEmpty) Array.empty[Long]
      else {
        require(mh.length >= nKeys,
          s"minhash length ${mh.length} < bands*rows ($nKeys): fingerprints " +
            "were built under a different DedupConfig than the handoff's")
        TextKernel.bandKeys(mh.toArray, cfg.bands, cfg.rows)
      })
    val chunkKeys = array((0 until 4).map(i =>
      xxhash64(lit(0xC0 + i),
        shiftright(col("simhash"), 16 * i).bitwiseAND(lit(0xFFFFL)))): _*)
    fps.select(col("conv_id"),
      explode(concat(chunkKeys, bandUdf(col("minhash")))).as("bkey"))
  }

  /** Evidence for canonical (conv_a, conv_b) id pairs from a fingerprint
    * table: simhash Hamming + MinHash estimate, filtered by the batch path's
    * F1 predicate (Hamming ≤ maxDist OR est ≥ simThreshold). */
  private def evidencePairs(candIds: DataFrame, fps: DataFrame,
                            maxDist: Int, cfg: DedupConfig): DataFrame =
    candIds
      .join(fps.select(col("conv_id").as("conv_a"), col("simhash").as("sim_a"),
        col("minhash").as("mh_a")), "conv_a")
      .join(fps.select(col("conv_id").as("conv_b"), col("simhash").as("sim_b"),
        col("minhash").as("mh_b")), "conv_b")
      .select(col("conv_a"), col("conv_b"),
        graft.functions.GraftFunctions.hamming64(col("sim_a"), col("sim_b"))
          .as("hamming"),
        graft.functions.GraftFunctions.minhash_est(col("mh_a"), col("mh_b"))
          .as("minhash_est"))
      .filter(col("hamming") <= maxDist || col("minhash_est") >= cfg.simThreshold)

  /**
   * Incremental candidate join: a micro-batch DELTA of fingerprints vs an
   * accumulated corpus — the streaming handoff into the same LSH band-join
   * shape the batch path uses (equi-join on band key, never all-pairs).
   * Pairs are canonicalized (conv_a < conv_b) with evidence from each
   * conversation's LATEST fingerprint. Bounded-backfill API; the streaming
   * store path below never calls this (it joins against the MAINTAINED
   * band table instead of re-banding the corpus).
   */
  def incrementalCandidates(delta: DataFrame, corpus: DataFrame,
                            maxDist: Int = 3,
                            cfg: DedupConfig = DedupConfig.balanced): DataFrame = {
    val d = bandRows(delta, cfg).toDF("conv_new", "bkey")
    val c = bandRows(corpus, cfg).toDF("conv_old", "bkey")
    val candIds = d.join(c, Seq("bkey"))
      .filter(col("conv_new") =!= col("conv_old"))
      .select(
        least(col("conv_new"), col("conv_old")).as("conv_a"),
        greatest(col("conv_new"), col("conv_old")).as("conv_b"))
      .distinct()
    evidencePairs(candIds, latestPerConv(corpus.unionByName(delta)), maxDist, cfg)
  }

  /** Per-batch work ledger for the incremental store (S5 lineage analog and
    * the O(|delta|) evidence the scale contract rests on).
    * `n_store_files_scanned` records how many band-store part files the
    * batch's candidate join actually opened AFTER bucket pruning — the
    * bounded-I/O evidence (StreamingSpec asserts it stays flat while
    * unrelated buckets grow). */
  case class BatchWork(batch_id: Long, delta_fp: Long, n_delta: Long,
                       n_delta_band_rows: Long,
                       n_cand_ids: Long, n_new_pairs: Long,
                       n_store_files_scanned: Long, ts: String)

  /** Band-store partition-layout bucket of a band key: the store is laid
    * out as `bucket = pmod(bkey, storeBuckets)` partitions so a delta's
    * candidate join prunes to the directories its keys can possibly match
    * — the parquet-seam analog of an Iceberg `bucket(N, bkey)` spec
    * (reference analog: the per-file cache's keyed lookups,
    * similarity_engine.py:40-62, which never rescan unrelated entries). */
  private def bandBucket(bkey: Column, storeBuckets: Int): Column =
    pmod(bkey, lit(storeBuckets.toLong)).cast("int")

  /** Bucket-pruned view of the accumulated band store for a batch delta:
    * directory-level partition pruning on the delta's bucket set (≤
    * storeBuckets values, computed FROM the delta — one tiny distinct).
    * A store without a `bucket` column degrades to a full scan with
    * identical semantics (defense-in-depth only — requireBucketLayout
    * refuses to START a stream over a legacy flat store, because APPENDING
    * bucket partitions next to flat files would corrupt partition
    * discovery; compactStore is the migration path).
    * bkey-level IN-pushdown is deliberately
    * NOT attempted on the parquet seam — Spark only pushes tiny IN lists
    * into parquet (spark.sql.parquet.pushdown.inFilterThreshold) and a
    * band-key range is useless for xxhash-uniform keys; on Iceberg the
    * bucket transform gives the keyed lookup directly. */
  private def prunedBandStore(store: DataFrame, deltaBuckets: Seq[Int]): DataFrame =
    if (!store.columns.contains("bucket")) store.select("conv_id", "bkey")
    else store.where(col("bucket").isin(deltaBuckets: _*))
      .select("conv_id", "bkey")

  /** Persist-and-enforce the band store's bucket modulus: the pruning
    * filter is correct only when delta and store agree on `pmod(bkey, N)`,
    * so N is written to `{bands}_meta` on first start and every restart
    * (and `compactStore`) must pass the same value — failing LOUDLY beats
    * silently pruning away true matches. */
  private[graft] def requireBucketLayout(
      spark: org.apache.spark.sql.SparkSession,
      provider: graft.sources.TableProvider,
      bandsTbl: String, storeBuckets: Int): Unit = {
    import spark.implicits._
    val metaTbl = s"${bandsTbl}_meta"
    if (provider.exists(spark, metaTbl)) {
      val n = provider.read(spark, metaTbl).select("store_buckets")
        .head().getInt(0)
      require(n == storeBuckets,
        s"band store $bandsTbl was written with storeBuckets=$n; " +
          s"this run passed $storeBuckets — matching moduli are required " +
          s"for correct bucket pruning (run compactStore with the new value " +
          s"to re-layout)")
    } else {
      // no meta + an EXISTING band table = a pre-bucketing legacy store of
      // flat part files. Stamping the meta and appending bucket=N/
      // subdirectories next to them would corrupt Spark's partition
      // discovery on the next read ("conflicting directory structures") —
      // the stream would die one batch later. Refuse loudly; compactStore
      // is the sanctioned migration (it rewrites every band row under the
      // bucket layout and moves the meta with it).
      require(!provider.exists(spark, bandsTbl),
        s"band store $bandsTbl exists without a bucket layout (written by " +
          s"a pre-bucketing version): run compactStore(...) to migrate it " +
          s"before starting the incremental stream")
      provider.write(Seq(storeBuckets).toDF("store_buckets"), metaTbl)
    }
  }

  /**
   * foreachBatch wiring of the handoff — incremental-store shape (VERDICT
   * r03 wrong #2 fix). Per micro-batch, ONLY the delta is fingerprint-banded;
   * every store is maintained by APPEND, nothing is recomputed or rewritten:
   *
   *   {storeTbl}        append-only fingerprint log (latest row per conv =
   *                     max n_turns; compact offline if desired)
   *   {storeTbl}_bands  append-only slim band table (conv_id, bkey) — the
   *                     accumulated LSH index the delta joins against
   *   {pairsTbl}        append-only discovered pairs (evidence as of
   *                     discovery; the batch pipeline re-verifies downstream)
   *   {pairsTbl}_batchlog  one BatchWork row per batch
   *
   * Per-batch cost: band-key computation O(|delta|·(bands+4)); the band join
   * streams the BUCKET-PRUNED store band table through a broadcast-hash join
   * against the delta's keys (no shuffle, no recompute — the store is laid
   * out as pmod(bkey, storeBuckets) partitions, so only directories the
   * delta's keys can match are opened; an Iceberg seam does the same via a
   * bucket(N, bkey) spec with manifest pruning); fingerprint evidence is
   * fetched ONLY for matched conv_ids (broadcast semi-join pushdown into
   * the log scan); the already-seen-pair check prunes the pairs table to
   * rows touching matched convs before a broadcast anti-join. A
   * conversation whose fingerprint grows across batches appends fresh band
   * rows; its stale rows only ever produce extra candidate ids, which the
   * evidence join re-scores against the LATEST fingerprints.
   * Reference analog: the incremental cache reuse that re-runs only new
   * inputs (/root/reference/ai_pdf_panel_duplicate_check_AUTO.py:3356-3383).
   */
  def startIncremental(fps: Dataset[ConvFingerprint],
                       provider: graft.sources.TableProvider,
                       storeTbl: String, pairsTbl: String,
                       cfg: DedupConfig = DedupConfig.balanced,
                       maxDist: Int = 3,
                       storeBuckets: Int = 256)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val bandsTbl = s"${storeTbl}_bands"
    val logTbl = s"${pairsTbl}_batchlog"
    // Bucket-layout guard: the delta's bucket filter is only correct when
    // computed with the SAME modulus the store's rows were written with —
    // a restart passing a different storeBuckets would silently prune away
    // matching rows (recall loss with no error). The modulus is persisted
    // next to the band store on first start and enforced on every restart.
    requireBucketLayout(fps.sparkSession, provider, bandsTbl, storeBuckets)
    fps.writeStream.outputMode(OutputMode.Update())
      .foreachBatch { (batch: Dataset[ConvFingerprint], batchId: Long) =>
        applyBatch(batch.toDF(), batchId, provider, storeTbl, pairsTbl,
          cfg, maxDist, storeBuckets)
      }.start()
  }

  /** One micro-batch of the incremental handoff — extracted from the
    * foreachBatch lambda so re-delivery semantics are directly testable
    * (StreamingSpec calls it twice with the same batchId). */
  private[graft] def applyBatch(batchDf: DataFrame, batchId: Long,
                                provider: graft.sources.TableProvider,
                                storeTbl: String, pairsTbl: String,
                                cfg: DedupConfig, maxDist: Int,
                                storeBuckets: Int): Unit = {
        val bandsTbl = s"${storeTbl}_bands"
        val logTbl = s"${pairsTbl}_batchlog"
        val spark = batchDf.sparkSession
        import spark.implicits._
        // Idempotency under foreachBatch re-delivery (ADVICE r04): the
        // batchlog row is the batch's commit marker — a batch that already
        // logged is never re-applied, so a retried delivery cannot inflate
        // the append-only stores or the O(|delta|) work ledger. The marker
        // is (batch_id, delta CONTENT fingerprint), not batch_id alone:
        // foreachBatch batchIds are only unique within one run of a query —
        // a restarted stream without a durable checkpointLocation delivers
        // NEW data as batchId 0, 1, …, which a batch_id-only probe would
        // silently skip as "already applied" (permanent recall loss, no
        // error). Spark's redelivery contract is same-id ⇒ same content, so
        // the pair still dedupes true retries; an identical-content
        // collision across runs skips work that would have been a no-op
        // anyway (same fingerprints collapse in latestPerConv, same pairs
        // anti-join away). (The log is one row per batch, so this probe
        // scans a tiny table. A crash BETWEEN appends can still leave a
        // partial batch — exactly-once needs a transactional seam like
        // Iceberg — but the common redelivery-after-success path is closed,
        // and every partial-state append is individually harmless: dup
        // fingerprints collapse in latestPerConv, dup band rows only
        // re-nominate candidates, and pairs are anti-joined against the
        // store.)
        val delta = latestPerConv(batchDf).localCheckpoint(true)
        val nDelta = delta.count()
        // order-independent content hash of the deduped delta; bit_xor over
        // per-row xxhash64 is engine-stable and commutative, coalesce
        // covers the empty batch
        val deltaFp = if (nDelta == 0) 0L else delta
          .agg(coalesce(bit_xor(
            xxhash64(col("conv_id"), col("n_turns"), col("content_hash"))),
            lit(0L)))
          .head().getLong(0)
        // a batchlog written by the pre-fingerprint version lacks delta_fp:
        // fall back to the batch_id-only probe AND keep appending the old
        // schema (mixing schemas in one parquet dir would make reads
        // file-order-dependent); compactStore-era logs migrate naturally
        // when a fresh store is started
        val existingLog =
          if (provider.exists(spark, logTbl)) Some(provider.read(spark, logTbl))
          else None
        val legacyLog = existingLog.exists(!_.columns.contains("delta_fp"))
        val alreadyApplied = existingLog.exists { log =>
          val probe =
            if (legacyLog) log.filter(col("batch_id") === batchId)
            else log.filter(col("batch_id") === batchId &&
              col("delta_fp") === deltaFp)
          !probe.isEmpty
        }
        if (!alreadyApplied) {
        if (nDelta > 0) {
          val deltaBands = bandRows(delta, cfg)
            .withColumn("bucket", bandBucket(col("bkey"), storeBuckets))
            .localCheckpoint(true)
          val nDeltaBands = deltaBands.count()
          val dNew = broadcast(deltaBands
            .select(col("conv_id").as("conv_new"), col("bkey")))
          // delta vs maintained band store (bucket-pruned scan-only big
          // side) + delta vs itself (dups arriving in the same batch must
          // still pair). The pruned scan's actual file count is ledgered —
          // it is the bounded-I/O evidence; counting distinct file names
          // over the pruned view reads zero data columns (footers only).
          val deltaBuckets = deltaBands.select("bucket").distinct()
            .collect().map(_.getInt(0)).toSeq
          var nStoreFiles = 0L
          val crossIds =
            if (provider.exists(spark, bandsTbl)) {
              val pruned = prunedBandStore(
                provider.read(spark, bandsTbl), deltaBuckets)
              nStoreFiles = pruned.select(input_file_name().as("f"))
                .distinct().count()
              dNew.join(pruned.toDF("conv_old", "bkey"), "bkey")
                .select(col("conv_new"), col("conv_old"))
            } else spark.emptyDataset[(String, String)]
              .toDF("conv_new", "conv_old")
          val selfIds = dNew
            .join(deltaBands.select(col("conv_id").as("conv_old"), col("bkey")),
              "bkey")
            .select(col("conv_new"), col("conv_old"))
          val candIds = crossIds.unionByName(selfIds)
            .filter(col("conv_new") =!= col("conv_old"))
            .select(
              least(col("conv_new"), col("conv_old")).as("conv_a"),
              greatest(col("conv_new"), col("conv_old")).as("conv_b"))
            .distinct().localCheckpoint(true)
          val nCand = candIds.count()
          val nFresh = if (nCand > 0) {
            // latest fingerprints for EXACTLY the convs in play: the log is
            // pruned by a broadcast semi-join before the per-conv window
            val ids = candIds.select(col("conv_a").as("conv_id"))
              .union(candIds.select(col("conv_b").as("conv_id"))).distinct()
            val inPlay = delta.join(broadcast(ids), Seq("conv_id"), "left_semi")
            val fpUniverse =
              if (provider.exists(spark, storeTbl))
                latestPerConv(provider.read(spark, storeTbl)
                  .join(broadcast(ids), Seq("conv_id"), "left_semi")
                  .unionByName(inPlay))
              else inPlay
            val scored = evidencePairs(candIds, fpUniverse, maxDist, cfg)
            // already-seen pairs never re-append: prune the pairs table to
            // rows touching matched convs (scan-side semi-join), then a
            // broadcast anti-join on the (small) pruned set
            val fresh =
              if (provider.exists(spark, pairsTbl))
                scored.join(
                  provider.read(spark, pairsTbl).select("conv_a", "conv_b")
                    .join(broadcast(ids.toDF("conv_a")), Seq("conv_a"), "left_semi")
                    .hint("broadcast"),
                  Seq("conv_a", "conv_b"), "left_anti")
              else scored
            val freshCk = fresh.localCheckpoint(true)
            val n = freshCk.count()
            if (n > 0) provider.append(freshCk, pairsTbl)
            n
          } else 0L
          provider.append(delta, storeTbl)
          provider.appendPartitioned(deltaBands, bandsTbl, Seq("bucket"))
          val workRow = Seq(BatchWork(batchId, deltaFp, nDelta, nDeltaBands,
            nCand, nFresh, nStoreFiles,
            java.time.Instant.now.toString)).toDF()
          provider.append(
            if (legacyLog) workRow.drop("delta_fp") else workRow, logTbl)
        }
        } // !alreadyApplied
        ()
  }

  /**
   * Offline compaction of the append-only incremental stores (the Iceberg
   * `rewrite_data_files`/MERGE analog for the parquet seam): the fingerprint
   * log collapses to the latest row per conversation, the band table is
   * rebuilt from exactly those fingerprints (dropping stale generations'
   * band rows — they only cost extra candidate ids, but a long-running
   * stream should shed them periodically), and the pairs table dedupes.
   * Run it between micro-batch windows (e.g. from a maintenance trigger);
   * all inputs are materialized before their table is overwritten.
   */
  def compactStore(spark: org.apache.spark.sql.SparkSession,
                   provider: graft.sources.TableProvider,
                   storeTbl: String, pairsTbl: String,
                   cfg: DedupConfig = DedupConfig.balanced,
                   storeBuckets: Int = 256): Unit = {
    val bandsTbl = s"${storeTbl}_bands"
    if (provider.exists(spark, storeTbl)) {
      val latest = latestPerConv(provider.read(spark, storeTbl))
        .localCheckpoint(true)
      provider.write(latest, storeTbl)
      // rebuilt in the SAME bucket layout the incremental appends use, and
      // repartitioned so each bucket lands in exactly one task → ONE part
      // file per bucket: after compaction a delta's pruned scan opens at
      // most |delta buckets| files no matter how large the store has grown
      val bands = bandRows(latest, cfg)
        .withColumn("bucket", bandBucket(col("bkey"), storeBuckets))
        .repartition(storeBuckets, col("bucket"))
        .localCheckpoint(true)
      provider.writePartitioned(bands, bandsTbl, Seq("bucket"))
      // compaction is the sanctioned re-layout point: it rewrites EVERY
      // band row under the new modulus, so the meta moves with it
      import spark.implicits._
      provider.write(Seq(storeBuckets).toDF("store_buckets"), s"${bandsTbl}_meta")
    }
    if (provider.exists(spark, pairsTbl)) {
      val pairs = provider.read(spark, pairsTbl)
        .dropDuplicates("conv_a", "conv_b").localCheckpoint(true)
      provider.write(pairs, pairsTbl)
    }
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
