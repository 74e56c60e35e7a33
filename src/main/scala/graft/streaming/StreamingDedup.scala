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

  case class ConvState(nTurns: Int, contentHash: Long, simhashVotes: Array[Int],
                       lastTs: Long)

  case class ConvFingerprint(conv_id: String, n_turns: Int, content_hash: Long,
                             simhash: Long, last_ts: Timestamp, finalized: Boolean)

  private def fold(st: ConvState, t: Turn): ConvState = {
    val toks = TextKernel.tokens(TextKernel.normalize(t.text))
    val votes = st.simhashVotes.clone()
    toks.foreach { tok =>
      val h = Hashing.xxh64(tok, TextKernel.TokenSeed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    // order-sensitive rolling content hash keyed by turn_idx so late/out-of-
    // order arrivals of DIFFERENT turns still produce a deterministic value
    val ch = st.contentHash ^ Hashing.xxh64Long(
      Hashing.xxh64(t.text, TextKernel.TokenSeed) * 31 + t.turn_idx, 0x57AEA17L)
    ConvState(st.nTurns + 1, ch, votes,
      math.max(st.lastTs, if (t.ts == null) 0L else t.ts.getTime))
  }

  private def toFingerprint(id: String, st: ConvState, finalized: Boolean): ConvFingerprint = {
    var sim = 0L
    var b = 0
    while (b < 64) { if (st.simhashVotes(b) > 0) sim |= (1L << b); b += 1 }
    ConvFingerprint(id, st.nTurns, st.contentHash, sim,
      new Timestamp(st.lastTs), finalized)
  }

  /** Incremental per-conversation fingerprints over a (possibly streaming)
    * Dataset[Turn]. Emits an updated fingerprint per group per trigger.
    * Pass idleTimeoutMs = Some(ms) to finalize + evict idle conversations —
    * note a processing-time timeout makes Spark schedule batches
    * continuously (state expiry checks), so leave it None for
    * processAllAvailable-style tests and bounded backfills. */
  def incrementalFingerprints(turns: Dataset[Turn],
                              idleTimeoutMs: Option[Long] = None): Dataset[ConvFingerprint] = {
    val spark = turns.sparkSession
    import spark.implicits._
    val timeoutConf = if (idleTimeoutMs.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout() else GroupStateTimeout.NoTimeout()
    turns.groupByKey(_.conv_id)
      .mapGroupsWithState[ConvState, ConvFingerprint](timeoutConf) {
        case (id, it, state: GroupState[ConvState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            toFingerprint(id, st, finalized = true)
          } else {
            val st0 = state.getOption.getOrElse(
              ConvState(0, 0L, new Array[Int](64), 0L))
            // deterministic fold order within the batch: sort by turn_idx
            val st = it.toSeq.sortBy(_.turn_idx).foldLeft(st0)(fold)
            state.update(st)
            idleTimeoutMs.foreach(ms => state.setTimeoutDuration(ms))
            toFingerprint(id, st, finalized = false)
          }
      }
  }

  // ---- streaming → LSH candidate handoff ---------------------------------

  /** Fingerprint → LSH chunk-band rows: the 4×16-bit simhash decomposition
    * (Hamming ≤ 3 guarantees ≥ 1 equal chunk by pigeonhole — the same
    * banding contract as the batch path, DocDedup.simhashFingerprints). */
  private def chunkBands(fps: DataFrame): DataFrame =
    fps.select(col("conv_id"), col("simhash"),
      posexplode(array(
        col("simhash").bitwiseAND(lit(0xFFFFL)),
        shiftright(col("simhash"), 16).bitwiseAND(lit(0xFFFFL)),
        shiftright(col("simhash"), 32).bitwiseAND(lit(0xFFFFL)),
        shiftright(col("simhash"), 48).bitwiseAND(lit(0xFFFFL))))
        .as(Seq("chunk_id", "chunk_val")))

  /**
   * Incremental candidate join: a micro-batch DELTA of fingerprints vs an
   * accumulated corpus — the streaming handoff into the same LSH band-join
   * shape the batch path uses (equi-join on band key, never all-pairs).
   * Pairs are canonicalized (conv_a < conv_b) and Hamming-verified.
   * Reference analog: the incremental cache reuse that lets the reference
   * re-run only new inputs (/root/reference/ai_pdf_panel_duplicate_check_
   * AUTO.py:3356-3383).
   */
  def incrementalCandidates(delta: DataFrame, corpus: DataFrame,
                            maxDist: Int = 3): DataFrame = {
    val d = chunkBands(delta).toDF("conv_new", "sim_new", "chunk_id", "chunk_val")
    val c = chunkBands(corpus).toDF("conv_old", "sim_old", "chunk_id", "chunk_val")
    d.join(c, Seq("chunk_id", "chunk_val"))
      .filter(col("conv_new") =!= col("conv_old"))
      .select(
        least(col("conv_new"), col("conv_old")).as("conv_a"),
        greatest(col("conv_new"), col("conv_old")).as("conv_b"),
        graft.functions.GraftFunctions.hamming64(col("sim_new"), col("sim_old"))
          .as("hamming"))
      .filter(col("hamming") <= maxDist)
      .dropDuplicates("conv_a", "conv_b")
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
