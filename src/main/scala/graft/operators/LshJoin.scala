package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Observation}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.{CandidatePair, DedupConfig, DocSig}

/**
 * LSH-banding candidate self-join (SURVEY.md §2.4 J3/J4) — the Spark
 * re-expression of the reference's hash-prefix bucketed pair generation
 * (/root/reference/ai_pdf_panel_duplicate_check_AUTO.py:4002-4069) and its
 * bundle variant (similarity_engine.py:468-583).
 *
 * Shape: explode band keys → eliminate singleton buckets → SALT over-cap
 * buckets into cap-sized sub-buckets (deterministic conv_id hash) →
 * within-sub-bucket pair ENUMERATION over the sorted, cap-bounded member
 * list of each (bucket, salt) group (`a.conv_id < b.conv_id` upper
 * triangle, emitted by a generator — no self-join, no second band-table
 * shuffle) + one bridge chain linking sub-bucket representatives (so a
 * salted mega-family still forms ONE connected component downstream) →
 * per-pair dedup keeping the lowest band id → join MinHash signatures back
 * per endpoint → estimate filter → per-doc output cap.
 *
 * Skew armor (the part the reference lacks — its giant-bucket loop at
 * ai_...AUTO.py:4037-4045 is O(bucket²) unconditionally):
 *   - over-cap buckets are never dropped: each member still meets O(cap)
 *     partners inside its salted sub-bucket, and bridges keep the bucket
 *     connected — worst-case pair fan-out per bucket is O(bucket·cap)
 *     instead of O(bucket²);
 *   - the SAME salt-and-cap discipline applies to the J4 bundle-variant
 *     path, so an m-member boilerplate family of identical conversations
 *     costs O(m·cap) pairs, not m²/2;
 *   - the output cap is PER DOCUMENT (reference analog
 *     TILE_MAX_TILES_PER_PANEL, tile_detection.py:36), not one global
 *     TakeOrderedAndProject funneling every pair through the driver: a pair
 *     survives if either endpoint ranks it in its top-maxPairsPerDoc by
 *     (bundle-evidence-first, estimate desc) — bundle/exact hits can never
 *     be evicted by a band flood of high-estimate LSH pairs.
 *
 * Scale discipline: the exploded band table carries ONLY (conv_id, band_id,
 * band_key) — 24 bytes/row — never the signature arrays; signatures join in
 * AFTER pair dedup, so the wide shuffles stay narrow (at 21k docs this cut
 * the candidate stage ~5x).
 */
object LshJoin {

  case class CapStats(totalBuckets: Long, pairedBuckets: Long, saltedBuckets: Long)


  /** Exploded (conv_id, band_id, band_key) table — deliberately array-free. */
  private def bandTable(sigs: Dataset[DocSig]): DataFrame =
    sigs.select(col("conv_id"),
      posexplode(col("bands")).as(Seq("band_id", "band_key")))

  /**
   * Within-bucket pair generation with singleton-drop + salted sub-bucketing
   * for over-cap buckets. `items` must have (conv_id, <keys...>); emits
   * (conv_a, conv_b, band_id, source) with conv_a < conv_b.
   *
   * Salt is keyed on conv_id ONLY, so a mega-family sub-buckets identically
   * in every band — unique pair volume stays O(m·cap) across all bands
   * rather than O(m·cap·bands). Connectivity across sub-buckets comes from
   * the bridge chain: per over-cap bucket, the min conv_id of each
   * sub-bucket is linked to the next sub-bucket's representative.
   */
  // source codes kept as 1 byte through the 10⁶-row pair union + dedup agg
  // (strings there were measurable shuffle weight): bridge = base + 2
  private final val SrcLsh = 0
  private final val SrcBundle = 1

  /** The unified (band ∪ bundle-variant) bucket-item table the candidate
    * join buckets on — one codegen lsh_items generator pass over the sigs
    * checkpoint (see the provenance note in `candidates`). Exposed for the
    * bucket-phase plan dumps (the phase is checkpointed inside
    * saltedBucketPairs, so its plan is invisible from the returned pairs). */
  private[graft] def itemsFor(sigs: Dataset[DocSig]): DataFrame =
    sigs.select(col("conv_id"),
        explode(graft.functions.GraftFunctions.lsh_items(
          col("bands"), col("simhash_bundle"))).as("e"))
      .select(col("conv_id"), col("e.bkey").as("bkey"),
        col("e.band_id").as("band_id"), col("e.src").as("src"))

  /** The bucket phase's sized/salted/grouped member table — one row per
    * (bkey, salt) sub-bucket with the sorted, cap-bounded member list.
    * Exposed un-checkpointed for plan dumps/specs (saltedBucketPairs
    * checkpoints it, which hides the plan from the returned Dataset). */
  private[graft] def groupedMembers(items: DataFrame, cap: Int,
                                    obs: Option[Observation]): DataFrame = {
    val parts = items.sparkSession.sessionState.conf.numShufflePartitions
    val itemsP = items.repartition(parts, col("bkey"))
    // buckets are source-homogeneous (disjoint key spaces), so min(src) is
    // the bucket's source; the observation reports the LSH band-bucket
    // funnel only — same counts the old per-rep-row window flags produced,
    // now over one row per bucket
    val sized = itemsP.groupBy(col("bkey")).agg(
      count(lit(1)).as("bsz"), min(col("src")).as("bsrc"))
    val sizedObs = obs.map(o => sized.observe(o,
        sum(when(col("bsrc") === SrcLsh, 1L).otherwise(0L)).as("total_buckets"),
        sum(when(col("bsrc") === SrcLsh && col("bsz") >= 2, 1L).otherwise(0L)).as("paired_buckets"),
        sum(when(col("bsrc") === SrcLsh && col("bsz") > cap, 1L).otherwise(0L)).as("salted_buckets")))
      .getOrElse(sized)
    // paired buckets only — the inner join below replicates the old
    // bsz >= 2 filter (singleton-bucket rows simply never match)
    val paired = sizedObs.filter(col("bsz") >= 2)
      .withColumn("n_salts", ceil(col("bsz").cast("double") / cap).cast("int"))
      .select(col("bkey").as("bkey_s"), col("n_salts"))
    // SHUFFLE_HASH, build = the paired-bucket table: both sides ride the
    // itemsP exchange (agg and probe distributions are satisfied by
    // HashPartitioning(bkey, parts)), so the join adds NO exchange and the
    // build map holds only paired buckets (|paired|/parts entries per task)
    val b2 = itemsP.join(paired.hint("shuffle_hash"), col("bkey") === col("bkey_s"))
      .withColumn("salt",
        when(col("n_salts") <= 1, lit(0))
          .otherwise(pmod(xxhash64(col("conv_id")), col("n_salts")).cast("int")))
      .select(col("conv_id"), col("bkey"), col("band_id"), col("src"), col("salt"))
    // Within-bucket member grouping — NOT a self-join. A (bkey, salt)
    // group is cap-bounded by construction, so its member list is a safe
    // in-task object (≤ ~cap strings). The groupBy rides the item
    // exchange's HashPartitioning(bkey) via the partitioning-subset rule,
    // so the whole bucket phase — sizing, salting, member grouping — is
    // ONE exchange wide. band_id/src are bucket-constant (band keys mix
    // the band index; variant keys mix v_id; key spaces disjoint whp), so
    // min() is the same provenance the old x-side projection carried.
    b2.groupBy(col("bkey"), col("salt"))
      .agg(sort_array(collect_list(col("conv_id"))).as("members"),
        min(col("band_id")).as("band_id"), min(col("src")).as("src"))
  }

  /**
   * One pass of bucket sizing + salting + within-bucket pairing + bridges
   * for BOTH sources at once. `items` must have (conv_id, bkey:long,
   * band_id, src) where bkey is the fully mixed bucket key — band index
   * folded into LSH band keys, variant index mixed into bundle keys — so
   * the two key spaces never collide (whp) and one 8-byte grouping key
   * replaces per-source composite keys and per-source shuffle machinery
   * (running the sizing/join/self-join/bridge chain once, not twice, cut
   * measurable per-stage scheduling overhead from the candidate stage).
   */
  private def saltedBucketPairs(items: DataFrame, cap: Int,
                                obs: Option[Observation]): DataFrame = {
    // Bucket sizing (optimization r06, second rework): explicit
    // REPARTITION_BY_NUM exchanges of the 24 B/row item table feed the two
    // consumers below — the bucket-size hash aggregate (build) and the salt
    // join probe. The former full-frame window
    // (count + min-rep over partitionBy(bkey)) buffered every item row
    // through ~one window GROUP PER ROW (buckets are overwhelmingly
    // singletons: 1.36M rows / 1.3M groups at the bench corpus) and was
    // measured ~10 s of the stage's task time; the aggregate computes the
    // same (bsz, src) per bucket in one hash pass, and the bsz ≥ 2 filter
    // then shrinks the JOIN BUILD SIDE to paired buckets only (a few % of
    // buckets), so the probe drops singleton rows exactly like the window's
    // filter did. An earlier agg+join attempt (round-6 batch 3) was
    // REVERTED because with the HOF item generator each branch re-ran the
    // interpreted transform chain; with the codegen lsh_items kernel the
    // duplicated generator pass is cheap (~2 s task time at the bench
    // corpus) and the agg branch's copy of this exchange column-prunes to
    // (bkey, src) — 12 B/row, NARROWER than a partial-agg row would be on
    // these ~all-distinct keys — so the two map passes together ship less
    // than the old single exchange plus its window pass cost
    // (plans/r06/pipeline_bucket_phase.txt pins the two-branch shape).
    //
    // Explicit-N (REPARTITION_BY_NUM) rather than an ENSURE_REQUIREMENTS
    // shuffle: AQE's coalescing floors partitions at minPartitionSize
    // (1 MB), so the ~27 MB item exchange at the bench corpus would run its
    // reduces in 16 tasks on 32 cores while per-row work dwarfs the bytes.
    // At 100-TB scale the exchange is far above the coalesce floor and the
    // plan is unchanged.
    //
    // The grouped member table is materialized EAGERLY (localCheckpoint —
    // the pipeline's stage idiom): it has TWO consumers, the pair
    // enumeration and the bridge chain, and collect_list is flagged
    // non-deterministic so its subtree can never canonicalize equal for
    // exchange reuse — un-checkpointed, the bridge branch re-ran the whole
    // sizing/salt/collect chain (measured ~5 s of duplicated task time per
    // run). The checkpoint is compact (one row per (bkey, salt); each
    // conv_id appears once per band, sorted lists dictionary-compress) and
    // disk-spillable; its blocks are released by the ContextCleaner when
    // the candidate Dataset is dropped.
    val grouped = groupedMembers(items, cap, obs).localCheckpoint(true)

    // Spread the cap-bounded groups before enumeration: the grouped
    // checkpoint preserves the bkey-only partition layout, which would
    // leave ALL sub-buckets of a mega-family in one task — the same
    // co-location the old self-join inherited via the subset rule. This
    // exchange ships ONE compact row per (bkey, salt) (measured ~3% of a
    // band-table shuffle: conv_ids appear once, sorted lists dictionary-
    // compress) and restores (bkey, salt)-granular parallelism for the
    // O(sz²) emission, so a 10M-member family's O(m·cap) pairs spread
    // over m/cap tasks instead of one. The partition count is EXPLICIT:
    // AQE sizes coalescing on the exchange's input bytes, and this input
    // is ~30× smaller than the pair volume the generator emits from it —
    // left to itself AQE convoys the enumeration onto a handful of tasks.
    // Sorted members ⇒ enumerating j > i yields conv_a < conv_b directly.
    // The generator chain stays whole-stage-codegen (posexplode + slice);
    // a higher-order-function formulation (flatten/transform building the
    // pair array per row) was measured ~40% more task time — interpreted
    // per-element lambdas — and was reverted.
    val spread = grouped.repartition(
      items.sparkSession.sessionState.conf.numShufflePartitions,
      col("bkey"), col("salt"))
    val inBucket = spread
      .select(col("band_id"), col("src"), col("members"),
        posexplode(col("members")).as(Seq("i", "conv_a")))
      .select(col("conv_a"),
        explode(slice(col("members"), col("i") + lit(2),
          size(col("members")) - col("i") - lit(1))).as("conv_b"),
        col("band_id"), col("src"))
      // defense-in-depth (ADVICE r04): conv_id is unique per bucket by key
      // construction, but if a 64-bit band/variant key ever collided for the
      // SAME doc, sorted-adjacent duplicates in `members` would emit a
      // self-pair here — the old self-join's strict a < b was structurally
      // immune, so keep that guarantee explicit (bridges already carry one)
      .filter(col("conv_a") =!= col("conv_b"))
      .select(col("conv_a"), col("conv_b"), col("band_id"), col("src"))

    // bridge chain: consecutive sub-bucket representatives of over-cap
    // buckets (n_salts-1 extra pairs per bucket — O(bsz/cap), negligible).
    // The rep of a sub-bucket is the head of its sorted member list, and
    // its bridge partner is the NEXT salt's rep — a lead() window directly
    // over the CHECKPOINTED `grouped` table: the window's bkey exchange
    // over one-row-per-sub-bucket input is negligible, and the checkpoint
    // means this second consumer re-runs nothing (the un-checkpointed
    // branch used to replay the whole sizing/salt/collect chain per run).
    // No over-cap filter is needed: a bucket with a single sub-bucket has
    // no lead partner and emits nothing.
    val head = element_at(col("members"), 1)
    val bridges = grouped
      .withColumn("next_conv", lead(head, 1).over(
        Window.partitionBy(col("bkey")).orderBy(col("salt"))))
      .filter(col("next_conv").isNotNull)
      .select(
        least(head, col("next_conv")).as("conv_a"),
        greatest(head, col("next_conv")).as("conv_b"),
        col("band_id"), (col("src") + lit(2)).as("src"))
      .filter(col("conv_a") =!= col("conv_b"))

    inBucket.unionByName(bridges)
  }

  /**
   * Candidate pairs from MinHash LSH banding, plus exact variant-fingerprint
   * collisions (J4 analog: any shared simhash-bundle variant is a candidate).
   * `bucketObs` (optional) receives (total_buckets, paired_buckets,
   * salted_buckets) of the LSH band table on the same action that
   * materializes the candidates — the A4 funnel stats the reference logs as
   * its O(n²)→O(Σb²) reduction, with zero extra jobs.
   */
  def candidates(sigs: Dataset[DocSig], cfg: DedupConfig,
                 bucketObs: Option[Observation] = None): Dataset[CandidatePair] = {
    val spark = sigs.sparkSession
    import spark.implicits._

    // band keys already mix the band index (TextKernel.bandKeys), so the
    // 8-byte key alone identifies the bucket; band_id rides along for
    // min-band provenance only. The J4 bundle path (exact collisions of any
    // normalization-variant fingerprint — an uncapped variant self-join
    // would be m²/2 on template families, the most likely blowup at 100 TB)
    // shares the SAME sized/salted bucket pass via a disjoint key space.
    // Both item sources explode out of ONE pass over the sigs checkpoint
    // (optimization r06): the former bandItems ∪ variantItems union read —
    // and decoded — the signature blocks twice and scheduled two map
    // stages into the bucket exchange; one generator halves both. The item
    // struct array comes from the codegen lsh_items kernel (one tight loop
    // per doc) rather than the explode(concat(transform×2)) chain, whose
    // HOF lambdas ran interpreted per element AND blocked exchange reuse
    // across the sizing aggregate's two reads (fresh lambda exprIds never
    // canonicalize). Rows and values are identical (same keys — variant
    // bkey reproduces Spark's xxhash64(v_id, v_hash) bit-for-bit, spec-
    // pinned — same ids, same src codes).
    val allPairs = saltedBucketPairs(itemsFor(sigs), cfg.bandBucketCap, bucketObs)

    // Pair dedup + the MIN-BAND-HITS prefilter. With b=64/r=2 banding the
    // weakest detectable transform (J ≈ 0.42) collides in ~11 bands, while
    // sub-threshold background pairs (J ≈ 0.1) expect 0.64 — requiring ≥2
    // distinct band collisions for LSH-only pairs removes the ~65% one-hit
    // majority BEFORE the signature join ships two truncated signatures per
    // pair (measured: 2.13M → 0.74M pairs at 40k docs; the est join was
    // the candidate stage's dominant shuffle). Bundle hits (exact-variant
    // evidence) and salted-bucket bridges (connectivity) are exempt.
    // Exchange discipline: one explicit hash repartition on conv_a feeds the
    // pair dedup (HashPartitioning(conv_a) satisfies clustering on
    // (conv_a, conv_b) — partitioning-subset rule), the conv_a signature
    // join, and the conv_a cap window WITHOUT re-shuffling the pair table;
    // the conv_b cap window rides the conv_b signature-join exchange. The
    // old chain paid five sequential pair-table shuffles here; the driver's
    // stage-scheduling gaps between them were measured serial residue in
    // the 2→8 scaling budget.
    // Explicit-N on every pair-table exchange in this chain (here, the
    // conv_b join spread, and the rk_a window spread below): a keyed
    // repartition without N is REPARTITION_BY_COL — AQE coalesces it by
    // BYTES (1 MB floor), and the 14-23 MB pair exchanges at the bench
    // corpus ran their dedup agg / scoring join / cap windows in 14-16
    // tasks on 32 cores while per-row work (string-pair hashing, b-bit
    // estimates, window sorts) dwarfs the bytes. Pinning at the data-sized
    // count keeps the reduces full-width; exchange count and 100-TB plan
    // shape are unchanged (these exchanges exceed the coalesce floor at
    // scale).
    val parts = spark.sessionState.conf.numShufflePartitions
    val uniquePairs = allPairs
      .repartition(parts, $"conv_a")
      .groupBy($"conv_a", $"conv_b")
      .agg(min($"band_id").as("band_id"),
        sum(when($"src" === SrcLsh, 1L).otherwise(0L)).as("lsh_hits"),
        max(when($"src" === SrcBundle || $"src" === SrcBundle + 2, 1).otherwise(0)).as("has_bundle"),
        max(when($"src" >= 2, 1).otherwise(0)).as("has_bridge"))
      .filter($"has_bundle" === 1 || $"has_bridge" === 1 ||
        $"lsh_hits" >= cfg.minBandHits)
      // deterministic provenance string (collect_set ordering is not)
      .withColumn("source", concat_ws("+",
        when($"lsh_hits" > 0, "lsh"),
        when($"has_bundle" === 1, "bundle"),
        when($"has_bridge" === 1, "bridge")))
      .drop("lsh_hits", "has_bundle", "has_bridge")

    // Signatures join in only now — per unique pair, not per band row — and
    // as b-bit minwise components (Li & König WWW 2010). Default estBits=8:
    // packed LOW BYTES ship as ONE binary of numPerms bytes per endpoint —
    // a QUARTER of the 32-bit path's array<int>, which was itself the
    // candidate stage's attributed byte wall (the conv_b exchange ships one
    // signature per surviving pair: measured 803 MB at 100k convs on the
    // 32-bit path, with taskTime/cpuTime ≈ 2.3 memory-stall inflation).
    // A position false-matches with p = 2⁻ᵇ; the 8-bit estimator is
    // DEBIASED inside minhash_est8 so minhash_est still estimates J and
    // downstream thresholds keep their meaning (estBits=32's 2⁻³² needs no
    // debias). LOW bits are kept (robust even for low-entropy integer
    // inputs, where high bits are constant); on the 32 path the
    // shiftleft/shiftright pair sign-extends so the int cast is ANSI-safe.
    // SHUFFLE_HASH on the signature side: a sort-merge join must SORT the
    // fat (pair+signature) stream — measured 2.1 GB of sort spill at 100k
    // docs — while a shuffled hash join builds its map on the narrow
    // signature shard (|docs|·~550 B / shuffle-partition, the quantity
    // shuffle.partitions is sized by at scale) and streams the fat side
    // unsorted; the join's hash partitioning still feeds the cap windows.
    val use8 = cfg.estBits == 8
    val mh = sigs.select($"conv_id",
      (if (use8) graft.functions.GraftFunctions.pack_low_bytes($"minhash")
       else transform($"minhash",
         v => shiftright(shiftleft(v, 32), 32).cast("int"))).as("mhb"))
    val est: (Column, Column) => Column =
      if (use8) graft.functions.GraftFunctions.minhash_est8
      else graft.functions.GraftFunctions.minhash_est32
    val scored = uniquePairs
      .join(mh.select($"conv_id".as("conv_a"), $"mhb".as("ma"))
        .hint("shuffle_hash"), "conv_a")
      .repartition(parts, $"conv_b") // pinned-width conv_b spread (see above)
      .join(mh.select($"conv_id".as("conv_b"), $"mhb".as("mb"))
        .hint("shuffle_hash"), "conv_b")
      .withColumn("minhash_est", est(col("ma"), col("mb")))
      // F1 threshold predicate; bundle hits always survive (exact-dup path),
      // and so do BRIDGES — a bridge is the only connectivity between the
      // salted sub-buckets of an over-cap family (salt is conv_id-keyed, so
      // cross-sub-bucket pairs never form in any band); dropping a low-
      // estimate bridge would split a near-dup mega-family into one cluster
      // per sub-bucket — precisely the 100-TB case salting exists for
      .filter($"minhash_est" >= cfg.simThreshold ||
        $"source".contains("bundle") || $"source".contains("bridge"))
      .select(
        concat($"conv_a", lit("|"), $"conv_b").as("pair_key"),
        $"conv_a", $"conv_b", $"minhash_est", $"band_id".cast("int").as("band_id"),
        $"source")

    // F4 output cap, PER DOCUMENT (CLIP_MAX_OUTPUT_PAIRS re-scoped to the
    // TILE_MAX_TILES_PER_PANEL per-item shape): keep a pair if either
    // endpoint ranks it top-k by (bundle-first, estimate desc, pair_key).
    // Bundle pairs rank 1.0 ≥ any estimate, so exact-dup evidence is never
    // evicted by a band flood; bridges rank 1.0 too — they are O(bsz/cap)
    // rows per over-cap bucket (negligible volume) and carry the family's
    // connectivity, so a busy representative must never evict one. Two
    // hash-partitioned window passes — no global sort, no driver funnel,
    // plan survives 100× corpus growth.
    val k = cfg.maxPairsPerDoc
    val rankScore = greatest($"minhash_est",
      when($"source".contains("bundle") || $"source".contains("bridge"),
        lit(1.0)).otherwise(lit(0.0)))
    val wA = Window.partitionBy($"conv_a").orderBy(rankScore.desc, $"pair_key")
    val wB = Window.partitionBy($"conv_b").orderBy(rankScore.desc, $"pair_key")
    // rk_b first: at scale the conv_b signature join leaves the pair table
    // hash-partitioned on conv_b, so this window is sort-only (no exchange)
    scored
      .withColumn("rk_b", row_number().over(wB))
      .repartition(parts, $"conv_a") // pinned-width rk_a spread (see above)
      .withColumn("rk_a", row_number().over(wA))
      .filter($"rk_a" <= k || $"rk_b" <= k)
      .drop("rk_a", "rk_b")
      .as[CandidatePair]
  }

  /**
   * F2 same/adjacent-group suppression (configurable, default OFF exactly
   * like the reference — /root/reference/ai_pdf_panel_duplicate_check_AUTO
   * .py:133-137, implementation :3301-3332): drop candidate pairs whose
   * endpoints' group ordinals are within `gap` of each other (gap 0 = only
   * same-group suppressed; gap 1 also suppresses adjacent groups — the
   * reference's same_page/adjacent_pages knobs). `groups` maps
   * (conv_id, group_id:long) — e.g. source shard, session bucket, page.
   * Ungrouped conversations are never suppressed.
   */
  def suppressGroups(pairs: Dataset[CandidatePair], groups: DataFrame,
                     gap: Int = 0): Dataset[CandidatePair] = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // one group per conv: a caller-supplied duplicate conv_id row would
    // otherwise MULTIPLY surviving pairs through the two left joins
    val g1 = groups.select(col("conv_id"), col("group_id"))
      .dropDuplicates("conv_id")
    pairs.toDF()
      .join(g1.select(col("conv_id").as("conv_a"), col("group_id").as("grp_a")),
        Seq("conv_a"), "left")
      .join(g1.select(col("conv_id").as("conv_b"), col("group_id").as("grp_b")),
        Seq("conv_b"), "left")
      .filter($"grp_a".isNull || $"grp_b".isNull || abs($"grp_a" - $"grp_b") > gap)
      .select($"pair_key", $"conv_a", $"conv_b", $"minhash_est", $"band_id", $"source")
      .as[CandidatePair]
  }

  /** The signature surface `candidates` consumes, exploded to scalar rows —
    * per-band keys, bundle-variant fingerprints, and the 8-bit signature
    * components the scoring join ships — so the ENTIRE candidate join (band
    * collisions → min-band-hits prefilter → debiased b-bit estimate filter →
    * per-doc cap windows) can be replayed as pure SQL in DuckDB and compared
    * hash-exact against `flag_dedup_candidates` (graft.Verify dumps these
    * next to the query outputs; the docs-table twin is
    * DocDedup.minhashLshOracleTables). m8 = low byte as 0-255 int: byte
    * equality in the packed kernel ⟺ (m64 & 255) equality here. */
  def oracleSurface(sigs: Dataset[DocSig]): Seq[(String, DataFrame)] = Seq(
    "pipe_bands" -> sigs.select(col("conv_id"),
      posexplode(col("bands")).as(Seq("band_id", "band_key"))),
    // bkey = the mixed bucket key `candidates` actually groups on (same
    // xxhash64 call over the same exploded columns) — dumped so the replay
    // can size/salt variant buckets in the SAME key space as the engine
    "pipe_variants" -> sigs.select(col("conv_id"),
        posexplode(col("simhash_bundle")).as(Seq("v_id", "v_hash")))
      .withColumn("bkey", xxhash64(col("v_id"), col("v_hash"))),
    // per-conv salt hash: saltedBucketPairs assigns an over-cap bucket's
    // member to sub-bucket pmod(xxhash64(conv_id), n_salts) — dumping the
    // hash (not the salt, which depends on per-bucket n_salts) lets SQL
    // reproduce the full salted enumeration + bridge chain at any corpus
    // size, instead of assuming the no-salt regime
    "pipe_salth" -> sigs.select(col("conv_id"),
      xxhash64(col("conv_id")).as("salt_h")),
    "pipe_sigs8" -> sigs
      .select(col("conv_id"), posexplode(col("minhash")).as(Seq("pos", "m64")))
      .select(col("conv_id"), col("pos"),
        col("m64").bitwiseAND(lit(255L)).cast("int").as("m8")))

  /** Bucket-size funnel stats (A4 analog of the reference's logged
    * O(n²)→O(Σb²) reduction, ai_...AUTO.py:4026-4031). Standalone-job
    * variant of the `bucketObs` observation (diagnosis/tests). */
  def capStats(sigs: Dataset[DocSig], cfg: DedupConfig): CapStats = {
    val sizes = bandTable(sigs).groupBy("band_id", "band_key").count()
    val agg = sizes.agg(
      count(lit(1)).as("total"),
      sum(when(col("count") >= 2, 1L).otherwise(0L)).as("paired"),
      sum(when(col("count") > cfg.bandBucketCap, 1L).otherwise(0L)).as("salted")
    ).head()
    CapStats(agg.getLong(0), agg.getLong(1), agg.getLong(2))
  }
}
