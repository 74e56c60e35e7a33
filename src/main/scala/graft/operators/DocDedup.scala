package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._
import graft.model.DedupConfig

/**
 * Dedup / similarity operators over a generic document table
 * (doc_id, text) — the training-data-pipeline surface: exact dedup,
 * SimHash fingerprinting + near-pair scan, MinHash-LSH candidates.
 * Built on the custom Catalyst expressions (graft.functions.Expressions)
 * so the signature math runs inside whole-stage codegen.
 */
object DocDedup {

  /** Per-document SimHash fingerprint + LSH chunk keys (X2/X6 analog):
    * the 4×16-bit chunk decomposition is the classic simhash dedup
    * banding — hamming ≤ 3 guarantees ≥ 1 equal chunk (pigeonhole). */
  def simhashFingerprints(docs: DataFrame): DataFrame = {
    val sh = simhash64(col("text"))
    docs.select(col("doc_id"), sh.as("simhash"),
      (sh.bitwiseAND(lit(0xFFFFL))).as("chunk0"),
      (shiftright(sh, 16).bitwiseAND(lit(0xFFFFL))).as("chunk1"),
      (shiftright(sh, 32).bitwiseAND(lit(0xFFFFL))).as("chunk2"),
      (shiftright(sh, 48).bitwiseAND(lit(0xFFFFL))).as("chunk3"))
  }

  /** Thorough-mode near-pair scan (J8 analog: unconditional O(n²) sweep,
    * gated to small corpora like the reference's whole-page scanner,
    * /root/reference/duplicate_detector/core/feature_scanner.py:10-87):
    * top-N closest pairs by SimHash Hamming distance. */
  def simhashNearPairs(docs: DataFrame, topN: Int = 20): DataFrame = {
    // materialize fingerprints once and spread the nested-loop stream side
    // across all cores — the doc table is typically ONE parquet split, which
    // would otherwise serialize the O(n²) sweep into a single task
    val spark = docs.sparkSession
    val f = simhashFingerprints(docs).select(col("doc_id"), col("simhash"))
      .repartition(spark.sparkContext.defaultParallelism)
    f.as("a").join(f.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        hamming64(col("a.simhash"), col("b.simhash")).as("hamming"))
      .orderBy(col("hamming"), col("doc_a"), col("doc_b"))
      .limit(topN)
  }

  /** MinHash-LSH candidate pairs over documents with word-3-gram shingles —
    * the standard shingle→minhash→band→bucket-join dedup. (Token-set k=1
    * shingles are useless here: these docs share vocabulary so heavily that
    * ~72% of ALL pairs exceed token-Jaccard 0.5, collapsing LSH to O(n²);
    * 3-gram Jaccard separates the planted near-dups (≈0.99) from the
    * background (<0.05), so the band join prunes like it should.) */
  def minhashLshCandidates(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val cfg = DedupConfig.balanced.copy(shingleK = 3, simThreshold = 0.5)
    val asDocs = docs.select(col("doc_id").cast("string").as("conv_id"),
      lit(1).as("n_turns"), col("text").as("doc_text")).as[graft.model.ConvDoc]
    val sigs = Signatures.compute(asDocs, cfg)
    LshJoin.candidates(sigs, cfg)
      .select($"conv_a".cast("long").as("doc_a"), $"conv_b".cast("long").as("doc_b"),
        round($"minhash_est", 6).as("minhash_est"), $"source")
  }

  /** Embedding LSH bucketing (random-hyperplane signs): the scale path for
    * ANN — bucket by sign pattern, search within bucket only. Hyperplanes
    * derived deterministically from (seed, plane, dim) — no stored model. */
  def embeddingLshBuckets(emb: DataFrame, nPlanes: Int = 12, seed: Long = 7L): DataFrame = {
    // plane p component for dim i: gaussian-ish from counter-mode hash
    // (sum of two uniforms - 1, adequate for sign-LSH)
    val dims = 64
    val planeCols = (0 until nPlanes).map { p =>
      val dot = (0 until dims).map { i =>
        val h = graft.functions.Hashing.mix64(seed ^ (p.toLong << 32) ^ i.toLong)
        val w = (h.toDouble / Long.MaxValue) // in [-1, 1], deterministic
        element_at(col("embedding"), i + 1).cast("double") * lit(w)
      }.reduce(_ + _)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    emb.select(col("vec_id"), col("label"),
      planeCols.reduce((a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
        a.bitwiseOR(b)).as("bucket"))
  }

  /** Bucketed ANN: cosine top-k within LSH bucket only (the 100 TB path —
    * candidate set per query shrinks by ~2^nPlanes vs brute force). */
  def annLshTopK(emb: DataFrame, k: Int = 5, nPlanes: Int = 8): DataFrame = {
    val spark = emb.sparkSession
    import org.apache.spark.sql.expressions.Window
    val withB = embeddingLshBuckets(emb, nPlanes)
      .join(emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e")), "vec_id")
      .withColumn("nrm", sqrt(aggregate(transform(col("e"), x => x * x),
        lit(0.0), (acc, x) => acc + x)))
    // NB: rename the join key on the query side — self-join column refs from
    // the same lineage resolve to one attribute id, silently degenerating the
    // bucket equi-join into a cross join (Spark warns "trivially true
    // equals predicate").
    val a = withB.select(col("vec_id").as("q_id"), col("bucket").as("q_bucket"),
      col("e").as("qe"), col("nrm").as("qn"))
    val pairs = a.join(withB, col("q_bucket") === col("bucket") &&
        col("q_id") =!= col("vec_id"))
      .withColumn("cos", aggregate(zip_with(col("qe"), col("e"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x) / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    pairs.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("q_id"), col("vec_id").as("n_id"), col("rnk"),
        round(col("cos"), 6).as("cosine"))
  }
}
