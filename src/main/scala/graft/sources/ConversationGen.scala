package graft.sources

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.functions.Hashing
import graft.model.Turn

/** Ground-truth planted pair (FIXTURES.md §2, mirrors the reference's
  * ground_truth_manifest, /root/reference/validation_experiment.py:165-185). */
case class GtPair(
  pair_id: Long,
  category: String,       // exact_duplicate | transformed_duplicate | hard_negative
  conv_a: String,
  conv_b: String,
  label: String,
  should_detect: Boolean,
  transform_type: String)

/**
 * Deterministic synthetic transcript corpus with planted duplicates —
 * the text-domain port of the reference's ValidationDatasetBuilder
 * (/root/reference/validation_experiment.py:125-185).
 *
 * Every value is a pure function of (seed, conversation index): generation
 * is embarrassingly parallel via spark.range and bit-identical at any
 * partitioning / cluster size. Per FIXTURES.md: ~5k-token vocabulary,
 * conversation length ~ LogNormal(2.2, 0.8) clipped [2,400], 10% of
 * conversations get a 10x length multiplier (skew spike), turns 5-120 tokens.
 */
object ConversationGen {

  /** Counter-mode splitmix RNG: all draws derived from (seed, stream). */
  final class Rng(seed0: Long) {
    private var s = Hashing.splitmix64(seed0 ^ 0xD1B54A32D192ED03L)
    def nextLong(): Long = { s = Hashing.splitmix64(s); s }
    def nextDouble(): Double = (nextLong() >>> 11) * (1.0 / (1L << 53))
    def nextInt(n: Int): Int = (((nextLong() >>> 1) % n)).toInt
    def gaussian(): Double = {
      val u1 = math.max(nextDouble(), 1e-12)
      val u2 = nextDouble()
      math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
    }
  }

  final val VocabSize = 5000
  final val NumFamilies = 40
  private val Epoch = 1700000000000L // fixed UTC base for ts

  /** Deterministic vocabulary word for token id v. */
  def word(v: Int): String = {
    val h = Hashing.mix64(v.toLong ^ 0xABCDEF12345L)
    val len = 3 + (java.lang.Long.remainderUnsigned(h, 8L)).toInt
    val sb = new java.lang.StringBuilder(len)
    var x = h
    var i = 0
    while (i < len) {
      x = Hashing.splitmix64(x)
      sb.append(('a' + java.lang.Long.remainderUnsigned(x, 26L).toInt).toChar)
      i += 1
    }
    sb.toString
  }

  /** Family-shared boilerplate opener tokens (makes hard negatives hard —
    * the template-lookalike problem the reference's CLIP z-score targets,
    * ai_...AUTO.py:1496-1526). */
  private def familyTokens(family: Int, n: Int): Array[String] = {
    val rng = new Rng(0xFA111E5L * (family + 1))
    Array.fill(n)(word(rng.nextInt(VocabSize)))
  }

  /** Generate one base conversation deterministically from its index.
    * familyOverride ≥ 0 pins the template family (used for hard-negative
    * pairs, which must share boilerplate). */
  def genConv(convIdx: Long, seed: Long, boilerplateBoost: Boolean = false,
              familyOverride: Int = -1): Seq[Turn] = {
    val rng = new Rng(seed ^ Hashing.mix64(convIdx * 0x9E37L + 17))
    val convId = f"c$convIdx%08d"
    // LogNormal(2.2, 0.8) clipped [2, 400]; 10% tail gets 10x (skew spike)
    var len = math.exp(2.2 + 0.8 * rng.gaussian()).toInt.max(2).min(400)
    if (rng.nextDouble() < 0.10) len = (len * 10).min(4000)
    val family =
      if (familyOverride >= 0) familyOverride
      else (Hashing.mix64(convIdx) % NumFamilies).toInt.abs
    val boiler = familyTokens(family, 60)
    val boilerFrac = if (boilerplateBoost) 0.55 else 0.25
    val turns = new scala.collection.mutable.ArrayBuffer[Turn](len)
    // turn 0: family system prompt (pure boilerplate)
    turns += Turn(convId, 0, "system",
      boiler.take(40).mkString(" ") + ".", null,
      new Timestamp(Epoch + convIdx * 100000L))
    var idx = 1
    while (idx < len) {
      val role =
        if (rng.nextDouble() < 0.15) "tool"
        else if (idx % 2 == 1) "user" else "assistant"
      val nTok = 5 + rng.nextInt(116)
      val sb = new java.lang.StringBuilder(nTok * 7)
      var t = 0
      while (t < nTok) {
        val tok =
          if (rng.nextDouble() < boilerFrac) boiler(rng.nextInt(boiler.length))
          else word(rng.nextInt(VocabSize))
        if (t > 0) sb.append(if (rng.nextDouble() < 0.08) ", " else " ")
        sb.append(tok)
        t += 1
      }
      sb.append(if (rng.nextDouble() < 0.5) "." else "?")
      val tool = if (role == "tool") s"tool_${rng.nextInt(12)}" else null
      turns += Turn(convId, idx, role, sb.toString, tool,
        new Timestamp(Epoch + convIdx * 100000L + idx * 1000L))
      idx += 1
    }
    turns.toSeq
  }

  // ---- transform catalog (FIXTURES.md §2; text analogs of
  //      validation_experiment.py:125-163) --------------------------------
  val Transforms: Seq[String] = Seq(
    "exact", "relayout", "reorder", "subst5", "subst10",
    "truncate15", "drop2", "lossy_norm")

  /** Which transforms the engine is expected to detect (should_detect). */
  def shouldDetect(t: String): Boolean = t != "hard_negative"

  /** Apply a labeled transform to a cloned conversation. Deterministic. */
  def applyTransform(src: Seq[Turn], newId: String, transform: String, seed: Long): Seq[Turn] = {
    val rng = new Rng(seed ^ Hashing.xxh64(newId, 7L))
    def reIdx(ts: Seq[Turn]): Seq[Turn] =
      ts.zipWithIndex.map { case (t, i) => t.copy(conv_id = newId, turn_idx = i) }
    transform match {
      case "exact" => reIdx(src)
      case "relayout" => // casing cycle + wrap re-flow (≙ rotate: content-preserving re-encode)
        reIdx(src).map { t =>
          val s = t.text.split(' ').zipWithIndex.map { case (w, i) =>
            if (i % 3 == 0) w.toUpperCase else w
          }.mkString("  ")
          t.copy(text = s + "\n")
        }
      case "reorder" => // swap adjacent sibling turns (≙ mirror)
        val arr = src.toArray
        var i = 1
        while (i + 1 < arr.length) {
          if (rng.nextDouble() < 0.3) { val tmp = arr(i); arr(i) = arr(i + 1); arr(i + 1) = tmp }
          i += 2
        }
        reIdx(arr.toSeq)
      case "subst5" | "subst10" => // token substitution (≙ brightness ±δ)
        val frac = if (transform == "subst5") 0.05 else 0.10
        reIdx(src).map { t =>
          val toks = t.text.split(' ')
          val out = toks.map(w => if (rng.nextDouble() < frac) word(rng.nextInt(VocabSize)) else w)
          t.copy(text = out.mkString(" "))
        }
      case "truncate15" => // drop last 15% of turns (≙ crop — partial dup, exercises span stage)
        val keep = math.max(2, (src.length * 0.85).toInt)
        reIdx(src.take(keep))
      case "drop2" => // 2% random token drop (≙ slight blur)
        reIdx(src).map { t =>
          val toks = t.text.split(' ').filter(_ => rng.nextDouble() >= 0.02)
          t.copy(text = if (toks.isEmpty) t.text else toks.mkString(" "))
        }
      case "lossy_norm" => // whitespace collapse + punctuation strip (≙ jpeg_compress)
        reIdx(src).map { t =>
          t.copy(text = t.text.replaceAll("[^a-zA-Z0-9 ]", "").replaceAll(" +", " ").trim)
        }
      case other => sys.error(s"unknown transform $other")
    }
  }

  /** Corpus spec: nBase base conversations + planted dup pairs + hard negatives. */
  case class CorpusSpec(nBase: Long, nDupSources: Int, nHardNegPairs: Int, seed: Long = 42L)

  val smoke: CorpusSpec  = CorpusSpec(nBase = 100,   nDupSources = 3,  nHardNegPairs = 10)
  val recall: CorpusSpec = CorpusSpec(nBase = 5000,  nDupSources = 38, nHardNegPairs = 300)

  /** Ground-truth manifest for a spec (driver-side, small). */
  def gtPairs(spec: CorpusSpec): Seq[GtPair] = {
    val dups = for {
      s <- 0 until spec.nDupSources
      (tr, ti) <- Transforms.zipWithIndex
    } yield {
      val srcIdx = (Hashing.mix64(spec.seed + s * 7919L).abs % spec.nBase)
      GtPair(s.toLong * 100 + ti,
        if (tr == "exact") "exact_duplicate" else "transformed_duplicate",
        f"c$srcIdx%08d", s"d${s}_$tr", s"transform_$tr", should_detect = true, tr)
    }
    val negs = (0 until spec.nHardNegPairs).map { i =>
      // two fresh same-family conversations with boosted boilerplate.
      // NEGATIVE pair ids: dup pairs use s*100 + ti, so any fixed positive
      // base (the old 100000 + i) collides with them once nDupSources
      // reaches base/100 — contradictory should_detect labels under one
      // pair_id in a generator built for scale sweeps
      GtPair(-(1L + i), "hard_negative", s"hn${i}_a", s"hn${i}_b",
        "hard_negative", should_detect = false, "hard_negative")
    }
    dups ++ negs
  }

  /** Materialize the full corpus (base + clones + hard negatives) as Dataset[Turn].
    * Distributed via spark.range; each row derived purely from indices. */
  def corpus(spark: SparkSession, spec: CorpusSpec): Dataset[Turn] = {
    import spark.implicits._
    val seed = spec.seed
    val base = spark.range(0, spec.nBase)
      .repartition(spark.sparkContext.defaultParallelism)
      .flatMap(i => genConv(i, seed))
    val gts = gtPairs(spec)
    val dupSpecs = gts.filter(_.category != "hard_negative")
      .map(g => (g.conv_a, g.conv_b, g.transform_type))
    val dups = spark.createDataset(dupSpecs).flatMap { case (src, newId, tr) =>
      val srcIdx = src.stripPrefix("c").toLong
      applyTransform(genConv(srcIdx, seed), newId, tr, seed)
    }
    val negSpecs = gts.filter(_.category == "hard_negative")
      .flatMap(g => Seq(g.conv_a, g.conv_b))
    val negs = spark.createDataset(negSpecs).flatMap { id =>
      // same template family for both sides of a pair: keyed on pair index
      val pairIdx = id.stripPrefix("hn").takeWhile(_.isDigit).toLong
      val fam = (pairIdx % NumFamilies).toInt
      genConv(1000000L + pairIdx * 2 + (if (id.endsWith("_a")) 0 else 1),
        seed ^ Hashing.mix64(pairIdx), boilerplateBoost = true, familyOverride = fam)
        .map(t => t.copy(conv_id = id))
    }
    // Deliver the corpus hash-distributed by conv_id — the layout contract
    // of the production input (an Iceberg/parquet table bucketed by
    // conv_id, so every conversation's turns are co-located). The first
    // pipeline stage's groupBy(conv_id) (Reassembly.assemble) and the T2
    // profile's groupBy then ride the storage partitioning with NO
    // full-corpus text exchange; the one-off shuffle here happens at
    // generation/ingest time, like the bucketed table write it stands for.
    base.union(dups).union(negs)
      .repartition(org.apache.spark.sql.functions.col("conv_id")).as[Turn]
  }

  /** gtPairs as a Dataset (test fixture). */
  def gtDataset(spark: SparkSession, spec: CorpusSpec): Dataset[GtPair] = {
    import spark.implicits._
    spark.createDataset(gtPairs(spec))
  }
}
