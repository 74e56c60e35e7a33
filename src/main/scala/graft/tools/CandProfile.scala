package graft.tools

import org.apache.spark.sql.functions._
import graft.model.DedupConfig
import graft.operators.{LshJoin, Reassembly, Signatures}
import graft.sources.ConversationGen

/** Dev probe: decompose the candidate-join cost (not part of the contract). */
object CandProfile {
  def main(args: Array[String]): Unit = {
    val nBase = if (args.nonEmpty) args(0).toLong else 40000L
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._
    val cfg = DedupConfig.balanced
    val corpus = ConversationGen.corpus(spark,
      ConversationGen.CorpusSpec(nBase, 60, 400)).persist()
    corpus.count()
    val sigs = Signatures.compute(Reassembly.assemble(corpus), cfg).persist()
    var t0 = System.nanoTime()
    println(s"[cand] sigs=${sigs.count()} in ${(System.nanoTime()-t0)/1e9}")

    val bands = sigs.select(col("conv_id"), posexplode(col("bands")).as(Seq("band_id", "band_key")))
    t0 = System.nanoTime()
    val sized = bands.groupBy($"band_id", $"band_key").agg(count(lit(1)).as("bsz"))
    val eligible = sized.filter($"bsz" >= 2)
      .withColumn("n_salts", ceil($"bsz".cast("double") / cfg.bandBucketCap).cast("int"))
      .select($"band_id", $"band_key", $"n_salts")
    val b2 = bands.join(eligible, Seq("band_id", "band_key"))
      .withColumn("salt", when($"n_salts" <= 1, lit(0))
        .otherwise(pmod(xxhash64(col("conv_id")), $"n_salts").cast("int"))).persist()
    println(s"[cand] b2=${b2.count()} in ${(System.nanoTime()-t0)/1e9}")

    t0 = System.nanoTime()
    val lshPairs = b2.as("x").join(b2.as("y"),
      col("x.band_id") === col("y.band_id") && col("x.band_key") === col("y.band_key") &&
      col("x.salt") === col("y.salt") && col("x.conv_id") < col("y.conv_id"))
      .select(col("x.conv_id").as("conv_a"), col("y.conv_id").as("conv_b"))
    println(s"[cand] lshPairs_prededup=${lshPairs.count()} in ${(System.nanoTime()-t0)/1e9}")

    t0 = System.nanoTime()
    val uniq = lshPairs.groupBy($"conv_a", $"conv_b").agg(count(lit(1)).as("nb")).persist()
    println(s"[cand] lshPairs_uniq=${uniq.count()} in ${(System.nanoTime()-t0)/1e9}")
    println(s"[cand] uniq_ge2=${uniq.filter($"nb" >= 2).count()} uniq_ge3=${uniq.filter($"nb" >= 3).count()}")

    val variants = sigs.select(col("conv_id"), posexplode(col("simhash_bundle")).as(Seq("v_id", "v_hash")))
    t0 = System.nanoTime()
    val vsized = variants.groupBy($"v_id", $"v_hash").agg(count(lit(1)).as("bsz"))
      .filter($"bsz" >= 2)
      .withColumn("n_salts", ceil($"bsz".cast("double") / cfg.bandBucketCap).cast("int"))
      .select($"v_id", $"v_hash", $"n_salts")
    val v2 = variants.join(vsized, Seq("v_id", "v_hash"))
      .withColumn("salt", when($"n_salts" <= 1, lit(0))
        .otherwise(pmod(xxhash64(col("conv_id")), $"n_salts").cast("int")))
    val bp = v2.as("x").join(v2.as("y"),
      col("x.v_id") === col("y.v_id") && col("x.v_hash") === col("y.v_hash") &&
      col("x.salt") === col("y.salt") && col("x.conv_id") < col("y.conv_id"))
    println(s"[cand] bundlePairs_prededup=${bp.count()} in ${(System.nanoTime()-t0)/1e9}")

    t0 = System.nanoTime()
    val bundlePairsSrc = bp.select(col("x.conv_id").as("conv_a"), col("y.conv_id").as("conv_b"), lit(-1).as("band_id"), lit("bundle").as("source"))
    val lshSrc = lshPairs.select(col("conv_a"), col("conv_b"), lit(0).as("band_id"), lit("lsh").as("source"))
    val uniqF = lshSrc.unionByName(bundlePairsSrc)
      .groupBy($"conv_a", $"conv_b")
      .agg(min($"band_id").as("band_id"),
        sum(when($"source" === "lsh", 1L).otherwise(0L)).as("lsh_hits"),
        max(when($"source" === "bundle", 1).otherwise(0)).as("has_bundle"))
      .filter($"has_bundle" === 1 || $"lsh_hits" >= 2)
      .persist()
    println(s"[cand] uniqFiltered=${uniqF.count()} in ${(System.nanoTime()-t0)/1e9}")

    t0 = System.nanoTime()
    val mh = sigs.select($"conv_id", $"minhash")
    val scored = uniqF
      .join(mh.select($"conv_id".as("conv_a"), $"minhash".as("ma")), "conv_a")
      .join(mh.select($"conv_id".as("conv_b"), $"minhash".as("mb")), "conv_b")
      .withColumn("minhash_est", graft.functions.GraftFunctions.minhash_est(col("ma"), col("mb")))
      .filter($"minhash_est" >= cfg.simThreshold || $"has_bundle" === 1)
      .select($"conv_a", $"conv_b", $"minhash_est", $"has_bundle").persist()
    println(s"[cand] estFiltered=${scored.count()} in ${(System.nanoTime()-t0)/1e9}")

    t0 = System.nanoTime()
    import org.apache.spark.sql.expressions.Window
    val rs = greatest($"minhash_est", when($"has_bundle" === 1, lit(1.0)).otherwise(lit(0.0)))
    val wA = Window.partitionBy($"conv_a").orderBy(rs.desc, $"conv_b")
    val wB = Window.partitionBy($"conv_b").orderBy(rs.desc, $"conv_a")
    val capped = scored.withColumn("rk_a", row_number().over(wA))
      .withColumn("rk_b", row_number().over(wB))
      .filter($"rk_a" <= cfg.maxPairsPerDoc || $"rk_b" <= cfg.maxPairsPerDoc)
    println(s"[cand] capped=${capped.count()} in ${(System.nanoTime()-t0)/1e9}")

    t0 = System.nanoTime()
    val full = LshJoin.candidates(sigs, cfg)
    println(s"[cand] full_candidates=${full.count()} in ${(System.nanoTime()-t0)/1e9}")
    spark.stop()
  }
}
