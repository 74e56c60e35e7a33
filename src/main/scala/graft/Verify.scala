package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // the synthesized transcript corpus is a query INPUT, not an sf-dir
    // table — dump it next to the outputs so corpus-derived queries
    // (conv_profile) can be DuckDB-oracled via {GRAFT_OUT} substitution
    SparkEntry.corpusFor(spark, sfDir).coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/corpus_turns")
    // ground-truth manifest dump: lets the validation_metrics groupBy be
    // DuckDB-oracled as pure SQL over (gt_pairs ⋈ flag_dedup_tiers)
    graft.sources.ConversationGen.gtDataset(spark, SparkEntry.specFor(sfDir))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/gt_pairs")
    // LSH signature-surface dumps: let minhash_docs_lsh be DuckDB-oracled
    // as a full SQL replay of the candidate join (bands → min-band-hits →
    // estimate filter → per-doc cap)
    graft.operators.DocDedup.minhashLshOracleTables(spark,
        spark.read.parquet(s"$sfDir/documents.parquet"))
      .foreach { case (name, df) =>
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
    // sign-LSH bucket dump (same nPlanes/seed as annLshTopK's defaults):
    // lets ann_lsh_topk be DuckDB-oracled as a full SQL replay of the
    // multi-probe bucket join + cosine top-k
    graft.operators.DocDedup.embeddingLshBuckets(
        spark.read.parquet(s"$sfDir/embeddings.parquet"), nPlanes = 8, seed = 7L)
      .select("vec_id", "bucket")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/ann_lsh_buckets")
    // per-occurrence token-hash dump under the exact simhash64 tokenizer:
    // lets simhash_docs be DuckDB-oracled as a bit-vote replay
    graft.operators.DocDedup.simhashOracleTokens(
        spark.read.parquet(s"$sfDir/documents.parquet"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/simhash_tokens")
    // IVF routing dumps (deterministic centroid training, same defaults as
    // annIvfTopK): lets ann_ivf_topk be DuckDB-oracled as a full SQL replay
    // of the probed-list join + normalized-cosine top-k
    graft.operators.AnnIvf.oracleTables(
        spark.read.parquet(s"$sfDir/embeddings.parquet"))
      .foreach { case (name, df) =>
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
    // pipeline signature-surface dumps: let flag_dedup_candidates be
    // DuckDB-oracled as a full SQL replay of the pipeline's own LSH join
    // (shares the memoized pipeline sigs — no recompute)
    graft.operators.LshJoin.oracleSurface(SparkEntry.pipelineFor(spark, sfDir).sigs)
      .foreach { case (name, df) =>
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
    // per-conv evidence surfaces: let flag_dedup_verified be DuckDB-oracled
    // as a SQL replay of the evidence map (all columns except the
    // suffix-array span, which the oracle gates against the needSpan rule)
    graft.operators.Verification.oracleSurface(SparkEntry.pipelineFor(spark, sfDir).sigs)
      .foreach { case (name, df) =>
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
    // positional shingle-hash surfaces: let intra_repeated_spans be
    // DuckDB-oracled as a SQL replay of the repeat counting + interval-
    // union coverage (gaps-and-islands)
    // localCheckpoint: both dumped surfaces (and their downstream replay)
    // project this one reassembly plan — eager-checkpoint it so the
    // conv_id shuffle + array_sort assembly runs once, not per table
    graft.operators.IntraDup.shingleSurface(
        graft.operators.Reassembly.assemble(SparkEntry.corpusFor(spark, sfDir))
          .localCheckpoint(true))
      .foreach { case (name, df) =>
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
    // stub-decode feature surface: lets multimodal_features be DuckDB-
    // oracled — the fake decode's per-element output is dumped and the
    // oracle replays the modality routing, payload md5, and the ordered
    // sq-norm fold in SQL (list_reduce), so the Spark-side plumbing around
    // the declared stub is hash-gated like everything else
    graft.operators.Multimodal.featurize(graft.operators.Multimodal.asMedia(
        spark.read.parquet(s"$sfDir/documents.parquet"))).toDF()
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.posexplode(
          org.apache.spark.sql.functions.col("feature")).as(Seq("idx", "val")))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/media_features")
    // approx-percentile sketch surface: lets q_mad_outliers_approx be
    // DuckDB-oracled by replaying the deviation/z gating over the dumped
    // per-key (median, MAD) sketch outputs
    graft.operators.RobustStats.stats(
        spark.read.parquet(s"$sfDir/events.parquet"), exact = false)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/mad_approx_stats")
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val outAbs = new java.io.File(outDir).getAbsolutePath
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("{GRAFT_OUT}", outAbs))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
