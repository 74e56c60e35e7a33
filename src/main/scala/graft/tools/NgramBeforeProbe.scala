package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (optimization r06): the ROUND-5 ngramJaccard implementation,
  * copied verbatim from commit b2b6860, so the before/after plan diff of
  * the r06 rework can be captured at DAG level (the query-level dumps show
  * only the memoized localCheckpoint read). Args: [outDir]. */
object NgramBeforeProbe {
  private def normText(c: org.apache.spark.sql.Column) =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  private def ngramJaccardR5(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = s.read.parquet(s"$d/documents.parquet")
      .select($"doc_id", split(normText($"text"), " ").as("toks"))
    val grams = toks.select($"doc_id",
        explode(when(size($"toks") >= 3,
          array_distinct(transform(sequence(lit(1), size($"toks") - 2),
            i => concat_ws(" ", element_at($"toks", i),
              element_at($"toks", i + 1), element_at($"toks", i + 2)))))
          .otherwise(array().cast("array<string>"))).as("sh"))
    val sz = grams.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val rare = grams.join(
      grams.groupBy($"sh").agg(count(lit(1)).as("df"))
        .filter($"df" <= 64).select($"sh"), "sh")
    val inter = rare.as("a").join(rare.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sz.select($"doc_id".as("doc_a"), $"n".as("na")), "doc_a")
      .join(sz.select($"doc_id".as("doc_b"), $"n".as("nb")), "doc_b")
      .withColumn("jac", $"inter".cast("double") / ($"na" + $"nb" - $"inter"))
      .filter($"jac" >= 0.05)
      .select($"doc_a", $"doc_b", round($"jac", 6).as("jaccard"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val out = args.headOption.getOrElse("/tmp/ngrambefore")
    (0 to 2).foreach { rep =>
      val t0 = System.nanoTime()
      val df = ngramJaccardR5(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      println(f"[ngram-r5] rep=$rep sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      if (rep == 0) {
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(out, "ngram_dag_before.txt"),
          df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
      }
    }
    spark.stop()
  }
}
