package graft.tools

import graft.SparkEntry

/** Dev-only measurement harness (guide §1.4): per-query cold + warm walls
  * with a noop sink, and `.explain("formatted")` dumps for the plan files
  * the optimization round commits. NOT part of the driver contract —
  * graft.Bench stays the frozen official harness.
  *
  * Usage: runMain graft.tools.BenchExtra [planDir] [query...]
  *   SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val planDir = args.headOption.filter(_.nonEmpty)
    val only = args.drop(1).toSet
    val spark = graft.Bench.session(cpus)

    // same pre-battery state as Bench: corpus materialized, shuffle sized,
    // pipeline memo populated (the flag_* queries read it)
    val corpus = SparkEntry.corpusFor(spark, sfDir)
    val n = corpus.count()
    graft.Bench.sizeShuffleForCorpus(spark, n): Unit
    val tP0 = System.nanoTime()
    SparkEntry.pipelineFor(spark, sfDir).clusters.count()
    println(f"[extra] pipeline_warmup=${(System.nanoTime() - tP0) / 1e9}%.2fs")

    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (k, _) => only.isEmpty || only(k) }
    names.foreach { case (name, fn) =>
      spark.sparkContext.setJobDescription(s"extra: $name")
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = run(); val warm1 = run(); val warm2 = run()
      println(f"[extra] $name%-24s cold=$cold%7.3f warm=$warm1%7.3f warm2=$warm2%7.3f")
      planDir.foreach { dir =>
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(dir, s"$name.txt"), txt)
      }
    }
    spark.sparkContext.setJobDescription(null)
    spark.stop()
  }
}
