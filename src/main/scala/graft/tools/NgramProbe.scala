package graft.tools

/** Dev probe: time + dump the un-memoized ngram-jaccard DAG (optimization
  * r06 diagnosis). Args: [outDir]. Not part of the driver contract. */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val out = args.headOption.filter(_.nonEmpty)
    (0 to 2).foreach { rep =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.ngramJaccardPlan(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      println(f"[ngram] rep=$rep sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      if (rep == 0) out.foreach { dir =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(dir, "ngram_dag.txt"),
          df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
      }
    }
    spark.stop()
  }
}
