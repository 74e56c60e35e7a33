package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Table IO seam (SURVEY.md §1.1 — the north_rule's input is "Iceberg tables
 * of multi-turn conversation transcripts"). Every operator in this engine
 * consumes/produces DataFrames; this trait is the ONLY place a storage
 * format appears, so swapping parquet-at-path for an Iceberg catalog does
 * not touch a single operator.
 *
 * Sandbox constraint, stated honestly: /opt/spark/jars contains no Iceberg
 * runtime and the build is offline (zero egress), so the Iceberg provider
 * cannot be linked or executed here. It therefore uses only spark-sql
 * surfaces that resolve at RUNTIME against a configured catalog
 * (`spark.table`, `DataFrameWriterV2`, metadata-table SQL) — the class
 * compiles against vanilla Spark and activates on any cluster where
 * `org.apache.iceberg:iceberg-spark-runtime` and a catalog are present.
 */
trait TableProvider {

  /** Read a logical table. */
  def read(spark: SparkSession, table: String): DataFrame

  /** Write (overwrite) a logical table. */
  def write(df: DataFrame, table: String): Unit

  /** Append rows to a logical table, creating it if absent — the
    * incremental-maintenance primitive (Iceberg: a fast-append commit;
    * parquet dirs: additional part files, earlier files untouched). */
  def append(df: DataFrame, table: String): Unit

  /** Append with a partition layout on `cols`, creating the table with that
    * layout if absent — the keyed-lookup primitive: readers that filter on
    * the partition columns scan only matching partitions (parquet dirs:
    * hive-style directory pruning; Iceberg: partition-spec pruning from
    * manifest metadata). Formats without layout support may fall back to a
    * plain append (pruning then degrades to a full scan, semantics
    * unchanged). */
  def appendPartitioned(df: DataFrame, table: String, cols: Seq[String]): Unit =
    append(df, table)

  /** Overwrite with a partition layout on `cols` (the compaction sibling of
    * [[appendPartitioned]]). */
  def writePartitioned(df: DataFrame, table: String, cols: Seq[String]): Unit =
    write(df, table)

  /** True if the table exists and is complete (committed). */
  def exists(spark: SparkSession, table: String): Boolean

  /**
   * Cheap stable fingerprint of the table's CURRENT state, if the format
   * exposes one (Iceberg: current snapshot id — O(1) from metadata).
   * None → the caller falls back to hashing content (one scan).
   * This is the cache-invalidation key of the checkpoint/resume scheme
   * (reference analog: MD5 over (path, mtime, size) of all inputs,
   * /root/reference/duplicate_detector/core/similarity_engine.py:40-62).
   */
  def snapshotFingerprint(spark: SparkSession, table: String): Option[String]
}

/** Parquet-directory provider: logical table `t` ⇔ `$root/t$suffix`
  * (the testdata layout with suffix ".parquet"; stage checkpoints use an
  * empty suffix so nested `$cacheVersion/$hash/$stage` names map to the
  * nested directory layout). */
final class ParquetDirProvider(root: String, suffix: String = ".parquet") extends TableProvider {
  private def path(table: String) = s"$root/$table$suffix"

  override def read(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(path(table))

  override def write(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path(table))

  override def append(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path(table))

  override def appendPartitioned(df: DataFrame, table: String, cols: Seq[String]): Unit =
    df.write.mode(SaveMode.Append).partitionBy(cols: _*).parquet(path(table))

  override def writePartitioned(df: DataFrame, table: String, cols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path(table))

  override def exists(spark: SparkSession, table: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path(table), "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Parquet directories have no snapshot id — content hash fallback. */
  override def snapshotFingerprint(spark: SparkSession, table: String): Option[String] = None
}

/**
 * Iceberg catalog provider: logical table `t` ⇔ `$catalog.$namespace.t`.
 * Input fingerprint = current snapshot id from the `.snapshots` metadata
 * table — O(1), no data scan, and exactly the invalidation granularity the
 * north_rule's per-snapshot lineage asks for.
 */
final class IcebergCatalogProvider(catalog: String, namespace: String) extends TableProvider {
  private def fqn(table: String) = s"$catalog.$namespace.$table"

  override def read(spark: SparkSession, table: String): DataFrame =
    spark.table(fqn(table))

  override def write(df: DataFrame, table: String): Unit =
    df.writeTo(fqn(table)).using("iceberg").createOrReplace()

  override def append(df: DataFrame, table: String): Unit =
    if (exists(df.sparkSession, table)) df.writeTo(fqn(table)).append()
    else df.writeTo(fqn(table)).using("iceberg").create()

  // NB on appendPartitioned to a PRE-EXISTING table: DataFrameWriterV2 can
  // only declare a partition spec at CREATE time, so an existing table
  // keeps whatever layout it was created with (an unpartitioned table
  // appended to with a cols list stays unpartitioned — degraded pruning,
  // same semantics; re-create via writePartitioned/compaction to migrate).
  // An empty cols list degrades to a plain append/create, matching the
  // parquet provider.
  override def appendPartitioned(df: DataFrame, table: String, cols: Seq[String]): Unit =
    if (exists(df.sparkSession, table) || cols.isEmpty) append(df, table)
    else df.writeTo(fqn(table)).using("iceberg")
      .partitionedBy(org.apache.spark.sql.functions.col(cols.head),
        cols.tail.map(org.apache.spark.sql.functions.col): _*)
      .create()

  override def writePartitioned(df: DataFrame, table: String, cols: Seq[String]): Unit =
    if (cols.isEmpty) write(df, table)
    else df.writeTo(fqn(table)).using("iceberg")
      .partitionedBy(org.apache.spark.sql.functions.col(cols.head),
        cols.tail.map(org.apache.spark.sql.functions.col): _*)
      .createOrReplace()

  override def exists(spark: SparkSession, table: String): Boolean =
    // probe must not throw when the catalog itself is absent/misconfigured
    // (read() then fails loudly, which is the right failure site)
    try spark.catalog.tableExists(fqn(table))
    catch { case _: Exception => false }

  override def snapshotFingerprint(spark: SparkSession, table: String): Option[String] =
    try {
      val rows = spark.sql(
        s"SELECT snapshot_id FROM ${fqn(table)}.snapshots ORDER BY committed_at DESC LIMIT 1")
        .collect()
      rows.headOption.map(r => s"snap_${r.get(0)}")
    } catch { case _: Exception => None }
}

object TableIO {

  /**
   * Resolve a table-source spec:
   *   - `iceberg:catalog.namespace` → IcebergCatalogProvider
   *   - anything else → ParquetDirProvider rooted at the path
   * The driver passes plain sf directories, so parquet is the default.
   */
  def forSpec(spec: String): TableProvider =
    if (spec.startsWith("iceberg:")) {
      val parts = spec.stripPrefix("iceberg:").split('.')
      require(parts.length >= 2, s"iceberg spec needs catalog.namespace, got $spec")
      new IcebergCatalogProvider(parts(0), parts.drop(1).mkString("."))
    } else new ParquetDirProvider(spec)
}
