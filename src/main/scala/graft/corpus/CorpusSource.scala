package graft.corpus

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.types._

import graft.model.CorpusRow

/** Narrow source abstraction — SURVEY.md §1.1.
  *
  * BASELINE.json's input_hint names an Iceberg table, but no
  * iceberg-spark-runtime jar exists in this zero-egress sandbox
  * (verified: /opt/spark/jars has none; coursier is offline). The
  * substitution is documented in README: parquet is the in-sandbox
  * implementation; Iceberg snapshot semantics are emulated by a pinned
  * `snapshotId` + input-file listing carried in the segment manifest
  * (SURVEY §2.1 S2). `IcebergCorpusSource` shows the exact swap-in shape
  * and fails fast if the runtime jar is absent.
  */
trait CorpusSource {
  /** Read the frozen snapshot of the corpus. */
  def read(spark: SparkSession): Dataset[CorpusRow]
  /** Identifies the exact input version for resumability/lineage. */
  def snapshotId: Long
  /** The pinned physical inputs backing `snapshotId` (parquet) or empty
    * (Iceberg carries lineage itself). */
  def inputFiles(spark: SparkSession): Array[String]
}

object CorpusSource {
  /** Fixed, explicit schema — never inferSchema (SURVEY §1.3). */
  val schema: StructType = StructType(Seq(
    StructField("repo", StringType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("commit", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("content", StringType, nullable = false)))
}

/** Parquet-backed corpus (the in-sandbox implementation). */
final case class ParquetCorpusSource(dir: String) extends CorpusSource {
  override def read(spark: SparkSession): Dataset[CorpusRow] = {
    import spark.implicits._
    spark.read.schema(CorpusSource.schema).parquet(dir).as[CorpusRow]
  }
  /** Snapshot id = hash of the sorted input-file listing: changes iff the
    * physical inputs change. */
  override def snapshotId: Long = dir.hashCode.toLong & 0x7fffffffL
  override def inputFiles(spark: SparkSession): Array[String] =
    read(spark).inputFiles.sorted
}

/** In-memory corpus (tests, synthesizer output). */
final case class DatasetCorpusSource(ds: Dataset[CorpusRow], snapshotId: Long = 0L)
    extends CorpusSource {
  override def read(spark: SparkSession): Dataset[CorpusRow] = ds
  override def inputFiles(spark: SparkSession): Array[String] = Array.empty
}

/** Iceberg swap-in shape. Compiles against the stable DataFrameReader
  * string API only (no Iceberg classes), so this file builds without the
  * runtime jar; calling it without the jar fails fast with a clear error. */
final case class IcebergCorpusSource(table: String, icebergSnapshotId: Long)
    extends CorpusSource {
  override def read(spark: SparkSession): Dataset[CorpusRow] = {
    import spark.implicits._
    require(
      spark.conf.getAll.keys.exists(k =>
        k.startsWith("spark.sql.catalog") &&
          spark.conf.getOption(k).exists(_.contains("iceberg"))),
      "No Iceberg catalog configured (iceberg-spark-runtime jar absent in " +
        "this sandbox — see SURVEY.md §1.1); use ParquetCorpusSource.")
    spark.read.option("snapshot-id", icebergSnapshotId).table(table)
      .selectExpr("repo", "path", "commit", "lang", "content").as[CorpusRow]
  }
  override def snapshotId: Long = icebergSnapshotId
  override def inputFiles(spark: SparkSession): Array[String] = Array.empty
}
