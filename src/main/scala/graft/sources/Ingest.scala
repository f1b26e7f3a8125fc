package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Non-parquet ingestion surface — the reference accepts raw text
  * records (SMILES lines, main.py:41-50 / mcs.py:27-54's validated
  * string inputs); a warehouse engine additionally meets CSV and
  * JSONL at its edges.
  *
  * Contract: every reader is SCHEMA-EXPLICIT and FAILFAST. Schema
  * inference reads the data twice and silently guesses types
  * (a 100 TB anti-pattern); permissive mode turns corrupt rows into
  * nulls mid-pipeline. Bad input should fail at the edge, loudly —
  * the ingest analog of the reference's input validation (B6).
  */
object Ingest {

  /** CSV with header, explicit schema, FAILFAST on malformed rows. */
  def csv(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).option("header", "true").option("mode", "FAILFAST").csv(path)

  /** JSON-lines with explicit schema, FAILFAST on malformed rows. */
  def jsonl(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** ORC — the other columnar warehouse format. Spark's native ORC
    * reader resolves a user schema BY NAME with schema evolution —
    * a dropped or renamed column comes back as all-nulls, and no
    * FAILFAST mode exists for ORC — so the drift check the module
    * contract promises is done explicitly here: the file footer
    * schema must carry every expected column with the expected type,
    * or the read fails at the edge (one metadata-only footer read). */
  def orc(s: SparkSession, path: String, schema: StructType): DataFrame = {
    val fileSchema = s.read.orc(path).schema
    val missing = schema.filterNot(f =>
      fileSchema.exists(g => g.name == f.name && g.dataType == f.dataType))
    require(missing.isEmpty,
      s"ORC schema drift at $path: missing or type-changed columns " +
        missing.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", "))
    s.read.schema(schema).orc(path)
  }

  /** Raw media files as opaque binary columns — the multimodal
    * ingest edge (G1): one row per file with uri, byte length,
    * content checksum and the undecoded payload. The binaryFile
    * source never decodes anything (decode is the batched
    * per-partition plumbing in MultimodalPack), and `glob` prunes by
    * file name at the directory LISTING, before any bytes are read —
    * at 100 TB of media the listing filter is the difference between
    * scanning a prefix and scanning a lake. */
  def binaryFiles(s: SparkSession, path: String, glob: String = "*"): DataFrame =
    s.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
      .select(col("path").as("uri"), col("length").as("n_bytes"),
        md5(col("content")).as("checksum"), col("content").as("payload"))

  /** Raw text corpus: one document per line, skipping blank lines.
    * Emits (doc_id, text) with a CONTENT-ADDRESSED id (md5 of the
    * line): deterministic under re-runs, re-partitioning and file
    * reordering — the property line numbers and
    * monotonically_increasing_id both lack — and exact duplicates
    * collide by construction, which is what a dedup-first pipeline
    * wants at the edge. */
  def textLines(s: SparkSession, path: String): DataFrame =
    s.read.textFile(path).toDF("text")
      .filter(length(trim(col("text"))) > 0)
      .select(md5(col("text")).as("doc_id"), col("text"))
}
