package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}

/** One decoded multimodal record: id, payload size, extracted
  * feature vector. */
final case class FeatureRow(doc_id: Long, n_bytes: Long, features: Seq[Float])

/** Multimodal-column pack (SURVEY §2 G1–G2).
  *
  * Media columns are opaque `binary` with typed metadata alongside —
  * the test tables carry no real media, so the payload is the
  * document text's UTF-8 bytes, and the DECODER is a deterministic
  * stub (byte-histogram "features"); everything around it — binary
  * schema, batched per-partition decode plumbing, fixed-width
  * feature output — is real and tested.
  *
  * Scale shape: decode is per-row map work batched per partition
  * (the mapInPandas batch shape): no shuffle at all; a real decoder
  * (JNI image lib, ONNX runtime) would slot into
  * [[Decode.featuresOf]] unchanged, amortizing model/library init
  * once per partition via mapPartitions.
  */
object MultimodalPack extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // G1: opaque binary payload + typed metadata extraction, all
    // columnar (codegen'd) — length, magic prefix, checksum.
    "m_binary_meta" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .withColumn("payload", $"text".cast("binary"))
        .select($"doc_id",
          length($"payload").cast("long").as("n_bytes"),
          lower(hex(substring($"payload", 1, 4))).as("magic_hex"),
          md5($"payload").as("checksum"))
    },

    // G2: batched decode / feature-extraction plumbing with the
    // decoder stubbed deterministically (rows-only + spec). The
    // harness-facing projection is SCALAR columns derived from the
    // vector (argmax bin, rounded max/L2) — the raw Array[Float]
    // column stays a library API ([[featureVectors]]): value
    // comparators that sort rows can't order an array column.
    "m_features" -> { (s, d) =>
      import s.implicits._
      // Empty payloads are excluded on BOTH sides (the oracle's
      // per-character unnest yields no rows for them); the L2 sum
      // follows the engine-wide quantization contract
      // (floor(term·1e12 + 0.5) longs, exact order-free 64-bit sum)
      // so the pre-round value cannot differ across engines by a
      // last-ulp reassociation.
      featureVectors(s, d)
        .filter($"n_bytes" >= 1)
        .select($"doc_id", $"n_bytes",
          size($"features").cast("long").as("dim"),
          array_position($"features", array_max($"features")).as("argmax_bin"),
          round(array_max($"features").cast("double"), 6).as("f_max"),
          round(
            aggregate($"features", lit(0L), (acc, x) =>
              acc + floor(x.cast("double") * x.cast("double") * lit(1e12) + lit(0.5)))
              .cast("double") / lit(1e12),
            6).as("f_l2sq"))
    },
  )

  /** G2 library surface: one fixed-width feature vector per document.
    * Decode is per-row map work batched per partition — per-partition
    * init (decoder handle, model session, …) happens once inside
    * mapPartitions; the stub needs none. */
  def featureVectors(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", $"text".cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, payload) =>
          FeatureRow(id, payload.length.toLong, Decode.featuresOf(payload))
        }
      }
      .toDF()
  }

  override def oracles: Map[String, String] = Map(
    "m_binary_meta" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | lower(hex(encode(substr(text, 1, 4)))) AS magic_hex,
        | md5(text) AS checksum
        |FROM documents""".stripMargin,
    // The corpus is pure ASCII (spec-checked), so the byte histogram
    // is expressible over characters; ::FLOAT emulates the decoder's
    // IEEE-single division bit-exactly before the double round.
    "m_features" ->
      """WITH chars AS (
        |  SELECT doc_id, length(text) AS n,
        |         ascii(substr(text, CAST(i AS INT), 1)) % 16 AS bin
        |  FROM documents, unnest(range(1, length(text)+1)) AS t(i)
        |), hist AS (
        |  SELECT doc_id, n, bin,
        |         CAST(CAST(count(*) AS FLOAT) / CAST(n AS FLOAT) AS DOUBLE) AS f
        |  FROM chars GROUP BY 1, 2, 3
        |)
        |SELECT doc_id,
        |       CAST(n AS BIGINT) AS n_bytes,
        |       CAST(16 AS BIGINT) AS dim,
        |       CAST(min(bin) FILTER (WHERE f = fmax) + 1 AS BIGINT) AS argmax_bin,
        |       round(fmax, 6) AS f_max,
        |       round(CAST(SUM(CAST(floor(f*f*1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12, 6) AS f_l2sq
        |FROM (SELECT *, max(f) OVER (PARTITION BY doc_id) AS fmax FROM hist)
        |GROUP BY doc_id, n, fmax""".stripMargin,
  )
}

/** The stubbed decoder: a deterministic fake standing in for a real
  * image/audio decode + feature extractor (the real libraries are
  * not in this container). Normalized 16-bin byte histogram. */
object Decode {
  val DIM = 16

  def featuresOf(payload: Array[Byte]): Seq[Float] = {
    val counts = new Array[Int](DIM)
    payload.foreach(b => counts((b & 0xff) % DIM) += 1)
    val n = math.max(payload.length, 1).toFloat
    counts.toSeq.map(_ / n)
  }
}
