package graft.engine.ops

import org.apache.spark.sql.functions._

import graft.engine.{QueryDef, Tables}

/** Opaque payload + typed metadata, as a multimodal row (image/audio/video
  * at 100 TB look exactly like this: binary column + metadata struct). */
case class DocBlob(doc_id: Long, payload: Array[Byte], lang: String, n_chars: Long)

/** Output of the per-batch decode/feature-extract stub. */
case class DocFeatures(doc_id: Long, decoded_len: Int, head_byte: Int,
    byte_sum: Long, lang: String)

/** Output of the frame-sample/resize stub: fixed-size frames, every k-th
  * kept, each "resized" to its head bytes. */
case class DocFrames(doc_id: Long, n_frames: Int, n_sampled: Int,
    resized_len: Int, checksum: Long, lang: String)

/**
 * Multimodal-column pipeline (builder brief): media treated as opaque
 * `binary` columns with typed metadata; decode/feature-extract runs as
 * imperative per-partition batch code over a typed Dataset — the Scala
 * equivalent of a mapInPandas batch UDF. The real decode (image/audio libs
 * are not in this container) is STUBBED with a deterministic byte-level
 * extractor; the Spark-side plumbing — schema, encoders, partition batch
 * shape — is real and oracle-checked (the payload here is UTF-8 text, so
 * SQL can recompute every extracted feature independently).
 */
object Multimodal {

  /** The decode stub: what a real implementation would replace with an
    * image/audio decoder. Deterministic, byte-level, batch-shaped. */
  def decodeStub(blobs: Iterator[DocBlob]): Iterator[DocFeatures] =
    blobs.map { b =>
      var sum = 0L
      var i = 0
      while (i < b.payload.length) { sum += b.payload(i) & 0xff; i += 1 }
      DocFeatures(b.doc_id, b.payload.length,
        if (b.payload.isEmpty) -1 else b.payload(0) & 0xff,
        sum % 997, b.lang)
    }

  // --- q51: binary payload → mapPartitions decode → features --------------
  private val q51 = QueryDef(
    "q51_multimodal_binary",
    """SELECT doc_id, length(text) AS decoded_len, ascii(substr(text, 1, 1)) AS head_byte,
      |  CAST(list_sum(list_transform(range(1, length(text) + 1),
      |                               i -> ascii(substr(text, i, 1)))) % 997 AS BIGINT) AS byte_sum,
      |  lang
      |FROM documents ORDER BY doc_id LIMIT 200""".stripMargin) { (s, dir) =>
    val spark = s
    import spark.implicits._
    val blobs = Tables.table(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
        col("lang"), col("n_chars"))
      .as[DocBlob]
    blobs.mapPartitions(decodeStub _).toDF()
      .select("doc_id", "decoded_len", "head_byte", "byte_sum", "lang")
      .orderBy("doc_id").limit(200)
  }

  /** Frame-sample + resize stub — the video-style member of the multimodal
    * family: treat the payload as FULL 8-byte frames (partial tail
    * dropped), keep every 4th frame, "resize" each kept frame to its first
    * 2 bytes. A real implementation swaps the byte slicing for an actual
    * frame decoder/resizer; the batch shape, schema, and partitioning are
    * what this exercises. */
  def frameSampleStub(blobs: Iterator[DocBlob]): Iterator[DocFrames] =
    blobs.map { b =>
      val frameBytes = 8
      val every = 4
      val nFrames = b.payload.length / frameBytes
      val nSampled = (nFrames + every - 1) / every
      var checksum = 0L
      var k = 0
      while (k < nSampled) {
        val i = k * every
        checksum += (i + 1).toLong * (b.payload(i * frameBytes) & 0xff)
        k += 1
      }
      DocFrames(b.doc_id, nFrames, nSampled, nSampled * 2,
        checksum % 1000000007L, b.lang)
    }

  // --- q74: frame-sample / resize over binary payloads ---------------------
  // The payload is UTF-8 text (ASCII by construction), so the oracle
  // recomputes every frame feature with substr arithmetic.
  private val q74 = QueryDef(
    "q74_multimodal_framesample",
    """SELECT doc_id,
      |  CAST(length(text) // 8 AS INTEGER) AS n_frames,
      |  CAST((length(text) // 8 + 3) // 4 AS INTEGER) AS n_sampled,
      |  CAST(((length(text) // 8 + 3) // 4) * 2 AS INTEGER) AS resized_len,
      |  CAST(list_sum(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(range(0, CAST((length(text) // 8 + 3) // 4 AS INTEGER)),
      |      k -> CAST((4*k + 1) * ascii(substr(text, 4*k*8 + 1, 1)) AS BIGINT))))
      |    % 1000000007 AS BIGINT) AS checksum,
      |  lang
      |FROM documents ORDER BY doc_id LIMIT 200""".stripMargin) { (s, dir) =>
    val spark = s
    import spark.implicits._
    val blobs = Tables.table(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
        col("lang"), col("n_chars"))
      .as[DocBlob]
    blobs.mapPartitions(frameSampleStub _).toDF()
      .select("doc_id", "n_frames", "n_sampled", "resized_len", "checksum", "lang")
      .orderBy("doc_id").limit(200)
  }

  def defs: Seq[QueryDef] = Seq(q51, q74)
}
