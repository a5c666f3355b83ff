package graft.mm

import graft._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.V north-star): media payloads as
  * opaque `binary` columns with a typed metadata struct, and per-batch
  * decode/feature-extraction over `mapPartitions` — the Scala analog of
  * the mapInPandas batch shape.
  *
  * The actual media decode is STUBBED (no image/audio libs in this
  * container): [[StubDecoder.decode]] is a deterministic fake that derives
  * "features" from the raw bytes. Everything around it — the schema, the
  * typed batch iterator, partition sizing, the feature output contract —
  * is the real plumbing a decoder would drop into.
  *
  * Scale notes: one `mapPartitions` pass, no shuffle; partition size is
  * bounded by `spark.sql.files.maxPartitionBytes` so decoded batches fit
  * executor memory; the decoder is constructed once per partition (the
  * expensive-init-per-batch pattern).
  */
object MultimodalOps extends QueryModule {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String,
      source: String)

  /** Extracted features — what a real image decoder would emit. */
  final case class MediaFeatures(doc_id: Long, n_bytes: Int,
      content_hash: String, width: Int, height: Int)

  /** STUB: deterministic fake decode. A real build replaces this body
    * with an image/audio library call; the signature and batch usage stay. */
  object StubDecoder {
    def decode(payload: Array[Byte]): (Int, String, Int, Int) = {
      // ??? <- real decoder goes here; deterministic fake below
      val md = java.security.MessageDigest.getInstance("MD5")
      val hash = md.digest(payload).map("%02x".format(_)).mkString
      val n = payload.length
      (n, hash, n % 640, (n * 7) % 480)
    }
  }

  /** documents.text re-cast as a binary media column (the testdata has no
    * real media; utf-8 bytes stand in for an encoded image). A NULL text
    * row has no payload and therefore no media rows — filtered here so
    * every decoder sees a non-null byte array (each oracle mirrors with
    * `WHERE text IS NOT NULL`). */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit("application/octet-stream").as("mime"), col("source"))
      .as[MediaRow]
  }

  /** V7: batch feature extraction — decoder constructed once per
    * partition, rows streamed through it. */
  def extractFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions { rows =>
      // per-partition init site (codec tables, model weights, ...)
      rows.map { r =>
        val (n, hashHex, w, h) = StubDecoder.decode(r.payload)
        MediaFeatures(r.doc_id, n, hashHex, w, h)
      }
    }.toDF().orderBy(col("doc_id"))
  }

  /** Resize output: original + fitted dimensions. */
  final case class ResizedMedia(doc_id: Long, width: Int, height: Int,
      new_width: Int, new_height: Int)

  /** V7b: resize — fit the (stub-decoded) dimensions into a 128x96 box
    * preserving aspect ratio, integer floor math (the real pixel resample
    * replaces the stub; the geometry, batch shape and per-partition init
    * site are the Spark-side deliverable). */
  def resizeMedia(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions { rows =>
      rows.map { r =>
        val (n, _, w0, h0) = StubDecoder.decode(r.payload)
        val w = math.max(w0, 1)
        val h = math.max(h0, 1)
        // fit into (128, 96): scale = min(128/w, 96/h), floor math
        val (nw, nh) =
          if (128L * h <= 96L * w) (128, (h.toLong * 128 / w).toInt)
          else ((w.toLong * 96 / h).toInt, 96)
        ResizedMedia(r.doc_id, w, h, nw, nh)
      }
    }.toDF().orderBy(col("doc_id"))
  }

  /** One sampled frame of a (stub) video payload. */
  final case class FrameSample(doc_id: Long, frame_idx: Int, ts_ms: Int,
      frame_hash: String)

  /** V7c: frame sampling — treat the payload as fixed-size frames,
    * keep every `stride`-th, one OUTPUT ROW PER FRAME (the flatMap/
    * explode shape a video pipeline needs), each frame content-hashed.
    * A real build swaps the byte-slice "frame" for a container/codec
    * frame read; the row multiplication, ordering and per-partition
    * digest reuse carry over unchanged. */
  def sampleFrames(spark: SparkSession, dir: String,
      frameBytes: Int = 100, stride: Int = 2): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions { rows =>
      // per-partition init (real: demuxer/codec context)
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        val n = r.payload.length
        // ceil(n / frameBytes): the last (possibly short) frame counts,
        // an exact multiple does NOT get a phantom empty frame.
        val nFrames = (n + frameBytes - 1) / frameBytes
        (0 until nFrames by stride).iterator.map { idx =>
          val start = idx * frameBytes
          val end = math.min(start + frameBytes, n)
          val hash = md.digest(java.util.Arrays.copyOfRange(r.payload,
            start, end)).map("%02x".format(_)).mkString
          FrameSample(r.doc_id, idx, idx * 40, hash)
        }
      }
    }.toDF().orderBy(col("doc_id"), col("frame_idx"))
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("v7_multimodal_features",
      "V7 multimodal binary-column plumbing: mapPartitions batch decode " +
        "(stubbed) -> typed features",
      extractFeatures,
      Some("""SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
             | md5(text) AS content_hash,
             | CAST(octet_length(CAST(text AS BLOB)) % 640 AS INT) AS width,
             | CAST((octet_length(CAST(text AS BLOB)) * 7) % 480 AS INT) AS height
             |FROM documents WHERE text IS NOT NULL
             |ORDER BY doc_id""".stripMargin)),
    GraftQuery("v7b_media_resize",
      "V7 resize step: fit stub-decoded dims into 128x96, integer floor " +
        "aspect math (batch shape + init site real, resample stubbed)",
      resizeMedia,
      Some("""WITH m AS (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n
             |  FROM documents WHERE text IS NOT NULL),
             | d AS (SELECT doc_id, greatest(n % 640, 1) AS w,
             |   greatest((n*7) % 480, 1) AS h FROM m)
             |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
             | CAST(CASE WHEN 128*h <= 96*w THEN 128 ELSE (w*96)//h END AS INT)
             |   AS new_width,
             | CAST(CASE WHEN 128*h <= 96*w THEN (h*128)//w ELSE 96 END AS INT)
             |   AS new_height
             |FROM d ORDER BY doc_id""".stripMargin)),
    GraftQuery("v7c_frame_sample",
      "V7 frame sampling: payload as fixed-size frames, every 2nd kept, " +
        "one row per frame with content hash (flatMap row-multiplication " +
        "shape; ASCII payloads make byte slices == varchar substrings " +
        "for the oracle)",
      (s, d) => sampleFrames(s, d),
      Some("""WITH m AS (SELECT doc_id, text, length(text) AS n
             |  FROM documents WHERE text IS NOT NULL),
             | f AS (SELECT doc_id, text,
             |   unnest(generate_series(0, (n+99)//100 - 1, 2)) AS idx FROM m)
             |SELECT doc_id, CAST(idx AS INT) AS frame_idx,
             | CAST(idx*40 AS INT) AS ts_ms,
             | md5(substring(text, idx*100 + 1, 100)) AS frame_hash
             |FROM f ORDER BY doc_id, frame_idx""".stripMargin)))
}
