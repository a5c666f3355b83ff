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
    * real media; utf-8 bytes stand in for an encoded image). */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
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

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("v7_multimodal_features",
      "V7 multimodal binary-column plumbing: mapPartitions batch decode " +
        "(stubbed) -> typed features",
      extractFeatures,
      Some("""SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
             | md5(text) AS content_hash,
             | CAST(octet_length(CAST(text AS BLOB)) % 640 AS INT) AS width,
             | CAST((octet_length(CAST(text AS BLOB)) * 7) % 480 AS INT) AS height
             |FROM documents ORDER BY doc_id""".stripMargin)))
}
