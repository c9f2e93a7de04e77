package graft.llm

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode step is a clearly-marked deterministic stub ([[StubDecoder]]) —
  * what is real and tested is the Spark-side shape a 100 TB media pipeline
  * needs: a binary column + metadata schema, a batched per-partition decode
  * (`mapPartitions`, the Scala analogue of `mapInPandas` — one decoder
  * instance per partition, streamed row batches, no per-row setup cost),
  * and partition sizing so each task holds only its batch in memory.
  *
  * At scale: blobs stay columnar in parquet, the decode stage is a narrow
  * transformation (no shuffle), and downstream feature columns are ordinary
  * numeric columns that aggregate/join like any other.
  */
object Multimodal {

  /** One media record: id + opaque payload. */
  final case class MediaRecord(doc_id: Long, blob: Array[Byte])

  /** Extracted features — what a real image decoder would return. */
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Long,
                                 height: Long, format: String)

  /** Deterministic stand-in for the media decoder. A real deployment
    * replaces `decode` with e.g. an image library call; everything else
    * (batching, schema, partitioning) is unchanged. Features derive from
    * md5 of the payload so tests and the SQL oracle can predict them.
    */
  object StubDecoder {
    def decode(r: MediaRecord): MediaFeatures = {
      val d = MessageDigest.getInstance("MD5").digest(r.blob)
      val h = java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.take(15), 16)
      MediaFeatures(
        doc_id = r.doc_id,
        n_bytes = r.blob.length.toLong,
        width = 160 + h % 1760,           // fake 160..1919
        height = 90 + (h / 7) % 990,      // fake 90..1079
        format = Seq("jpeg", "png", "webp")((h % 3).toInt))
    }
  }

  /** Attach a binary payload column. In the fixture there is no real media,
    * so the document text's UTF-8 bytes stand in for the blob; with real
    * data this is just the parquet binary column.
    */
  def withBlob(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))

  /** Batched per-partition decode — the multimodal hot path. One decoder per
    * partition (amortized setup), rows streamed through it; no shuffle.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("blob")).as[MediaRecord]
      .mapPartitions { rows =>
        // Real decoders init native contexts here, once per partition.
        rows.map(StubDecoder.decode)
      }
  }

  /** One sampled "frame" of a media payload. */
  final case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Long, frame_hash: Long)

  /** Frame sampling (video path): treat the blob as fixed-size chunks and
    * emit every `everyN`-th chunk's metadata — the one-to-many explode shape
    * (rows out ≫ rows in) a real frame extractor has, with deterministic
    * stub content. Narrow transformation; output size is bounded by
    * blob-bytes / chunk, not by row count.
    */
  def frameSample(spark: SparkSession, media: DataFrame,
                  chunkBytes: Int = 1024, everyN: Int = 2): Dataset[Frame] = {
    import spark.implicits._
    media.select(col("doc_id"), col("blob")).as[MediaRecord]
      .flatMap { r =>
        r.blob.grouped(chunkBytes).zipWithIndex.collect {
          case (chunk, i) if i % everyN == 0 =>
            val d = MessageDigest.getInstance("MD5").digest(chunk)
            val h = java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.take(15), 16)
            Frame(r.doc_id, i, chunk.length.toLong, h)
        }
      }
  }

  /** Resize (image path): stub produces a deterministic payload of the
    * target size seeded by the source bytes — the shape (bounded output
    * size per record, CPU-heavy per row, no shuffle) is what matters for
    * pipeline planning; swap the body for a real scaler.
    */
  def resize(spark: SparkSession, media: DataFrame, outBytes: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    media.select(col("doc_id"), col("blob")).as[MediaRecord]
      .mapPartitions { rows =>
        val md = MessageDigest.getInstance("MD5")
        rows.map { r =>
          // deterministic pseudo-content: repeated md5 stream of the source
          val out = new Array[Byte](outBytes)
          var seed = r.blob
          var off = 0
          while (off < outBytes) {
            seed = md.digest(seed)
            val n = math.min(seed.length, outBytes - off)
            System.arraycopy(seed, 0, out, off, n)
            off += n
          }
          MediaRecord(r.doc_id, out)
        }
      }
  }
}
