package graft.llm

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The IMAGE decode path is real: payloads are genuine PNG/JPEG/BMP files
  * and [[decodeFeatures]] extracts width/height/format with the JDK's
  * `javax.imageio` (header-only read — no full raster decode for metadata).
  * The fixture has no media column, so [[withImageBlob]] synthesizes a
  * deterministic tiny image per document (dimensions/format derived from
  * md5 of the text), which the DuckDB oracle predicts arithmetically while
  * Spark must obtain them by actually decoding the bytes — a round-trip
  * proof the decoder is real. Audio/video frame extraction remains a
  * deterministic byte-chunk stand-in ([[frameSample]]): the JDK ships no
  * audio/video codecs, and what matters at 100 TB is the explode shape.
  *
  * At scale: blobs stay columnar in parquet, decode stages are narrow
  * transformations (`mapPartitions`, one decoder context per partition, no
  * shuffle — the Scala analogue of `mapInPandas`), and feature columns are
  * ordinary numeric columns that aggregate/join like any other.
  */
object Multimodal {

  /** One media record: id + opaque payload. */
  final case class MediaRecord(doc_id: Long, blob: Array[Byte])

  /** Extracted image features. `n_bytes` is the encoded payload size (codec
    * output, not oracle-predictable); width/height/format come from the
    * decoder.
    */
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Long,
                                 height: Long, format: String)

  /** First 60 bits of md5 as a non-negative long — the JVM twin of
    * [[graft.engine.PortableHash.md5Long]] / DuckDB
    * `('0x' || substr(md5(x),1,15))::BIGINT`.
    */
  private def md5Long(bytes: Array[Byte]): Long = {
    val d = MessageDigest.getInstance("MD5").digest(bytes)
    java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.take(15), 16)
  }

  /** Attach a raw binary payload column (frame/chunk paths). In the fixture
    * the document text's UTF-8 bytes stand in for the blob; with real data
    * this is just the parquet binary column.
    */
  def withBlob(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))

  /** Synthesize a REAL image payload per document: a w×h image (w, h in
    * 1..16, format png/jpeg/bmp — all JDK-bundled codecs) encoded by
    * `javax.imageio`, with every parameter derived from md5(text) so the
    * oracle can predict what the decoder must find. Batched per partition
    * like any media ingest stage.
    */
  def withImageBlob(spark: SparkSession, documents: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val h = md5Long(text.getBytes(StandardCharsets.UTF_8))
          val w = (1 + h % 16).toInt
          val ht = (1 + (h / 7) % 16).toInt
          val fmt = Seq("png", "jpeg", "bmp")((h % 3).toInt)
          val img = new java.awt.image.BufferedImage(
            w, ht, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < ht) {
            var x = 0
            while (x < w) {
              img.setRGB(x, y, ((h + x * 31 + y * 17) & 0xffffff).toInt)
              x += 1
            }
            y += 1
          }
          val out = new java.io.ByteArrayOutputStream()
          require(javax.imageio.ImageIO.write(img, fmt, out),
            s"no $fmt encoder in this JDK")
          MediaRecord(id, out.toByteArray)
        }
      }
  }

  /** Perceptual-hash record: 64-bit aHash as a '0'/'1' string (row-major
    * 8×8 blocks; a string dodges the sign bit and diffs legibly).
    */
  final case class PHash(doc_id: Long, ahash: String, n_set: Long)

  /** Synthesize a fixed 16×16 REAL PNG per document (PNG only: the aHash
    * consumes the raster, so the codec must be lossless), every pixel from
    * the same md5-derived linear formula as [[withImageBlob]] — the oracle
    * recomputes the raster arithmetically.
    */
  def withPngBlob16(spark: SparkSession, documents: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    // spread before the raster work: PNG encode here + ImageIO decode in
    // every downstream feature pass are the multimodal family's whole
    // compute, and a one-file fixture scan would serialize them into a
    // single task (profiled: 1.3 s of phash_neardup's 2.2 s at sf0.1)
    graft.engine.Spread.spreadSmallInput(documents)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val h = md5Long(text.getBytes(StandardCharsets.UTF_8))
          val img = new java.awt.image.BufferedImage(
            16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < 16) {
            var x = 0
            while (x < 16) {
              img.setRGB(x, y, ((h + x * 31 + y * 17) & 0xffffff).toInt)
              x += 1
            }
            y += 1
          }
          val out = new java.io.ByteArrayOutputStream()
          require(javax.imageio.ImageIO.write(img, "png", out), "no png encoder")
          MediaRecord(id, out.toByteArray)
        }
      }
  }

  /** Average-hash over the FULL decoded raster (`ImageIO.read`, not just
    * the header): gray = r+g+b per pixel, 2×2 block sums → 64 blocks, bit
    * i = block_i·64 > total (integer cross-multiplication, ties to 0).
    * Batched per partition, no shuffle; the hash is a pure function of the
    * pixels, so a hash match proves the whole encode→decode→raster path.
    */
  def aHashFeatures(spark: SparkSession, media: Dataset[MediaRecord]): Dataset[PHash] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.blob))
        require(img != null && img.getWidth == 16 && img.getHeight == 16,
          s"doc ${r.doc_id}: expected a 16x16 raster")
        val blocks = new Array[Long](64)
        var y = 0
        while (y < 16) {
          var x = 0
          while (x < 16) {
            val v = img.getRGB(x, y) & 0xffffff
            val gray = ((v >> 16) & 255) + ((v >> 8) & 255) + (v & 255)
            blocks((y / 2) * 8 + (x / 2)) += gray
            x += 1
          }
          y += 1
        }
        val total = blocks.sum
        val bits = blocks.map(b => if (b * 64 > total) '1' else '0')
        PHash(r.doc_id, new String(bits), bits.count(_ == '1').toLong)
      }
    }
  }

  /** Batched per-partition image decode — the multimodal hot path, for real:
    * `javax.imageio` sniffs the container from the bytes and reads
    * width/height from the header (no full raster decode). One reader per
    * image, streamed rows, no shuffle.
    */
  def decodeFeatures(spark: SparkSession, media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(r.blob))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          require(readers.hasNext, s"doc ${r.doc_id}: undecodable payload")
          val reader = readers.next()
          try {
            reader.setInput(iis)
            MediaFeatures(r.doc_id, r.blob.length.toLong,
              reader.getWidth(0).toLong, reader.getHeight(0).toLong,
              reader.getFormatName.toLowerCase)
          } finally reader.dispose()
        } finally iis.close()
      }
    }
  }

  /** Extracted audio features. `n_bytes` IS oracle-predictable for WAV:
    * the JDK writer emits the canonical 44-byte RIFF header + PCM data.
    */
  final case class AudioFeatures(doc_id: Long, n_bytes: Long, sample_rate: Long,
                                 channels: Long, n_frames: Long, duration_ms: Long)

  /** Synthesize a REAL audio payload per document: 16-bit PCM WAV (the one
    * container the JDK both writes and parses — `javax.sound.sampled`, no
    * external codecs) with sample rate / channels / frame count all derived
    * from md5(text), so the oracle predicts what the decoder must find.
    * The image twin of this proof is [[withImageBlob]].
    */
  def withAudioBlob(spark: SparkSession, documents: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val h = md5Long(text.getBytes(StandardCharsets.UTF_8))
          val rate = Seq(8000, 16000, 44100)((h % 3).toInt)
          val channels = (1 + (h / 7) % 2).toInt
          val frames = (1 + (h / 11) % 256).toInt
          val fmt = new javax.sound.sampled.AudioFormat(
            rate.toFloat, 16, channels, true, false)
          val data = new Array[Byte](frames * channels * 2)
          var i = 0
          while (i < data.length) { data(i) = ((h + i * 31) & 0xff).toByte; i += 1 }
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
          val out = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
          MediaRecord(id, out.toByteArray)
        }
      }
  }

  /** Batched per-partition audio header decode — `AudioSystem` sniffs the
    * container and reads format + frame count from the RIFF header (no
    * sample decode). Same narrow no-shuffle shape as [[decodeFeatures]];
    * duration is integer milliseconds (frames·1000 div rate) so the column
    * is engine-portable.
    */
  def decodeAudioFeatures(spark: SparkSession,
                          media: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(r.blob))
        val f = aff.getFormat
        val frames = aff.getFrameLength.toLong
        val rate = f.getSampleRate.toLong
        AudioFeatures(r.doc_id, r.blob.length.toLong, rate,
          f.getChannels.toLong, frames, frames * 1000L / rate)
      }
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
            Frame(r.doc_id, i, chunk.length.toLong, md5Long(chunk))
        }
      }
  }

  /** Resize (image path): stub produces a deterministic payload of the
    * target size seeded by the source bytes — the shape (bounded output
    * size per record, CPU-heavy per row, no shuffle) is what matters for
    * pipeline planning; swap the body for a real scaler.
    */
  /** Energy-delta acoustic fingerprint over REAL decoded PCM. */
  final case class AudioFingerprint(doc_id: Long, n_windows: Long, fp: Long)

  /** Chromaprint-shaped fingerprint: `AudioSystem.getAudioInputStream`
    * decodes the WAV container back to raw 16-bit little-endian PCM (the
    * genuine decode path — the header alone cannot produce these bytes),
    * sample magnitudes are summed over consecutive `win`-sample windows,
    * and bit j−1 of the fingerprint is set iff window j's energy exceeds
    * window j−1's (up to 32 bits). The sign-of-delta construction is the
    * standard loudness-contour fingerprint: robust to level scaling,
    * cheap to band for near-dup joins (`simhash_neardup`'s machinery).
    *
    * Batched per-partition map, no shuffle; integer arithmetic throughout
    * so the DuckDB oracle can recompute every bit from the synthetic
    * PCM's closed form ((h + 31·i) mod 256 bytes) without decoding audio
    * — a hash match proves the encode→decode→PCM→DSP path end to end.
    */
  def audioFingerprint(spark: SparkSession, media: Dataset[MediaRecord],
                       win: Int = 16): Dataset[AudioFingerprint] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.blob))
        val data = ais.readAllBytes()
        val nWin = (data.length / 2) / win
        val energies = Array.tabulate(nWin) { j =>
          var s = 0L
          var k = j * win
          while (k < (j + 1) * win) {
            val lo = data(2 * k) & 0xff
            val hi = data(2 * k + 1).toInt // sign-extended high byte
            s += math.abs((hi << 8) | lo)
            k += 1
          }
          s
        }
        var fp = 0L
        val nb = math.min(32, math.max(0, nWin - 1))
        var j = 1
        while (j <= nb) {
          if (energies(j) > energies(j - 1)) fp |= 1L << (j - 1)
          j += 1
        }
        AudioFingerprint(r.doc_id, nWin.toLong, fp)
      }
    }
  }

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
