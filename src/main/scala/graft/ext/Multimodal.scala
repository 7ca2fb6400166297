package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media assets travel as opaque `binary`
  * columns with a typed metadata struct; decode / feature-extraction
  * runs batched per partition so a real decoder (image/audio codec,
  * vision encoder) amortizes model/codec setup across a batch —
  * the Scala analogue of an Arrow-batched pandas UDF.
  *
  * The actual codec is STUBBED: this environment ships no image/audio
  * libraries, so [[StubDecoder]] derives deterministic pseudo-features
  * from the raw bytes. The Spark-side plumbing — schema, binary
  * encoding, partition batching, feature schema — is real and tested;
  * swapping in a real decoder changes only [[Decoder.decodeBatch]].
  *
  * Scale: map-only (no shuffle); batch size bounds peak memory per
  * task; binary columns stream through parquet page-by-page.
  */
object Multimodal {

  case class MediaRow(id: Long, modality: String, blob: Array[Byte],
      format: String)
  case class MediaFeatures(id: Long, modality: String, n_bytes: Long,
      first_byte: Int, last_byte: Int, checksum: Int, features: Array[Float])

  /** Batched decoder contract — a real implementation would JNI into a
    * codec / run an ONNX encoder per batch.
    */
  trait Decoder extends Serializable {
    def decodeBatch(blobs: Seq[Array[Byte]]): Seq[Array[Float]]
  }

  /** STUB: deterministic fake "embedding" from byte statistics (no
    * media codecs in this environment). Keeps the batch contract real.
    */
  object StubDecoder extends Decoder {
    def decodeBatch(blobs: Seq[Array[Byte]]): Seq[Array[Float]] =
      blobs.map { b =>
        val sum = b.foldLeft(0L)((a, x) => a + (x & 0xff))
        Array(b.length.toFloat, (sum % 256).toFloat,
          if (b.nonEmpty) (b.head & 0xff).toFloat else 0f)
      }
  }

  /** Wrap a text corpus as a media table (utf-8 blobs) — stand-in for
    * an image/audio table in the synthetic environment.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("id"), lit("text").as("modality"),
      encode(col("text"), "UTF-8").as("blob"), lit("utf-8").as("format"))

  /** Batched per-partition feature extraction. */
  def extractFeatures(media: Dataset[MediaRow], decoder: Decoder,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val feats = decoder.decodeBatch(batch.map(_.blob))
        batch.lazyZip(feats).map { (row, f) =>
          val b = row.blob
          val checksum = (b.foldLeft(0L)((a, x) => a + (x & 0xff)) % 256).toInt
          MediaFeatures(row.id, row.modality, b.length.toLong,
            if (b.nonEmpty) b.head & 0xff else -1,
            if (b.nonEmpty) b.last & 0xff else -1,
            checksum, f)
        }
      }
    }
  }

  /** End-to-end: documents → binary media table → batched features. */
  def documentFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    extractFeatures(mediaFromDocuments(docs).as[MediaRow], StubDecoder).toDF()
  }

  case class AudioStats(id: Long, sample_rate: Int, channels: Int,
      bits_per_sample: Int, n_samples: Long, peak: Long, sum_amp: Long,
      sum_sq: Long)

  /** REAL container decode ([[Wav]] — RIFF chunk walk, LE header
    * fields, 16-bit PCM frames) → exact integer audio statistics per
    * asset: sample count, peak amplitude, amplitude sum, energy sum.
    * All outputs are integers, so downstream derived metrics (mean,
    * RMS) can round under the engine's SQL semantics and stay
    * oracle-exact. Map-only, partition-batched like
    * [[extractFeatures]].
    */
  def audioStats(media: Dataset[MediaRow]): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { row =>
      val pcm = Wav.decode(row.blob)
      var peak = 0L; var sum = 0L; var sq = 0L
      pcm.samples.foreach { s =>
        val v = s.toLong
        peak = math.max(peak, math.abs(v))
        sum += v
        sq += v * v
      }
      AudioStats(row.id, pcm.sampleRate, pcm.channels, pcm.bitsPerSample,
        pcm.samples.length.toLong, peak, sum, sq)
    })
  }

  case class FrameRow(id: Long, modality: String, n_frames: Long,
      frame_idx: Long, frame_chars: Long, frame_sig: String)

  /** Uniform temporal frame sampling — the video analogue of
    * [[extractFeatures]]: each asset is a sequence of fixed-size frames
    * (here: `frameLen` code points of the decoded blob; a real decoder
    * would seek keyframes), and at most `maxFrames` frames are sampled
    * at evenly spaced positions `idx_j = j * n_frames / k`. One output
    * row per sampled frame carries a content signature, so downstream
    * dedup/similarity operators run per-frame.
    *
    * Scale: map-only explode with fan-out ≤ maxFrames (no shuffle);
    * only sampled frame windows are materialized, never the full frame
    * list — at 100 TB of video the scan stays bounded by the sample
    * budget, not the asset length. All index math is integer division,
    * so the sample schedule is exactly reproducible by the oracle.
    */
  def sampleFrames(media: Dataset[MediaRow], frameLen: Int = 64,
      maxFrames: Int = 8): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-PARTITION resource (the digest), per-row work — unlike
      // extractFeatures there is no per-batch codec call to amortize,
      // so no batching layer
      val md5 = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { row =>
          // stub "decode": utf-8 blob → code points (real: demux frames)
          val cps = new String(row.blob, java.nio.charset.StandardCharsets.UTF_8)
            .codePoints().toArray
          val n = cps.length
          if (n == 0) Seq.empty[FrameRow]
          else {
            val fc = (n.toLong + frameLen - 1) / frameLen
            val k = math.min(maxFrames.toLong, fc)
            (0L until k).map { j =>
              val idx = j * fc / k
              val start = (idx * frameLen).toInt
              val len = math.min(frameLen.toLong, n - start).toInt
              val frame = new String(cps, start, len)
              val sig = md5.digest(
                frame.getBytes(java.nio.charset.StandardCharsets.UTF_8))
                .map("%02x".format(_)).mkString
              FrameRow(row.id, row.modality, fc, idx, len.toLong, sig)
            }
          }
      }
    }
  }
}
