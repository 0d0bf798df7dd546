package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed in BATCHES through
  * `mapPartitions` — the Scala analogue of `mapInPandas` (iterator of
  * batches in, iterator of batches out), which is the shape a real
  * decoder (JNI/FFI image lib, batched GPU featurizer) needs.
  *
  * The decode itself is a clearly-marked STUB (this container has no
  * image/audio libs): all "decoded" properties derive deterministically
  * from the payload's md5, which makes every op — including the batched
  * mapPartitions path — DuckDB-oracle-checkable, proving the plumbing
  * (schema, batching, row fan-out, no row loss/reorder) end to end.
  *
  * Scale notes: decode is embarrassingly parallel — per-partition
  * batches, no shuffle; `explode` fan-out (frame sampling) happens
  * after the narrow decode so the shuffle-free path stays narrow.
  */
object MultimodalOps {

  /** Payload batch size a real decoder would receive (Arrow-ish). */
  val DecodeBatchSize = 64

  final case class MediaRow(
      doc_id: Long, payload: Array[Byte], media_type: String)
  final case class DecodedMeta(
      doc_id: Long, media_type: String, n_bytes: Long,
      width: Int, height: Int, channels: Int, n_frames: Int)

  /** documents → media table: text bytes as the opaque payload, media
    * type assigned round-robin (deterministic, oracle-expressible). */
  def media(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"))

  // ----------------------------------------------------------- STUB ---
  /** ??? STUB decode ???  A real implementation hands `batch` to a
    * native decoder and returns its metadata. This fake derives
    * dimensions from md5(payload) so results are deterministic and
    * SQL-reproducible. Signature and batch shape are the real contract. */
  private def decodeBatchStub(batch: Seq[MediaRow]): Seq[DecodedMeta] =
    batch.map { m =>
      val hex = MessageDigest.getInstance("MD5").digest(m.payload)
        .map("%02x".format(_)).mkString
      def h(from: Int, len: Int): Long =
        java.lang.Long.parseLong(hex.substring(from, from + len), 16)
      DecodedMeta(
        m.doc_id, m.media_type, m.payload.length.toLong,
        width = (16 + h(0, 6) % 4080).toInt,
        height = (16 + h(6, 6) % 2160).toInt,
        channels = (1 + h(12, 2) % 4).toInt,
        n_frames = (1 + h(14, 6) % 300).toInt)
    }
  // ---------------------------------------------------------------------

  /** REAL raster decode via `javax.imageio` (pure JVM — PNG/JPEG/GIF/
    * BMP, no external libs): width/height from the decoded
    * `BufferedImage`, channels from its ColorModel, n_frames = 1
    * (still images). Runs through the SAME batch contract as the stub.
    * Payloads ImageIO can't decode (audio/video rows, corrupt bytes)
    * fall back to the deterministic stub so the batch function stays
    * total — a real pipeline would route those to format-specific
    * decoders instead. */
  private def decodeBatchImageIO(batch: Seq[MediaRow]): Seq[DecodedMeta] =
    batch.map { m =>
      val img =
        if (m.media_type != "image") None
        else
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(m.payload)))
          catch { case _: java.io.IOException => None }
      img match {
        case Some(i) => DecodedMeta(
          m.doc_id, m.media_type, m.payload.length.toLong,
          width = i.getWidth, height = i.getHeight,
          channels = i.getColorModel.getNumComponents, n_frames = 1)
        case None => decodeBatchStub(Seq(m)).head
      }
    }

  /** Decoder selector: `Stub` keeps the md5-derived fake (the
    * DuckDB-oracle-checkable default the driver queries use);
    * `ImageIO` is the real JVM raster decoder above. */
  sealed trait Decoder
  case object Stub extends Decoder
  case object ImageIO extends Decoder

  // ----------------------------------------------------- audio (WAV) ---

  final case class AudioMeta(
      doc_id: Long, media_type: String, n_bytes: Long,
      sample_rate: Long, channels: Long, bits: Long,
      n_frames: Long, mean_abs: Long)

  private def md5hex(payload: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(payload)
      .map("%02x".format(_)).mkString

  /** REAL audio decode via `javax.sound.sampled` (pure JVM — WAV/PCM,
    * no external libs), upgrading the audio arm the way
    * [[decodeBatchImageIO]] upgraded rasters: format metadata from the
    * parsed RIFF header, plus an EXACT integer content statistic —
    * mean |sample| over the 16-bit PCM stream (Σ|s| div n) — the
    * silence/clipping health signal an ingest pipeline tracks, chosen
    * over RMS because it needs no sqrt and replays exactly.
    * Non-audio rows, corrupt bytes, and non-16-bit/big-endian formats
    * fall back to a deterministic md5-derived fake so the batch
    * function stays total (oracle-expressible, like the image stub). */
  private def decodeBatchWav(batch: Seq[MediaRow]): Seq[AudioMeta] =
    batch.map { m =>
      val parsed =
        if (m.media_type != "audio") None
        else
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(m.payload))
            val f = ais.getFormat
            if (f.getSampleSizeInBits != 16 || f.isBigEndian) None
            else {
              val bytes = ais.readAllBytes()
              val n = bytes.length / 2
              var s = 0L
              var i = 0
              while (i < n) {
                val v = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort
                s += math.abs(v.toLong)
                i += 1
              }
              Some(AudioMeta(m.doc_id, m.media_type, m.payload.length.toLong,
                f.getSampleRate.toLong, f.getChannels.toLong, 16L,
                ais.getFrameLength, if (n == 0) 0L else s / n))
            }
          } catch { case _: Exception => None }
      parsed.getOrElse {
        val hex = md5hex(m.payload)
        def h(from: Int, len: Int): Long =
          java.lang.Long.parseLong(hex.substring(from, from + len), 16)
        AudioMeta(m.doc_id, m.media_type, m.payload.length.toLong,
          8000 + h(0, 4) % 40000, 1 + h(4, 2) % 2, 16L,
          1 + h(6, 6) % 100000, h(12, 4) % 32768)
      }
    }

  /** Batched audio decode — same iterator-of-batches contract as
    * [[decodeMeta]]; no shuffle, parallelism = partitions. */
  def decodeAudioMeta(mediaDs: Dataset[MediaRow],
      batchSize: Int = DecodeBatchSize): Dataset[AudioMeta] = {
    val spark = mediaDs.sparkSession
    import spark.implicits._
    mediaDs.mapPartitions(it => it.grouped(batchSize).flatMap(decodeBatchWav))
  }

  // ------------------------------------------- video (MP4 / ISO-BMFF) ---

  final case class VideoMeta(
      doc_id: Long, media_type: String, n_bytes: Long,
      brand: String, n_tracks: Long, timescale: Long, duration_ms: Long,
      width: Long, height: Long)

  /** REAL video container decode: a pure-JVM ISO-BMFF (MP4) BOX WALK —
    * the header parse every ingest pipeline runs before deciding
    * whether a clip is worth handing to a frame decoder. The format is
    * length-prefixed boxes (uint32 size incl. the 8-byte header + 4CC
    * type, big-endian); containers (`moov`, `trak`, `mdia`) nest more
    * boxes. Extracted: `ftyp` major brand, `mvhd` (version 0)
    * timescale + duration → duration_ms = duration·1000 div timescale,
    * track count, and the max `tkhd` (version 0) track dimensions
    * (stored 16.16 fixed-point — integer part taken; audio tracks
    * carry 0×0, so max = the video track). Truncated boxes, non-v0
    * headers, missing ftyp/moov, or non-video rows fall back to the
    * deterministic md5 fake (oracle-expressible), keeping the batch
    * function total — the decodeBatchWav stance. */
  private def decodeBatchMp4(batch: Seq[MediaRow]): Seq[VideoMeta] =
    batch.map { m =>
      val parsed = if (m.media_type != "video") None else parseMp4(m.payload)
      parsed match {
        case Some((brand, nTracks, timescale, durMs, w, h)) =>
          VideoMeta(m.doc_id, m.media_type, m.payload.length.toLong,
            brand, nTracks, timescale, durMs, w, h)
        case None =>
          val hex = md5hex(m.payload)
          def h(from: Int, len: Int): Long =
            java.lang.Long.parseLong(hex.substring(from, from + len), 16)
          VideoMeta(m.doc_id, m.media_type, m.payload.length.toLong,
            brand = hex.substring(0, 4),
            n_tracks = 1 + h(4, 2) % 3,
            timescale = 600 + h(6, 4) % 48000,
            duration_ms = h(10, 6) % 1000000,
            width = 16 + h(16, 4) % 4080,
            height = 16 + h(20, 4) % 2160)
      }
    }

  /** The box walk itself. Returns (brand, n_tracks, timescale,
    * duration_ms, width, height) or None on anything malformed. */
  private def parseMp4(
      payload: Array[Byte]): Option[(String, Long, Long, Long, Long, Long)] =
    try {
      val bb = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      def boxes(start: Int, end: Int): Seq[(String, Int, Int)] = {
        val out = Seq.newBuilder[(String, Int, Int)]
        var p = start
        while (p < end) {
          if (p + 8 > end) throw new java.io.IOException("truncated header")
          val size = bb.getInt(p)
          // size==1 (64-bit largesize) / size==0 (to-EOF) exist in the
          // spec; this minimal walker treats them as unsupported
          if (size < 8 || p + size > end)
            throw new java.io.IOException("bad box size")
          out += ((new String(payload, p + 4, 4, "US-ASCII"), p + 8, p + size))
          p += size
        }
        out.result()
      }
      val top = boxes(0, payload.length)
      val (_, fs, _) = top.find(_._1 == "ftyp")
        .getOrElse(throw new java.io.IOException("no ftyp"))
      val brand = new String(payload, fs, 4, "US-ASCII")
      val (_, ms, me) = top.find(_._1 == "moov")
        .getOrElse(throw new java.io.IOException("no moov"))
      val inMoov = boxes(ms, me)
      val (_, hs, _) = inMoov.find(_._1 == "mvhd")
        .getOrElse(throw new java.io.IOException("no mvhd"))
      if (payload(hs) != 0) throw new java.io.IOException("mvhd v!=0")
      val timescale = bb.getInt(hs + 12).toLong & 0xffffffffL
      val duration = bb.getInt(hs + 16).toLong & 0xffffffffL
      val durMs = duration * 1000L / math.max(timescale, 1L)
      val traks = inMoov.filter(_._1 == "trak")
      var w = 0L; var h = 0L
      traks.foreach { case (_, ts, te) =>
        val (_, ks, _) = boxes(ts, te).find(_._1 == "tkhd")
          .getOrElse(throw new java.io.IOException("no tkhd"))
        if (payload(ks) != 0) throw new java.io.IOException("tkhd v!=0")
        // v0 tkhd: width/height are 16.16 fixed at payload offsets 76/80
        w = math.max(w, (bb.getInt(ks + 76).toLong & 0xffffffffL) >> 16)
        h = math.max(h, (bb.getInt(ks + 80).toLong & 0xffffffffL) >> 16)
      }
      Some((brand, traks.size.toLong, timescale, durMs, w, h))
    } catch { case _: Exception => None }

  /** Batched video-header decode — same iterator-of-batches contract. */
  def decodeVideoMeta(mediaDs: Dataset[MediaRow],
      batchSize: Int = DecodeBatchSize): Dataset[VideoMeta] = {
    val spark = mediaDs.sparkSession
    import spark.implicits._
    mediaDs.mapPartitions(it => it.grouped(batchSize).flatMap(decodeBatchMp4))
  }

  /** Batched decode over partitions: iterator-of-batches in/out, the
    * mapInPandas shape. No shuffle — decode parallelism = partitions. */
  def decodeMeta(mediaDs: Dataset[MediaRow],
      batchSize: Int = DecodeBatchSize,
      decoder: Decoder = Stub): Dataset[DecodedMeta] = {
    val spark = mediaDs.sparkSession
    import spark.implicits._
    val decodeBatch: Seq[MediaRow] => Seq[DecodedMeta] = decoder match {
      case Stub => decodeBatchStub
      case ImageIO => decodeBatchImageIO
    }
    mediaDs.mapPartitions(it => it.grouped(batchSize).flatMap(decodeBatch))
  }

  /** Fit-into-`target`×`target` resize: pure integer metadata math
    * (the pixel op would live in the batched decoder). */
  def resizePlan(meta: DataFrame, target: Int = 224): DataFrame =
    meta.select(
      col("doc_id"), col("media_type"), col("width"), col("height"),
      // SQL `div` = IntegralDivide: `/` on longs would return double
      expr(s"CAST(CAST(width AS BIGINT) * $target div greatest(width, height) AS BIGINT)")
        .as("out_w"),
      expr(s"CAST(CAST(height AS BIGINT) * $target div greatest(width, height) AS BIGINT)")
        .as("out_h"))

  /** Evenly-spaced frame sampling for video rows: k indices
    * floor(i·n_frames/k) — explode AFTER the narrow decode. */
  def frameSample(meta: DataFrame, k: Int = 5): DataFrame =
    meta.filter(col("media_type") === "video")
      .select(col("doc_id"), col("n_frames"),
        explode(expr(
          s"transform(sequence(0, ${k - 1}), i -> CAST(i AS BIGINT) * n_frames div $k)"))
          .as("frame_index"))
      .select(col("doc_id"), col("n_frames").cast("long").as("n_frames"),
        col("frame_index"))

  /** STUB feature extraction: 8-dim "embedding" from md5 bytes,
    * emitted as scalar columns f0..f7 (exact cross-engine compare). */
  def featureExtract(mediaDf: DataFrame): DataFrame = {
    val hex = md5(col("payload"))
    val fs = (0 until 8).map { d =>
      (conv(substring(hex, 2 * d + 1, 2), 16, 10).cast("double") / 255.0).as(s"f$d")
    }
    mediaDf.select((col("doc_id") +: fs): _*)
  }

  /** Committed raster fixtures for the REAL (non-stub) decoder's
    * oracle row: four tiny images generated once with `javax.imageio`
    * (deterministic pixel fill, dimensions/channels chosen to cover
    * RGB / ARGB / grayscale PNG and JPEG) and embedded as base64 so
    * the query needs no filesystem path. Their decoded metadata is
    * literal-known to the DuckDB oracle; two non-decodable rows (a
    * corrupt "image" and an audio payload) pin the stub fallback
    * inside the same batch. */
  object MediaFixtures {
    private val b64 = java.util.Base64.getDecoder
    // name, base64, all generated by tools doc'd above (w,h,ch in name)
    val pngRgb37x23: Array[Byte] = b64.decode(
      "iVBORw0KGgoAAAANSUhEUgAAACUAAAAXCAIAAAADThHyAAADY0lEQVR4Xq3Wd/uQYxzG4fP6kb3Lys6IbCpRRBRpKCOrZJWVsivJrowmKu0UShHZsqKFFKFEKjJTqIwy87yI534D1/E9zs8fN8XbmK3Ynl3ZmxocTh3q04hmnMn5XMwVXENnbqUHvXmQoTzCeJ7mRV5nOrP5iM/4ku/5md/5pxjbkirsQjUO4DCO4jga0pQzOI+LuJxO3ER37uZ+HmAIoxnHJF7gNabxHvNYyFK+4yd+42+pkE2Lvarsxf4cSm2O5SSacDrnciGX0ZEbuYW7uI8BPMwoHucpnudV3uZdPuRTlvAtK/mVvySyiWwtOxR71TmEWtTjRE6lJefQlvZczQ10407upT+DGcljPMlzTOEt3uEDFrCYb1jBGv4UsrFsJdvLrlJgqUldGtCYFpzNBbSjA9dzM3dwD/0YxAgeZSLP8gpTmcVc5vMFX/Mjq1nHetlItpQqsotUkwOkwHICp3AarWjDpVzFdXTldnrRl4EMZywTmMzLvMlM5vAJi1jGclaxlv+kkmwhlaWq7CX7y6FSWwoszTmL1lzClVxLF26jJ314iGGM4Qme4SXeYAbv8zGf8xU/8At/8K9sKJvLdrKz7CnV5RCpJfXkRCmwygo9G8hmsq3sJHvIfnKw1JS60kAaSwspsMoKPdvIjrK77CsHyZFyjJwgp8hp0kraSIFVVujZTfaRA+UIOVqOl5OluZwlreUSuVIKrLJCTw05XOpIfWkkzeRMOV8ulivkGuksBVZZoecoOU4aSlM5Q86Ti+Ry6SQ3SXe5WwqsskLPSdJETpdz5UK5TDrKjXKL3CX3yQApsMoKPS3lHGkr7eVquUG6yZ1yr/SXwTJSCqyyQs8F0k46yPVys9wh90g/GSQj5FGZKAVWWaHnKrlOusrt0kv6ykAZLmNlgkyWl6XAKiv0dJHbpKf0kYdkmIyRJ+QZeUnekBlSYJUVenpIb3lQhsojMl6elhfldZkus+UjKbDKCj0PyBAZLeNkkrwgr8k0eU/myUJZKgVWWaFnlDwuT8nz8qq8Le/Kh/KpLJFvZaUUWGWFniflOZkib8k78oEskMXyjayQNfKniuK8skLPKzJVZslcmS9fyNfyo6yWdbJexUYqir9SWaFnpsyRT2SRLJPlskrWyn8qKqnYQkVlFVX9DxqbqR7xjkSpAAAAAElFTkSuQmCC")
    val pngArgb16x16: Array[Byte] = b64.decode(
      "iVBORw0KGgoAAAANSUhEUgAAABAAAAAQCAYAAAAf8/9hAAABtUlEQVR4XiXMWREYKQBAwSS7OXZzIQEJSEACEpCABCSMBCQgAQlIQMJISFN5Ve+3P3z420d/8j/+15/9xV/9zf/5f3/3D//0L/92uAMCIAACIAACIAACIAACIAACIAACIFwg3gEREAEREAEREAEREAEREAEREAEREC+Q7oAESIAESIAESIAESIAESIAESIAESBfId0AGZEAGZEAGZEAGZEAGZEAGZEAG5AuUO6AACqAACqAACqAACqAACqAACqAAygXqHVABFVABFVABFVABFVABFVABFVAB9QLtDmiABmiABmiABmiABmiABmiABmiAdoF+B3RAB3RAB3RAB3RAB3RAB3RAB3RAv8BzBzyAB/AAHsADeAAP4AE8gAfwAB7AA3guMO6AARiAARiAARiAARiAARiAARiAARgXmHfABEzABEzABEzABEzABEzABEzABMwLrDtgARZgARZgARZgARZgARZgARZgAdYF9h2wARuwARuwARuwARuwARuwARuwAfsC5w44gAM4gAM4gAM4gAM4gAM4gAM4gHOB9w54AS/gBbyAF/ACXsALeAEv4AW8gBfw/v4DGeR/gSO7qDgAAAAASUVORK5CYII=")
    val pngGray8x5: Array[Byte] = b64.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAgAAAAFCAAAAABd+vKJAAAAGUlEQVR4XmNgYGBkYmbj4GEAMVgQDE4sDAANRgCoHO1v7wAAAABJRU5ErkJggg==")
    val jpeg19x11: Array[Byte] = b64.decode(
      "/9j/4AAQSkZJRgABAgAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkSEw8UHRofHh0aHBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/2wBDAQkJCQwLDBgNDRgyIRwhMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjL/wAARCAALABMDASIAAhEBAxEB/8QAHwAAAQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQAAAF9AQIDAAQRBRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3ODk6Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWmp6ipqrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/8QAHwEAAwEBAQEBAQEBAQAAAAAAAAECAwQFBgcICQoL/8QAtREAAgECBAQDBAcFBAQAAQJ3AAECAxEEBSExBhJBUQdhcRMiMoEIFEKRobHBCSMzUvAVYnLRChYkNOEl8RcYGRomJygpKjU2Nzg5OkNERUZHSElKU1RVVldYWVpjZGVmZ2hpanN0dXZ3eHl6goOEhYaHiImKkpOUlZaXmJmaoqOkpaanqKmqsrO0tba3uLm6wsPExcbHyMnK0tPU1dbX2Nna4uPk5ebn6Onq8vP09fb3+Pn6/9oADAMBAAIRAxEAPwDwaNatxrVeOrcdfbZPh1oc1RkoXiis27/4+n/D+VFbYjiZUK06Psb8ravzdnb+USo3V7n/2Q==")

    /** The six-row fixture table: four real decodes + two stub
      * fallbacks (corrupt image bytes, audio payload). */
    def rows: Seq[MediaRow] = Seq(
      MediaRow(1L, pngRgb37x23, "image"),
      MediaRow(2L, pngArgb16x16, "image"),
      MediaRow(3L, pngGray8x5, "image"),
      MediaRow(4L, jpeg19x11, "image"),
      MediaRow(5L, "notanimage!".getBytes("UTF-8"), "image"),
      MediaRow(6L, "audio-payload".getBytes("UTF-8"), "audio"))

    /** Canonical 44-byte-header PCM16LE WAV, synthesized in code so
      * the fixture is deterministic AND its decoded values are
      * hand-derivable (no binary blob to trust). */
    def wavPcm16(rate: Int, channels: Int,
        samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
      bb.putShort(1); bb.putShort(channels.toShort)
      bb.putInt(rate); bb.putInt(rate * channels * 2)
      bb.putShort((channels * 2).toShort); bb.putShort(16)
      bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }

    /** Mono 8 kHz square wave at amplitude 1000 (160 frames): the
      * |·| of every sample is the amplitude, so mean_abs = 1000
      * EXACTLY — the content statistic is literal-known. */
    def wavMono8k: Array[Byte] = wavPcm16(8000, 1,
      Array.tabulate(160)(i => (if ((i / 8) % 2 == 0) 1000 else -1000).toShort))

    /** Stereo 16 kHz ±500 interleaved (64 frames / 128 samples):
      * mean_abs = 500 exactly. */
    def wavStereo16k: Array[Byte] = wavPcm16(16000, 2,
      Array.tabulate(128)(i => (if (i % 2 == 0) 500 else -500).toShort))

    /** Audio fixture table: two real WAV decodes + two md5-stub
      * fallbacks (corrupt audio bytes, image payload). */
    def audioRows: Seq[MediaRow] = Seq(
      MediaRow(1L, wavMono8k, "audio"),
      MediaRow(2L, wavStereo16k, "audio"),
      MediaRow(3L, "notawav!".getBytes("UTF-8"), "audio"),
      MediaRow(4L, "image-payload".getBytes("UTF-8"), "image"))

    private def be32(v: Int): Array[Byte] =
      java.nio.ByteBuffer.allocate(4).putInt(v).array()
    private def be16(v: Int): Array[Byte] =
      java.nio.ByteBuffer.allocate(2).putShort(v.toShort).array()
    private def mp4Box(typ: String, payload: Array[Byte]*): Array[Byte] = {
      val body = payload.flatten.toArray
      be32(8 + body.length) ++ typ.getBytes("US-ASCII") ++ body
    }
    // identity transform matrix (ISO 14496-12 §6.2.2): diag 1,1 in
    // 16.16 and w-scale 1 in 2.30 fixed point
    private def mp4Matrix: Array[Byte] =
      be32(0x00010000) ++ be32(0) ++ be32(0) ++
        be32(0) ++ be32(0x00010000) ++ be32(0) ++
        be32(0) ++ be32(0) ++ be32(0x40000000)

    /** Canonical minimal MP4, synthesized in code so every decoded
      * value is hand-derivable: `ftyp`(brand) + `moov`(`mvhd`(v0,
      * timescale, duration) + one v0-`tkhd` `trak` per (w,h)) +
      * 16-byte `mdat`. Box sizes are fully determined: ftyp 20 B,
      * mvhd 108 B, each trak 100 B, mdat 24 B ⇒
      * n_bytes = 160 + 100·tracks. */
    def mp4Synth(brand: String, timescale: Int, duration: Int,
        tracks: Seq[(Int, Int)]): Array[Byte] = {
      require(brand.length == 4)
      val ftyp = mp4Box("ftyp",
        brand.getBytes("US-ASCII"), be32(0), brand.getBytes("US-ASCII"))
      val mvhd = mp4Box("mvhd",
        be32(0), // version 0 + flags
        be32(0), be32(0), // creation / modification
        be32(timescale), be32(duration),
        be32(0x00010000), // rate 1.0
        be16(0x0100), // volume 1.0
        Array.fill[Byte](10)(0), // reserved
        mp4Matrix,
        Array.fill[Byte](24)(0), // pre_defined
        be32(tracks.size + 1)) // next_track_ID
      val traks = tracks.zipWithIndex.map { case ((w, h), i) =>
        mp4Box("trak", mp4Box("tkhd",
          be32(7), // version 0, flags: enabled|in_movie|in_preview
          be32(0), be32(0), // creation / modification
          be32(i + 1), // track_ID
          be32(0), // reserved
          be32(duration),
          Array.fill[Byte](8)(0), // reserved
          be16(0), be16(0), // layer / alternate_group
          be16(if (w == 0) 0x0100 else 0), be16(0), // volume / reserved
          mp4Matrix,
          be32(w << 16), be32(h << 16))) // 16.16 fixed
      }
      val mdat = mp4Box("mdat", Array.fill[Byte](16)(0x2a))
      ftyp ++ mp4Box("moov", (mvhd +: traks): _*) ++ mdat
    }

    /** 1-video-track clip: brand isom, timescale 600, duration 1800
      * (= 3000 ms exactly), 320×240. n_bytes = 160 + 100 = 260. */
    def mp4OneTrack: Array[Byte] =
      mp4Synth("isom", 600, 1800, Seq((320, 240)))

    /** 2-track clip (video 640×360 + dimension-less audio track):
      * brand mp42, timescale 1000, duration 2500 (= 2500 ms).
      * n_bytes = 160 + 200 = 360; max dims pick the video track. */
    def mp4TwoTrack: Array[Byte] =
      mp4Synth("mp42", 1000, 2500, Seq((640, 360), (0, 0)))

    /** Video fixture table: two real MP4 box walks + two md5-stub
      * fallbacks (corrupt video bytes, audio payload). */
    def videoRows: Seq[MediaRow] = Seq(
      MediaRow(1L, mp4OneTrack, "video"),
      MediaRow(2L, mp4TwoTrack, "video"),
      MediaRow(3L, "notanmp4!".getBytes("UTF-8"), "video"),
      MediaRow(4L, "audio-payload".getBytes("UTF-8"), "audio"))
  }

  // ------------------------------------------------------------ queries

  type QFn = (SparkSession, String) => DataFrame

  private def mediaDs(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    media(t(s, d, "documents")).as[MediaRow]
  }

  val queries: Map[String, QFn] = Map(
    "mm_decode_meta" -> ((s, d) =>
      decodeMeta(mediaDs(s, d)).toDF()
        .select(col("doc_id"), col("media_type"), col("n_bytes"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("channels").cast("long").as("channels"),
          col("n_frames").cast("long").as("n_frames"))),
    "mm_resize" -> ((s, d) =>
      resizePlan(decodeMeta(mediaDs(s, d)).toDF())
        .select(col("doc_id"), col("media_type"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("out_w"), col("out_h"))),
    "mm_frame_sample" -> ((s, d) =>
      frameSample(decodeMeta(mediaDs(s, d)).toDF())),
    "mm_features" -> ((s, d) => featureExtract(media(t(s, d, "documents")))),
    // the REAL decoder, oracled: committed raster fixtures with
    // literal-known dimensions run through the ImageIO path (batchSize
    // 3 forces a batch boundary inside the 6 rows); the corrupt-image
    // and audio rows pin the stub fallback in the same run. The
    // dataset dir is unused by design — the fixtures ARE the data.
    "mm_decode_imageio" -> ((s, _) => {
      import s.implicits._
      decodeMeta(s.createDataset(MediaFixtures.rows), batchSize = 3,
          decoder = ImageIO).toDF()
        .select(col("doc_id"), col("media_type"), col("n_bytes"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("channels").cast("long").as("channels"),
          col("n_frames").cast("long").as("n_frames"))
    }),
    // the REAL audio decoder, oracled: code-synthesized WAV fixtures
    // whose decoded metadata AND content statistic are hand-derivable
    // (square/constant amplitudes ⇒ mean_abs is the amplitude,
    // exactly); batchSize 3 forces a batch boundary; the corrupt-audio
    // and image rows pin the md5-stub fallback in the same run.
    "mm_decode_wav" -> ((s, _) => {
      import s.implicits._
      decodeAudioMeta(s.createDataset(MediaFixtures.audioRows),
        batchSize = 3).toDF()
    }),
    // the REAL video-container decoder, oracled: code-synthesized
    // minimal MP4s whose box layout (and so every decoded value,
    // including n_bytes = 160 + 100·tracks) is hand-derivable from the
    // synthesis parameters; batchSize 3 forces a batch boundary; the
    // corrupt-video and audio rows pin the md5-stub fallback.
    "mm_decode_mp4" -> ((s, _) => {
      import s.implicits._
      decodeVideoMeta(s.createDataset(MediaFixtures.videoRows),
        batchSize = 3).toDF()
    })
  )

  private val sqlMediaType =
    "['image','audio','video'][(doc_id % 3 + 1)::INT]"
  private def sqlH(from1: Int, len: Int) =
    s"('0x' || substr(md5(text), $from1, $len))::BIGINT"

  val oracle: Map[String, String] = Map(
    "mm_decode_meta" ->
      s"""SELECT doc_id, $sqlMediaType AS media_type,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |  16 + ${sqlH(1, 6)} % 4080 AS width,
         |  16 + ${sqlH(7, 6)} % 2160 AS height,
         |  1 + ${sqlH(13, 2)} % 4 AS channels,
         |  1 + ${sqlH(15, 6)} % 300 AS n_frames
         |FROM documents""".stripMargin,

    "mm_resize" ->
      s"""WITH m AS (
         |  SELECT doc_id, $sqlMediaType AS media_type,
         |    16 + ${sqlH(1, 6)} % 4080 AS width,
         |    16 + ${sqlH(7, 6)} % 2160 AS height
         |  FROM documents)
         |SELECT doc_id, media_type, width, height,
         |  (width * 224) // greatest(width, height) AS out_w,
         |  (height * 224) // greatest(width, height) AS out_h
         |FROM m""".stripMargin,

    "mm_frame_sample" ->
      s"""WITH m AS (
         |  SELECT doc_id, $sqlMediaType AS media_type,
         |    1 + ${sqlH(15, 6)} % 300 AS n_frames
         |  FROM documents)
         |SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
         |  (i * n_frames) // 5 AS frame_index
         |FROM m, (SELECT unnest([0, 1, 2, 3, 4]) AS i) ks
         |WHERE media_type = 'video'""".stripMargin,

    "mm_features" ->
      s"""SELECT doc_id,
         |  ${(0 until 8).map(d =>
             s"('0x' || substr(md5(text), ${2 * d + 1}, 2))::BIGINT::DOUBLE / 255.0 AS f$d")
             .mkString(",\n  ")}
         |FROM documents""".stripMargin,

    // decoded dimensions/channels of the committed fixtures are
    // literals (provenance: generated + round-trip-verified with the
    // same javax.imageio that decodes them); the two fallback rows are
    // recomputed from md5 of their known ASCII payloads, same formula
    // as mm_decode_meta's stub oracle
    "mm_decode_imageio" -> {
      def stub(p: String, mt: String, id: Int) =
        s"""($id, '$mt', octet_length(encode('$p')),
           |  16 + ('0x' || substr(md5('$p'), 1, 6))::BIGINT % 4080,
           |  16 + ('0x' || substr(md5('$p'), 7, 6))::BIGINT % 2160,
           |  1 + ('0x' || substr(md5('$p'), 13, 2))::BIGINT % 4,
           |  1 + ('0x' || substr(md5('$p'), 15, 6))::BIGINT % 300)""".stripMargin
      s"""SELECT CAST(doc_id AS BIGINT) AS doc_id, media_type,
         |  CAST(n_bytes AS BIGINT) AS n_bytes,
         |  CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
         |  CAST(channels AS BIGINT) AS channels, CAST(n_frames AS BIGINT) AS n_frames
         |FROM (VALUES
         |  (1, 'image', 924, 37, 23, 3, 1),
         |  (2, 'image', 494, 16, 16, 4, 1),
         |  (3, 'image', 82, 8, 5, 1, 1),
         |  (4, 'image', 676, 19, 11, 3, 1),
         |  ${stub("notanimage!", "image", 5)},
         |  ${stub("audio-payload", "audio", 6)}
         |) AS v(doc_id, media_type, n_bytes, width, height, channels, n_frames)""".stripMargin
    },

    // mm_decode_wav: rows 1-2 are hand-derived from the synthesis
    // parameters (44-byte canonical header + 2 B/sample; square and
    // constant amplitudes make mean_abs the amplitude exactly); rows
    // 3-4 replay the md5-stub fallback formulas.
    "mm_decode_wav" -> {
      def stub(p: String, mt: String, id: Int) =
        s"""($id, '$mt', octet_length(encode('$p')),
           |  8000 + ('0x' || substr(md5('$p'), 1, 4))::BIGINT % 40000,
           |  1 + ('0x' || substr(md5('$p'), 5, 2))::BIGINT % 2,
           |  16,
           |  1 + ('0x' || substr(md5('$p'), 7, 6))::BIGINT % 100000,
           |  ('0x' || substr(md5('$p'), 13, 4))::BIGINT % 32768)""".stripMargin
      s"""SELECT CAST(doc_id AS BIGINT) AS doc_id, media_type,
         |  CAST(n_bytes AS BIGINT) AS n_bytes,
         |  CAST(sample_rate AS BIGINT) AS sample_rate,
         |  CAST(channels AS BIGINT) AS channels,
         |  CAST(bits AS BIGINT) AS bits,
         |  CAST(n_frames AS BIGINT) AS n_frames,
         |  CAST(mean_abs AS BIGINT) AS mean_abs
         |FROM (VALUES
         |  (1, 'audio', 364, 8000, 1, 16, 160, 1000),
         |  (2, 'audio', 300, 16000, 2, 16, 64, 500),
         |  ${stub("notawav!", "audio", 3)},
         |  ${stub("image-payload", "image", 4)}
         |) AS v(doc_id, media_type, n_bytes, sample_rate, channels, bits,
         |       n_frames, mean_abs)""".stripMargin
    },

    // mm_decode_mp4: rows 1-2 are hand-derived from the synthesis
    // parameters (ftyp 20 B + moov(8 + mvhd 108 + 100/trak) + mdat
    // 24 B ⇒ n_bytes = 160 + 100·tracks; duration_ms = duration·1000
    // // timescale; 16.16 dims are exact integers); rows 3-4 replay
    // the md5-stub fallback formulas.
    "mm_decode_mp4" -> {
      def stub(p: String, mt: String, id: Int) =
        s"""($id, '$mt', octet_length(encode('$p')),
           |  substr(md5('$p'), 1, 4),
           |  1 + ('0x' || substr(md5('$p'), 5, 2))::BIGINT % 3,
           |  600 + ('0x' || substr(md5('$p'), 7, 4))::BIGINT % 48000,
           |  ('0x' || substr(md5('$p'), 11, 6))::BIGINT % 1000000,
           |  16 + ('0x' || substr(md5('$p'), 17, 4))::BIGINT % 4080,
           |  16 + ('0x' || substr(md5('$p'), 21, 4))::BIGINT % 2160)""".stripMargin
      s"""SELECT CAST(doc_id AS BIGINT) AS doc_id, media_type,
         |  CAST(n_bytes AS BIGINT) AS n_bytes, brand,
         |  CAST(n_tracks AS BIGINT) AS n_tracks,
         |  CAST(timescale AS BIGINT) AS timescale,
         |  CAST(duration_ms AS BIGINT) AS duration_ms,
         |  CAST(width AS BIGINT) AS width,
         |  CAST(height AS BIGINT) AS height
         |FROM (VALUES
         |  (1, 'video', 260, 'isom', 1, 600, 3000, 320, 240),
         |  (2, 'video', 360, 'mp42', 2, 1000, 2500, 640, 360),
         |  ${stub("notanmp4!", "video", 3)},
         |  ${stub("audio-payload", "audio", 4)}
         |) AS v(doc_id, media_type, n_bytes, brand, n_tracks, timescale,
         |       duration_ms, width, height)""".stripMargin
    }
  )
}
