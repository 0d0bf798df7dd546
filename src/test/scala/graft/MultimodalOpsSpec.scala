package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.MultimodalOps
import graft.ops.MultimodalOps.MediaRow

/** The decode contract the SQL oracle can't see: batch shape (a real
  * decoder gets fixed-size payload batches) and shuffle-freeness. */
class MultimodalOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("decode preserves every row across partitions and batch boundaries") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    // 5 partitions × uneven sizes; batchSize 64 → partial final batches
    val rows = (0L until 1000L).map(i =>
      MediaRow(i, s"payload-$i".getBytes("UTF-8"), Seq("image", "audio", "video")((i % 3).toInt)))
    val ds = spark.createDataset(rows).repartition(5)
    val out = MultimodalOps.decodeMeta(ds).collect()
    assert(out.length == 1000)
    assert(out.map(_.doc_id).toSet == (0L until 1000L).toSet)
    // deterministic: same payload → same fake dimensions
    val m = out.map(r => r.doc_id -> r).toMap
    assert(m(7L).width == MultimodalOps.decodeMeta(ds).collect()
      .find(_.doc_id == 7L).get.width)
    assert(out.forall(r => r.width >= 16 && r.channels >= 1 && r.channels <= 4))
  }

  test("decode is shuffle-free (no Exchange in the plan)") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(MediaRow(1, Array[Byte](1, 2), "image")))
    val plan = MultimodalOps.decodeMeta(ds).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode must not shuffle:\n$plan")
  }

  /** Encode a real raster in memory and return its bytes. */
  private def imageBytes(w: Int, h: Int, argb: Boolean, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      if (argb) java.awt.image.BufferedImage.TYPE_INT_ARGB
      else java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 31 + y * 7) | 0xff000000)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, bos), s"no $format writer")
    bos.toByteArray
  }

  test("ImageIO decoder: real PNG/JPEG metadata through the batched path") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    // real images with known dimensions/bands + one audio row and one
    // corrupt "image" that must fall back to the deterministic stub
    val png3 = imageBytes(5, 3, argb = false, "png")    // 3-channel RGB
    val png4 = imageBytes(8, 2, argb = true, "png")     // 4-channel ARGB
    val jpg = imageBytes(7, 4, argb = false, "jpg")     // JPEG, 3 bands
    val rows = Seq(
      MediaRow(1L, png3, "image"),
      MediaRow(2L, png4, "image"),
      MediaRow(3L, jpg, "image"),
      MediaRow(4L, "not an image at all".getBytes("UTF-8"), "audio"),
      MediaRow(5L, Array[Byte](1, 2, 3, 4), "image")) // undecodable
    // batchSize 2 -> partial batches; 2 partitions -> the real decoder
    // runs through exactly the stub's mapPartitions/grouped plumbing
    val out = MultimodalOps.decodeMeta(
        spark.createDataset(rows).repartition(2),
        batchSize = 2, decoder = MultimodalOps.ImageIO)
      .collect().map(r => r.doc_id -> r).toMap
    assert(out.size == 5, "no row loss through the real decoder")
    assert((out(1L).width, out(1L).height, out(1L).channels, out(1L).n_frames)
      == ((5, 3, 3, 1)))
    assert((out(2L).width, out(2L).height, out(2L).channels) == ((8, 2, 4)))
    assert((out(3L).width, out(3L).height, out(3L).channels) == ((7, 4, 3)))
    assert(out(1L).n_bytes == png3.length.toLong)
    // fallback rows carry the stub's md5-derived dimensions
    val stubbed = Seq(out(4L), out(5L))
    assert(stubbed.forall(r => r.width >= 16 && r.height >= 16),
      s"fallback rows must come from the stub: $stubbed")
  }

  test("driver query output is unchanged by the decoder flag (stub default)") {
    import spark.implicits._
    val rows = (0L until 50L).map(i =>
      MediaRow(i, s"payload-$i".getBytes("UTF-8"),
        Seq("image", "audio", "video")((i % 3).toInt)))
    val ds = spark.createDataset(rows)
    val default = MultimodalOps.decodeMeta(ds).collect().sortBy(_.doc_id)
    val explicitStub = MultimodalOps.decodeMeta(ds,
      decoder = MultimodalOps.Stub).collect().sortBy(_.doc_id)
    assert(default.sameElements(explicitStub),
      "default decoder must remain the oracle-checkable stub")
  }

  test("WAV decoder: real PCM16 metadata + exact mean|sample| through the batched path") {
    import spark.implicits._
    val out = MultimodalOps.decodeAudioMeta(
      spark.createDataset(MultimodalOps.MediaFixtures.audioRows), batchSize = 3)
      .collect().sortBy(_.doc_id)
    // hand-derived from the synthesis parameters (44 B header + 2 B/sample)
    val mono = out(0)
    assert((mono.n_bytes, mono.sample_rate, mono.channels, mono.bits,
      mono.n_frames, mono.mean_abs) == ((364L, 8000L, 1L, 16L, 160L, 1000L)))
    val stereo = out(1)
    assert((stereo.n_bytes, stereo.sample_rate, stereo.channels, stereo.bits,
      stereo.n_frames, stereo.mean_abs) == ((300L, 16000L, 2L, 16L, 64L, 500L)))
    // corrupt audio + image rows fall back deterministically (total fn)
    assert(out(2).bits == 16L && out(3).bits == 16L)
    assert(out.length == 4)
  }

  test("WAV decode is batch-boundary invariant") {
    import spark.implicits._
    val ds = spark.createDataset(MultimodalOps.MediaFixtures.audioRows)
    val a = MultimodalOps.decodeAudioMeta(ds, batchSize = 1).collect().sortBy(_.doc_id)
    val b = MultimodalOps.decodeAudioMeta(ds, batchSize = 64).collect().sortBy(_.doc_id)
    assert(a.sameElements(b))
  }

  test("MP4 decoder: ISO-BMFF box walk through the batched path") {
    import spark.implicits._
    val out = MultimodalOps.decodeVideoMeta(
      spark.createDataset(MultimodalOps.MediaFixtures.videoRows), batchSize = 3)
      .collect().sortBy(_.doc_id)
    // hand-derived from the synthesis parameters: n_bytes = 160 +
    // 100·tracks; duration_ms = duration·1000 div timescale; 16.16
    // fixed dims; the 2-track clip's max dims come from the video track
    val one = out(0)
    assert((one.n_bytes, one.brand, one.n_tracks, one.timescale,
      one.duration_ms, one.width, one.height) ==
      ((260L, "isom", 1L, 600L, 3000L, 320L, 240L)))
    val two = out(1)
    assert((two.n_bytes, two.brand, two.n_tracks, two.timescale,
      two.duration_ms, two.width, two.height) ==
      ((360L, "mp42", 2L, 1000L, 2500L, 640L, 360L)))
    // corrupt-video + audio rows fall back deterministically (total fn)
    assert(out(2).brand.length == 4 && out(2).timescale >= 600L)
    assert(out(3).media_type == "audio")
    assert(out.length == 4)
  }

  test("MP4 decode is batch-boundary invariant and rejects truncation") {
    import spark.implicits._
    val ds = spark.createDataset(MultimodalOps.MediaFixtures.videoRows)
    val a = MultimodalOps.decodeVideoMeta(ds, batchSize = 1).collect().sortBy(_.doc_id)
    val b = MultimodalOps.decodeVideoMeta(ds, batchSize = 64).collect().sortBy(_.doc_id)
    assert(a.sameElements(b))
    // a valid clip truncated mid-moov must take the fallback, not throw
    // or return half-parsed values
    val cut = MultimodalOps.MediaFixtures.mp4OneTrack.take(100)
    val c = MultimodalOps.decodeVideoMeta(
      spark.createDataset(Seq(MultimodalOps.MediaRow(9L, cut, "video"))))
      .collect().head
    assert(c.brand != "isom" && c.n_bytes == 100L)
  }
}
