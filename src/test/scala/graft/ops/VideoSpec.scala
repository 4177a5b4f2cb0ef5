package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MJPEG/AVI video path: container roundtrip, tolerant parsing, frame
  * sampling on the real stream, and the no-task-failure decode contract.
  */
class VideoSpec extends SparkSpec {
  import spark.implicits._

  private def jpeg(rgb: Int, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    baos.toByteArray
  }

  test("Avi.write → Avi.readFrames roundtrips every frame byte-identically") {
    val frames = Seq(jpeg(0x405060, 16, 12), jpeg(0x807060, 16, 12),
      jpeg(0x31AA77, 16, 12))
    val avi = Avi.write(frames, 16, 12)
    val back = Avi.readFrames(avi)
    assert(back.size == 3)
    back.zip(frames).foreach { case (b, f) =>
      assert(java.util.Arrays.equals(b, f), "frame payload mutated in container")
    }
  }

  test("reader tolerance: garbage, truncation and junk chunks never throw") {
    assert(Avi.readFrames(null) == Vector.empty)
    assert(Avi.readFrames(Array.empty[Byte]) == Vector.empty)
    assert(Avi.readFrames("not a riff file at all".getBytes) == Vector.empty)
    val good = Avi.write(Seq(jpeg(0x102030, 8, 8), jpeg(0x405060, 8, 8)), 8, 8)
    // truncating mid-frame yields the frames before the cut, no exception
    val cut = java.util.Arrays.copyOfRange(good, 0, good.length - 10)
    assert(Avi.readFrames(cut).size <= 2)
    // flipping the declared RIFF size to an absurd value is also survived
    val mangled = good.clone()
    mangled(4) = 0xff.toByte; mangled(5) = 0xff.toByte
    Avi.readFrames(mangled) // must not throw
    // a JUNK chunk inserted before movi is skipped, frames still found
    val junk = "JUNK".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++
      Array[Byte](1, 2, 3, 4)
    val hdrEnd = 12 // splice right after RIFF....AVI<sp>
    val spliced = good.take(hdrEnd) ++ junk ++ good.drop(hdrEnd)
    // fix outer RIFF size (+12)
    val sz = ((good.length - 8) + junk.length).toLong
    spliced(4) = (sz & 0xff).toByte; spliced(5) = ((sz >> 8) & 0xff).toByte
    spliced(6) = ((sz >> 16) & 0xff).toByte; spliced(7) = ((sz >> 24) & 0xff).toByte
    assert(Avi.readFrames(spliced).size == 2, "junk chunk broke the walk")
  }

  test("decodeVideoFrames: real sampling + solid colors within JPEG tolerance") {
    val docs = (0L until 40L).map(Tuple1(_)).toDF("doc_id")
    val media = Multimodal.encodeAviFixture(docs)
    val rows = Multimodal.decodeVideoFrames(media, everyNth = 3)
      .collect()
    assert(rows.forall(_.ok), "fixture video failed to decode")
    // exactly the every-3rd frame indices of each id's closed-form count
    val expected = (0L until 40L).flatMap { id =>
      (0 until Multimodal.fixtureFrameCount(id) by 3).map(f => (id, f))
    }.toSet
    assert(rows.map(r => (r.media_id, r.frame_idx)).toSet == expected)
    rows.foreach { r =>
      val (w, h) = Multimodal.fixtureDims(r.media_id)
      assert((r.width, r.height) == (w, h))
      val (er, eg, eb) = Multimodal.fixtureFrameRgb(r.media_id, r.frame_idx)
      assert(math.abs(r.mean_r - er) <= 8 && math.abs(r.mean_g - eg) <= 8 &&
        math.abs(r.mean_b - eb) <= 8,
        s"decoded mean (${r.mean_r},${r.mean_g},${r.mean_b}) far from ($er,$eg,$eb)")
    }
  }

  test("decode contract: a corrupt container yields ok=false, not a task failure") {
    import Multimodal.{Media, MediaMeta}
    val bad = Seq(
      Media(1L, "video", "garbage".getBytes, MediaMeta("avi", 8, 8, 3)),
      Media(2L, "video", null, MediaMeta("avi", 8, 8, 3)))
    val df = spark.createDataFrame(bad)
    val rows = Multimodal.decodeVideoFrames(df, everyNth = 1).collect()
    assert(rows.length == 2 && rows.forall(!_.ok))
    assert(rows.map(_.media_id).toSet == Set(1L, 2L))
  }
}
