package graft.ops

/** Minimal MJPEG-in-AVI container codec — the pure-JVM video path.
  *
  * AVI is a RIFF container; MJPEG video frames are ordinary JPEG images
  * inside `00dc` chunks of the `movi` list — so container parsing plus
  * `javax.imageio` gives REAL frame extraction with no native codec
  * dependency, the same way the PNG/WAV paths work
  * ([[Multimodal.decodeImageStats]], [[Multimodal.decodeAudioStats]]).
  *
  * The writer emits a spec-shaped file (RIFF/AVI → hdrl(avih, strl(strh
  * 'vids'/'MJPG', strf BITMAPINFOHEADER)) → movi(00dc…)); the reader is a
  * TOLERANT RIFF walker: it recurses only into `movi`/`rec ` lists,
  * collects `##dc`/`##db` payloads in stream order, and treats any
  * malformed chunk size or truncation as end-of-stream rather than a task
  * failure (C4: one corrupt video must never kill a partition).
  */
object Avi {

  private def u32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def u16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def cc(s: String): Array[Byte] = {
    require(s.length == 4, s"fourcc must be 4 chars: '$s'")
    s.getBytes("US-ASCII")
  }

  private def chunk(fourcc: String, payload: Array[Byte]): Array[Byte] = {
    val pad = if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    cc(fourcc) ++ u32(payload.length.toLong) ++ payload ++ pad
  }
  private def list(listType: String, body: Array[Byte]): Array[Byte] =
    cc("LIST") ++ u32(body.length + 4L) ++ cc(listType) ++ body

  /** Assemble an MJPEG AVI from per-frame JPEG payloads. */
  def write(jpegFrames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int = 10): Array[Byte] = {
    require(fps > 0, "fps must be positive")
    val n = jpegFrames.length
    val bufSize = (jpegFrames.map(_.length) :+ 0).max
    val avih = u32(1000000L / fps) ++ u32(0L) ++ u32(0L) ++ u32(0L) ++
      u32(n.toLong) ++ u32(0L) ++ u32(1L) ++ u32(bufSize.toLong) ++
      u32(width.toLong) ++ u32(height.toLong) ++ Array.fill(16)(0.toByte)
    val strh = cc("vids") ++ cc("MJPG") ++ u32(0L) ++ u16(0) ++ u16(0) ++
      u32(0L) ++ u32(1L) ++ u32(fps.toLong) ++ u32(0L) ++ u32(n.toLong) ++
      u32(bufSize.toLong) ++ u32(0xffffffffL) ++ u32(0L) ++
      u16(0) ++ u16(0) ++ u16(width) ++ u16(height)
    val strf = u32(40L) ++ u32(width.toLong) ++ u32(height.toLong) ++
      u16(1) ++ u16(24) ++ cc("MJPG") ++ u32(width.toLong * height * 3) ++
      u32(0L) ++ u32(0L) ++ u32(0L) ++ u32(0L)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      jpegFrames.iterator.map(chunk("00dc", _)).foldLeft(Array.empty[Byte])(_ ++ _))
    val body = cc("AVI ") ++ hdrl ++ movi
    cc("RIFF") ++ u32(body.length.toLong) ++ body
  }

  private def readU32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
  private def fourccAt(b: Array[Byte], p: Int): String =
    new String(b, p, 4, "US-ASCII")

  private def isFrame(fcc: String): Boolean =
    fcc.length == 4 && fcc(0).isDigit && fcc(1).isDigit &&
      fcc(2) == 'd' && (fcc(3) == 'c' || fcc(3) == 'b')

  /** All video frame payloads (`##dc`/`##db` inside `movi`), in stream
    * order. Malformed input — not RIFF/AVI, truncated chunk, absurd size —
    * yields the frames read so far (possibly none), never an exception.
    */
  def readFrames(bytes: Array[Byte]): Vector[Array[Byte]] = {
    val out = Vector.newBuilder[Array[Byte]]
    def walk(start: Int, end: Int, inMovi: Boolean): Unit = {
      var p = start
      while (p + 8 <= end) {
        val fcc = fourccAt(bytes, p)
        val size = readU32(bytes, p + 4)
        val payloadStart = p + 8
        if (size < 0 || payloadStart + size > end) return // truncated: stop
        if (fcc == "LIST" && size >= 4) {
          val listType = fourccAt(bytes, payloadStart)
          if (listType == "movi" || listType == "rec ")
            walk(payloadStart + 4, payloadStart + size.toInt, inMovi = true)
          // other lists (hdrl, strl, …) carry no frames — skip whole
        } else if (inMovi && isFrame(fcc)) {
          out += java.util.Arrays.copyOfRange(bytes, payloadStart,
            payloadStart + size.toInt)
        }
        p = payloadStart + size.toInt + (size & 1L).toInt // chunks pad to even
      }
    }
    if (bytes == null || bytes.length < 12 ||
      fourccAt(bytes, 0) != "RIFF" || fourccAt(bytes, 8) != "AVI ")
      return Vector.empty
    val riffSize = readU32(bytes, 4)
    val end = math.min(bytes.length.toLong, 8L + riffSize).toInt
    walk(12, end, inMovi = false)
    out.result()
  }
}
