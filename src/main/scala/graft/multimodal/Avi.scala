package graft.multimodal

import java.io.ByteArrayOutputStream

/** Pure-JVM MJPEG/AVI codec: an AVI file is a RIFF container (the same
  * chunk grammar as WAV, parsed in [[Multimodal.decodeWavMeta]]) whose
  * `movi` list carries one compressed chunk per frame; with the MJPG
  * handler every frame chunk is a standalone baseline JPEG — which the
  * JDK's ImageIO decodes natively. So a real video decode path needs no
  * external codec at all: RIFF walk + per-frame ImageIO.
  *
  * Layout handled (the canonical single-video-stream file):
  * {{{
  * RIFF(AVI ) → LIST(hdrl) → avih(56B main header: usPerFrame, totalFrames,
  *                                 width, height)
  *                         → LIST(strl) → strh('vids'/'MJPG', scale/rate)
  *                                      → strf(BITMAPINFOHEADER)
  *            → LIST(movi) → '00dc'/'00db' chunks (one JPEG per frame)
  *            → idx1 (optional; reader tolerates absence)
  * }}}
  *
  * The reference treats media as opaque payloads; this module is part of
  * the beyond-reference multimodal surface (SURVEY §2.12-adjacent): real
  * metadata + frame decode so video near-dup search runs on decoded
  * features, not byte hashes.
  */
object Avi {

  final case class AviMeta(width: Int, height: Int, usPerFrame: Int, nFrames: Int) {
    def durationMs: Long = usPerFrame.toLong * nFrames / 1000L
  }

  // ------------------------------------------------------------ reading

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    if (o + 4 <= b.length) new String(b, o, 4, "US-ASCII") else ""

  /** Main-header metadata, or None when the payload isn't an AVI. */
  def decodeMeta(bytes: Array[Byte]): Option[AviMeta] = {
    try {
      if (bytes == null || bytes.length < 64 ||
        tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "AVI ") return None
      // the avih chunk sits inside LIST(hdrl); a flat scan for the fourcc
      // is safe because "avih" cannot appear as chunk payload before the
      // header in a well-formed file's first kilobyte
      var o = 12
      while (o + 8 <= bytes.length) {
        val t = tag(bytes, o)
        val sz = le32(bytes, o + 4)
        if (sz < 0) return None // corrupt size dword would stall the walk
        if (t == "avih") {
          val p = o + 8
          return Some(AviMeta(
            width = le32(bytes, p + 32), height = le32(bytes, p + 36),
            usPerFrame = le32(bytes, p), nFrames = le32(bytes, p + 16)))
        }
        // descend into LISTs (hdrl wraps avih), skip over plain chunks
        o += (if (t == "LIST") 12 else 8 + sz + (sz & 1))
      }
      None
    } catch { case _: Throwable => None }
  }

  /** All frame payloads (each a standalone JPEG for MJPG) in stream
    * order. Tolerates a missing idx1 — frames come straight from the
    * movi walk. */
  def framePayloads(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    try {
      if (bytes == null || tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "AVI ")
        return Nil
      // locate LIST(movi), then walk its children
      var o = 12
      while (o + 12 <= bytes.length) {
        val t = tag(bytes, o)
        val sz = le32(bytes, o + 4)
        if (sz < 0) return out.result() // corrupt size dword would stall the walk
        if (t == "LIST" && tag(bytes, o + 8) == "movi") {
          var c = o + 12
          val end = math.min(o + 8 + sz, bytes.length)
          while (c + 8 <= end) {
            val ct = tag(bytes, c)
            val csz = le32(bytes, c + 4)
            if (csz < 0) return out.result()
            if ((ct.endsWith("dc") || ct.endsWith("db")) && c + 8 + csz <= bytes.length)
              out += java.util.Arrays.copyOfRange(bytes, c + 8, c + 8 + csz)
            c += 8 + csz + (csz & 1)
          }
          return out.result()
        }
        o += (if (t == "LIST" && tag(bytes, o + 8) == "hdrl") 12 else 8 + sz + (sz & 1))
      }
      out.result()
    } catch { case _: Throwable => out.result() }
  }

  /** Decode every `everyN`-th frame to a BufferedImage (MJPG → ImageIO).
    * Returns (frame_idx, image); frames that fail to decode are skipped. */
  def sampledFrames(bytes: Array[Byte], everyN: Int): Seq[(Int, java.awt.image.BufferedImage)] = {
    val payloads = framePayloads(bytes)
    (payloads.indices by math.max(1, everyN)).flatMap { i =>
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payloads(i))))
        .map(i -> _)
      catch { case _: Throwable => None }
    }
  }

  // ------------------------------------------------------------ writing

  private def le32b(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16b(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write(fourcc(id)); o.write(le32b(body.length)); o.write(body)
    if ((body.length & 1) == 1) o.write(0) // RIFF chunks are word-aligned
    o.toByteArray
  }
  private def list(kind: String, body: Array[Byte]): Array[Byte] =
    chunk("LIST", fourcc(kind) ++ body)

  /** Encode frames as an MJPEG AVI (each frame JPEG-compressed via
    * ImageIO). Used by specs to synthesize fixtures and as a real
    * round-trip writer. */
  def encodeMjpeg(frames: Seq[java.awt.image.BufferedImage], fps: Int): Array[Byte] = {
    require(frames.nonEmpty, "at least one frame")
    val w = frames.head.getWidth
    val h = frames.head.getHeight
    val jpegs = frames.map { f =>
      val bo = new ByteArrayOutputStream()
      // MJPG frames must be plain baseline JPEGs — exactly what ImageIO's
      // default jpg writer emits
      javax.imageio.ImageIO.write(f, "jpg", bo)
      bo.toByteArray
    }
    val usPerFrame = 1000000 / math.max(1, fps)
    val maxSize = jpegs.map(_.length).max

    val avih = {
      val o = new ByteArrayOutputStream()
      o.write(le32b(usPerFrame)); o.write(le32b(maxSize * fps)); o.write(le32b(0))
      o.write(le32b(0x10 /* AVIF_HASINDEX */)); o.write(le32b(jpegs.length))
      o.write(le32b(0)); o.write(le32b(1 /* streams */)); o.write(le32b(maxSize))
      o.write(le32b(w)); o.write(le32b(h))
      (0 until 4).foreach(_ => o.write(le32b(0)))
      chunk("avih", o.toByteArray)
    }
    val strh = {
      val o = new ByteArrayOutputStream()
      o.write(fourcc("vids")); o.write(fourcc("MJPG"))
      o.write(le32b(0)); o.write(le16b(0)); o.write(le16b(0)) // flags, prio, lang
      o.write(le32b(0)) // initial frames
      o.write(le32b(1)); o.write(le32b(fps)) // scale / rate
      o.write(le32b(0)); o.write(le32b(jpegs.length)) // start / length
      o.write(le32b(maxSize)); o.write(le32b(-1)) // bufsize, quality
      o.write(le32b(0)) // sample size
      o.write(le16b(0)); o.write(le16b(0)); o.write(le16b(w)); o.write(le16b(h)) // rcFrame
      chunk("strh", o.toByteArray)
    }
    val strf = {
      val o = new ByteArrayOutputStream()
      o.write(le32b(40)); o.write(le32b(w)); o.write(le32b(h))
      o.write(le16b(1)); o.write(le16b(24)) // planes, bitcount
      o.write(fourcc("MJPG")); o.write(le32b(w * h * 3))
      o.write(le32b(0)); o.write(le32b(0)); o.write(le32b(0)); o.write(le32b(0))
      chunk("strf", o.toByteArray)
    }
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))

    val moviBody = new ByteArrayOutputStream()
    val offsets = jpegs.map { j =>
      val off = moviBody.size() + 4 // offset of the ckid relative to 'movi'
      moviBody.write(chunk("00dc", j))
      off
    }
    val movi = list("movi", moviBody.toByteArray)
    val idx1 = {
      val o = new ByteArrayOutputStream()
      jpegs.zip(offsets).foreach { case (j, off) =>
        o.write(fourcc("00dc")); o.write(le32b(0x10 /* KEYFRAME */))
        o.write(le32b(off)); o.write(le32b(j.length))
      }
      chunk("idx1", o.toByteArray)
    }

    val body = fourcc("AVI ") ++ hdrl ++ movi ++ idx1
    chunk("RIFF", body)
  }
}
