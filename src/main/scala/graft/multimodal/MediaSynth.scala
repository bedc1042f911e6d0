package graft.multimodal

import java.io.{ByteArrayOutputStream, DataOutputStream}

/** Deterministic in-memory media synthesizers — the GENERATOR side of the
  * multimodal correctness gates (m1/m2 in [[graft.queries.MultimodalQueries]]):
  * each payload is a real file (PNG via ImageIO, canonical PCM16 WAV,
  * MJPEG-in-AVI via [[Avi.encodeMjpeg]]) whose decoded metadata and features
  * are PURE ARITHMETIC in the generation parameters, so an external engine
  * with no codec can predict the decode result exactly. Doubles as the
  * media-shaped test-data generator (size-skew fixtures, codec smoke data).
  *
  * All three builders run executor-side inside `Dataset.map` — no driver
  * materialization, no files on disk. */
object MediaSynth {

  /** A real PNG of one flat RGB color. PNG is lossless and ImageIO's reader
    * reports format "png", so decode yields exactly (png, w, h) and every
    * pixel — hence every [[Multimodal.imageFeatures]] grid cell of the
    * bilinear thumbnail — carries luma `(r*299 + g*587 + b*114) / 1000`
    * (integer division), computable by any engine from (w, h, rgb). */
  def flatPng(w: Int, h: Int, rgb: Int): Array[Byte] = {
    require(w > 0 && h > 0, "need positive dimensions")
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb & 0xffffff))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** A canonical mono PCM16 WAV whose every sample is the constant `amp`:
    * decode metadata is (sampleRate, nSamples*1000/sampleRate) and the RMS
    * of every [[Multimodal.audioFeatures]] segment is exactly amp/32768 —
    * so the feature value log1p(amp/32768*100) inverts to `amp` by integer
    * rounding, again codec-free arithmetic. */
  def constWav(sampleRate: Int, nSamples: Int, amp: Int): Array[Byte] = {
    require(amp >= Short.MinValue && amp <= Short.MaxValue, s"amp $amp not a PCM16 sample")
    val data = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      data(i * 2) = (amp & 0xff).toByte
      data(i * 2 + 1) = ((amp >> 8) & 0xff).toByte
      i += 1
    }
    val bos = new ByteArrayOutputStream()
    val d = new DataOutputStream(bos)
    def le32(v: Int): Unit = { d.write(v & 0xff); d.write((v >> 8) & 0xff)
      d.write((v >> 16) & 0xff); d.write((v >> 24) & 0xff) }
    def le16(v: Int): Unit = { d.write(v & 0xff); d.write((v >> 8) & 0xff) }
    d.writeBytes("RIFF"); le32(36 + data.length); d.writeBytes("WAVE")
    d.writeBytes("fmt "); le32(16); le16(1 /* PCM */); le16(1 /* mono */)
    le32(sampleRate); le32(sampleRate * 2); le16(2); le16(16)
    d.writeBytes("data"); le32(data.length); d.write(data)
    bos.toByteArray
  }

  /** A real MJPEG-in-AVI clip of `nFrames` flat-color frames: decode
    * metadata is (w, h, nFrames) with duration
    * `(1000000 / fps) * nFrames / 1000` ms — both integer divisions, the
    * exact arithmetic [[Avi.decodeMeta]] performs on the header fields. */
  def flatAvi(w: Int, h: Int, nFrames: Int, fps: Int, rgb: Int = 0x336699): Array[Byte] = {
    val frames = (0 until nFrames).map { _ =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(rgb & 0xffffff))
      g.fillRect(0, 0, w, h)
      g.dispose()
      img
    }
    Avi.encodeMjpeg(frames, fps)
  }
}
