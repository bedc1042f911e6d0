package graft.queries

import graft.Tables
import graft.multimodal.{MediaSynth, Multimodal}
import org.apache.spark.sql.functions._

/** Oracle-gated multimodal queries: real codec round trips whose expected
  * output is pure arithmetic in the generation parameters.
  *
  * The gate construction mirrors s3_xml_roundtrip: the query SYNTHESIZES
  * real media payloads (PNG via ImageIO, canonical PCM16 WAV, MJPEG-in-AVI)
  * from supplier keys executor-side, runs them through the REAL decoders in
  * [[graft.multimodal.Multimodal]], and the DuckDB oracle — which has no
  * codec at all — predicts every decoded value from the same keys with
  * integer arithmetic ([[MediaSynth]] documents each identity). Any defect
  * in the encoder, the RIFF/PNG/AVI parse, the bilinear thumbnail, or the
  * RMS fold hash-mismatches the row.
  *
  * Scale shape: generation and decode are one `mapPartitions` pass each —
  * no shuffle, no driver materialization; at 100 TB the same plan applies
  * to stored payload columns instead of synthesized ones. */
object MultimodalQueries extends QueryPack {

  override def queries: Map[String, Q] = Map(

    // ---- M1: metadata decode round trip (image + audio + video). Every
    //      payload is a real file; format/width/height/sample_rate/
    //      duration_ms/n_frames come out of the real parsers and must equal
    //      the oracle's closed-form arithmetic.
    "m1_media_meta" -> ((s, dir) => {
      import s.implicits._
      val keys = Tables.supplier(s, dir).select(col("s_suppkey").as("k")).as[Long]
      val media = keys.flatMap { k =>
        Seq(
          Multimodal.MediaRow(k * 10 + 1, "image",
            MediaSynth.flatPng((16 + k % 17).toInt, (9 + k % 13).toInt,
              (k * 2654435761L).toInt & 0xffffff)),
          Multimodal.MediaRow(k * 10 + 2, "audio",
            MediaSynth.constWav(8000 + (k % 8).toInt * 1000,
              500 + (k % 251).toInt, 1000)),
          Multimodal.MediaRow(k * 10 + 3, "video",
            MediaSynth.flatAvi((12 + (k % 5) * 2).toInt, (8 + (k % 3) * 2).toInt,
              2 + (k % 4).toInt, 4 + (k % 3).toInt)))
      }
      Multimodal.decode(media)
        .select(col("media_id"), col("kind"),
          col("metadata.format").as("format"),
          col("metadata.width").as("width"),
          col("metadata.height").as("height"),
          col("metadata.sample_rate").as("sample_rate"),
          col("metadata.duration_ms").as("duration_ms"),
          col("metadata.n_frames").as("n_frames"))
        .orderBy(col("media_id"))
    }),

    // ---- M3: video frame fan-out — every 2nd MJPEG frame of each clip is
    //      REALLY decoded (RIFF walk + per-frame ImageIO) and featurized;
    //      the gated values are the fan-out row counts, sampled indices,
    //      and feature arity, all closed-form in (n_frames, everyN). Frame
    //      pixel values stay spec-level only: JPEG is lossy, so cell luma
    //      is not oracle-predictable the way m2's PNG luma is.
    "m3_video_frames" -> ((s, dir) => {
      import s.implicits._
      val keys = Tables.supplier(s, dir).select(col("s_suppkey").as("k")).as[Long]
      val media = keys.map { k =>
        Multimodal.MediaRow(k, "video",
          MediaSynth.flatAvi(16, 12, (3 + k % 7).toInt, 5))
      }
      Multimodal.videoFrameFeatures(media, everyN = 2).toDF()
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_sampled"),
          max(col("frame_idx")).cast("long").as("last_idx"),
          sum(size(col("feature"))).as("n_values"))
        .orderBy(col("media_id"))
    }),

    // ---- M2: feature-extraction round trip. Flat-color PNG → every
    //      bilinear grid cell carries the integer luma; constant-sample WAV
    //      → every RMS segment inverts to the amplitude. The query UNDOES
    //      the float feature transform back to the exact integer the oracle
    //      derives from the key (float→int inversion keeps the gate immune
    //      to last-ulp float drift — SCALE.md's integer-exact rule).
    "m2_media_features" -> ((s, dir) => {
      import s.implicits._
      val keys = Tables.supplier(s, dir).select(col("s_suppkey").as("k")).as[Long]
      val images = keys.map { k =>
        val rgb = (((k % 256) << 16) | (((k * 7) % 256) << 8) | ((k * 13) % 256)).toInt
        Multimodal.MediaRow(k * 10 + 1, "image",
          MediaSynth.flatPng((16 + k % 9).toInt, (8 + k % 7).toInt, rgb))
      }
      val audio = keys.map { k =>
        Multimodal.MediaRow(k * 10 + 2, "audio",
          MediaSynth.constWav(16000, 800, 1000 + (k % 29).toInt * 500))
      }
      val imgRec = Multimodal.imageFeatures(images).toDF()
        .select(col("media_id"), col("kind"),
          // luma = round((cell + 0.5) * 255): exact integer recovery
          round((element_at(col("feature"), 1).cast("double") + 0.5d) * 255.0d)
            .cast("int").as("recovered"))
      val audRec = Multimodal.audioFeatures(audio).toDF()
        .select(col("media_id"), col("kind"),
          // amp = round(expm1(seg) * 32768 / 100): inverts log1p(rms*100)
          round((exp(element_at(col("feature"), 1).cast("double")) - 1.0d)
            * 32768.0d / 100.0d).cast("int").as("recovered"))
      imgRec.unionAll(audRec).orderBy(col("media_id"))
    }),

    // ---- M4: visual dedup decision — images dedup'd on the PERCEPTUAL
    //      fingerprint (decode → 8×8 quantized luma grid → 60-bit md5
    //      prefix), the d1 shape on media. Payloads are planted in 12
    //      color groups but with sizes varying per KEY, so group members
    //      are different files/resolutions — fp equality is resize
    //      invariance, not byte equality. The oracle predicts the luma
    //      integer per group, replays the md5, and picks min-id reps.
    "m4_image_dedup" -> ((s, dir) => {
      import s.implicits._
      val keys = Tables.supplier(s, dir).select(col("s_suppkey").as("k")).as[Long]
      val images = keys.map { k =>
        val g = (k % 12).toInt
        val rgb = (((g * 17 + 5) % 256) << 16) | (((g * 29 + 3) % 256) << 8) |
          ((g * 41 + 7) % 256)
        Multimodal.MediaRow(k, "image",
          MediaSynth.flatPng((16 + k % 5).toInt, (8 + k % 3).toInt, rgb))
      }
      Multimodal.dedupByFingerprint(Multimodal.imageFingerprints(images))
        .orderBy(col("media_id"))
    }),

    // ---- M5: audio dedup decision — m4's shape on the WAV path: clips
    //      planted in 10 amplitude groups with per-key durations and
    //      sample rates, so fp equality is envelope invariance (same RMS
    //      profile), not byte equality. The RMS→amplitude recovery is
    //      integer-exact for PCM16 (the m2 identity), so the oracle
    //      replays the fingerprint codec-free.
    "m5_audio_dedup" -> ((s, dir) => {
      import s.implicits._
      val keys = Tables.supplier(s, dir).select(col("s_suppkey").as("k")).as[Long]
      val clips = keys.map { k =>
        Multimodal.MediaRow(k, "audio",
          MediaSynth.constWav(8000 + (k % 5).toInt * 1000,
            400 + (k % 7).toInt * 100, 600 + (k % 10).toInt * 700))
      }
      Multimodal.dedupByFingerprint(Multimodal.audioFingerprints(clips))
        .orderBy(col("media_id"))
    }))

  override def oracle: Map[String, String] = Map(

    "m1_media_meta" ->
      """WITH k AS (SELECT s_suppkey AS k FROM supplier)
        |SELECT k*10+1 AS media_id, 'image' AS kind, 'png' AS format,
        |  CAST(16 + k % 17 AS INTEGER) AS width,
        |  CAST(9 + k % 13 AS INTEGER) AS height,
        |  0 AS sample_rate, CAST(0 AS BIGINT) AS duration_ms, 1 AS n_frames
        |FROM k
        |UNION ALL
        |SELECT k*10+2, 'audio', 'wav', 0, 0,
        |  CAST(8000 + (k % 8) * 1000 AS INTEGER),
        |  CAST((500 + k % 251) * 1000 // (8000 + (k % 8) * 1000) AS BIGINT), 0
        |FROM k
        |UNION ALL
        |SELECT k*10+3, 'video', 'avi/mjpeg',
        |  CAST(12 + (k % 5) * 2 AS INTEGER), CAST(8 + (k % 3) * 2 AS INTEGER),
        |  0, CAST((1000000 // (4 + k % 3)) * (2 + k % 4) // 1000 AS BIGINT),
        |  CAST(2 + k % 4 AS INTEGER)
        |FROM k
        |ORDER BY media_id""".stripMargin,

    "m3_video_frames" ->
      """WITH k AS (SELECT s_suppkey AS k FROM supplier),
        |v AS (SELECT k AS media_id, 3 + k % 7 AS nf FROM k)
        |SELECT media_id,
        |  (nf - 1) // 2 + 1 AS n_sampled,
        |  CAST(((nf - 1) // 2) * 2 AS BIGINT) AS last_idx,
        |  CAST(((nf - 1) // 2 + 1) * 64 AS BIGINT) AS n_values
        |FROM v ORDER BY media_id""".stripMargin,

    "m4_image_dedup" ->
      """WITH k AS (SELECT s_suppkey AS k FROM supplier),
        |lum AS (SELECT k, CAST(
        |    (((k % 12) * 17 + 5) % 256) * 299 +
        |    (((k % 12) * 29 + 3) % 256) * 587 +
        |    (((k % 12) * 41 + 7) % 256) * 114 AS BIGINT) // 1000 AS l
        |  FROM k),
        |f AS (SELECT k AS media_id,
        |    CAST(concat('0x', substr(md5(array_to_string(
        |      [CAST(l AS VARCHAR) for i in range(64)], ',')), 1, 15)) AS BIGINT)
        |      AS fp
        |  FROM lum),
        |rep AS (SELECT fp, min(media_id) AS rep_id FROM f GROUP BY fp)
        |SELECT media_id, fp, rep_id, media_id <> rep_id AS is_dup
        |FROM f JOIN rep USING (fp) ORDER BY media_id""".stripMargin,

    "m5_audio_dedup" ->
      """WITH k AS (SELECT s_suppkey AS k FROM supplier),
        |f AS (SELECT k AS media_id,
        |    CAST(concat('0x', substr(md5(array_to_string(
        |      [CAST(600 + (k % 10) * 700 AS VARCHAR) for i in range(8)], ',')),
        |      1, 15)) AS BIGINT) AS fp
        |  FROM k),
        |rep AS (SELECT fp, min(media_id) AS rep_id FROM f GROUP BY fp)
        |SELECT media_id, fp, rep_id, media_id <> rep_id AS is_dup
        |FROM f JOIN rep USING (fp) ORDER BY media_id""".stripMargin,

    "m2_media_features" ->
      """WITH k AS (SELECT s_suppkey AS k FROM supplier)
        |SELECT k*10+1 AS media_id, 'image' AS kind,
        |  CAST(((k % 256) * 299 + ((k * 7) % 256) * 587 + ((k * 13) % 256) * 114)
        |    // 1000 AS INTEGER) AS recovered
        |FROM k
        |UNION ALL
        |SELECT k*10+2, 'audio', CAST(1000 + (k % 29) * 500 AS INTEGER)
        |FROM k
        |ORDER BY media_id""".stripMargin)
}
