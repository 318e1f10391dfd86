package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in batches.
  *
  * The driver tables carry no true media, so assets are derived
  * deterministically from `documents` (payload = UTF-8 bytes of the
  * text) — the POINT is the Spark-side shape: binary columns flow
  * through parquet scans/writes untouched, heavy per-asset work runs
  * in `mapPartitions` so decoder/model initialization amortizes once
  * per partition (the JVM analog of a batched pandas UDF), and
  * partition sizing is byte-based (`maxRecordsPerBatch`-style) since
  * media rows are orders of magnitude wider than tabular rows.
  *
  * All three modalities decode REAL containers AND their payloads:
  * [[WavCodec]] parses actual RIFF/WAVE audio and reads every 16-bit
  * PCM sample (`pcmStats`), [[BmpCodec]] actual Windows bitmaps with
  * a stride-aware walk of every pixel byte (`pixelSum`), [[AviCodec]]
  * actual AVI containers including a physical movi frame-list walk
  * and per-frame payload read (`framePayloadSum`) — [[mmWav]]/
  * [[mmBmp]]/[[mmAvi]] below encode on one side of the shuffle,
  * decode on the other, and the oracle recomputes header AND payload
  * statistics from the generation arithmetic. COMPRESSED decode is
  * real too: [[PngCodec]] (JDK ImageIO — zlib inflate + scanline
  * unfilter) roundtrips actual PNGs in [[mmPng]] with the lossless
  * pixel sum as the exact invariant, and [[JpegCodec]] roundtrips
  * actual LOSSY JPEGs in [[mmJpeg]], scored in-query with
  * bounded-error flags (the agg_approx pattern). MP3 and H.264 are
  * parsed at the full CONTAINER level ([[Mp3Codec]]: every frame
  * header + length-strided walk + payload sums; [[H264Codec]]:
  * Annex-B start-code scan + NAL classification + slice payload
  * sums) in [[mmMp3]]/[[mmH264]]; only their lossy PAYLOAD decode
  * (Huffman/MDCT audio, CABAC/transform slices) genuinely needs
  * media libraries this container doesn't ship — [[StubCodec]]
  * remains the honest deterministic stand-in for that last step on
  * the legacy `mm_features` surface. Swap the body, keep the
  * contract.
  */
object MultimodalOps {

  /** A decoded media asset's typed metadata. */
  final case class Decoded(width: Int, height: Int, nFrames: Int)

  /** Deterministic stand-in for a real codec (libjpeg/ffmpeg/...):
    * derives plausible dimensions from the payload alone so tests and
    * oracles can reproduce it anywhere. Replace with a real decoder
    * in deployment — callers only see the [[Decoded]] contract. */
  object StubCodec {
    def decode(payload: Array[Byte]): Decoded = {
      val n = payload.length
      Decoded(
        width = 64 + n % 577,
        height = 64 + (n * 31) % 433,
        nFrames = 1 + n % 24)
    }

    /** Deterministic "resize": the scaled dims a real resize would
      * produce (the byte transform itself is the stubbed part). */
    def resizedDims(d: Decoded, maxSide: Int): (Int, Int) = {
      val scale = math.min(1.0, maxSide.toDouble / math.max(d.width, d.height))
      (math.max(1, (d.width * scale).toInt), math.max(1, (d.height * scale).toInt))
    }

    /** Frame sampling: every k-th frame index, capped. */
    def sampleFrames(d: Decoded, stride: Int, cap: Int): Seq[Int] =
      (0 until d.nFrames by stride).take(cap)
  }

  /** Binary asset table derived from documents: (asset_id, kind,
    * payload BINARY, byte_len). */
  def assets(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d).select(
      col("doc_id").as("asset_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      col("text").cast("binary").as("payload"),
      octet_length(col("text").cast("binary")).as("byte_len"))

  /** Batched decode + feature extraction via mapPartitions: one codec
    * "init" per partition, then a streaming pass. Output is fully
    * typed (no binary) so downstream aggregation is columnar. */
  def extractFeatures(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val ds: Dataset[(Long, String, Array[Byte])] =
      assets(spark, d).select(col("asset_id"), col("kind"), col("payload"))
        .as[(Long, String, Array[Byte])]
    ds.mapPartitions { rows =>
      // per-partition init of the (stub) codec — amortized like a
      // model handle in a batched UDF
      val codec = StubCodec
      rows.map { case (id, kind, payload) =>
        val dec = codec.decode(payload)
        val (rw, rh) = codec.resizedDims(dec, 256)
        val frames = codec.sampleFrames(dec, 4, 8)
        (id, kind, payload.length, dec.width, dec.height, dec.nFrames,
          rw, rh, frames)
      }
    }.toDF("asset_id", "kind", "byte_len", "width", "height", "n_frames",
      "resized_w", "resized_h", "frame_idx")
  }

  /** Declared query: asset metadata + content hash + decoded dims —
    * everything DuckDB can recompute from `documents` (the stub codec
    * is plain arithmetic on byte_len). frame_idx is checked by
    * MultimodalSpec instead (list vs list comparisons are exercised
    * enough elsewhere). */
  def mmFeatures(spark: SparkSession, d: String): DataFrame =
    assets(spark, d).select(
      col("asset_id"), col("kind"), col("byte_len"),
      md5(col("payload")).as("content_md5"),
      lower(hex(substring(col("payload"), 1, 8))).as("head_hex"),
      (lit(64) + col("byte_len") % 577).as("width"),
      (lit(64) + (col("byte_len") * 31) % 433).as("height"),
      (lit(1) + col("byte_len") % 24).as("n_frames"))
      .orderBy("asset_id")

  // ---------------------------------------------------------------
  // Real audio modality: WAV container (graft.multimodal.WavCodec —
  // an actual RIFF chunk parser, not arithmetic). The stub remains for
  // image/video, whose codecs genuinely need libraries this container
  // doesn't ship.
  // ---------------------------------------------------------------

  private val SampleRates = Array(8000, 11025, 16000, 22050)

  /** Real WAV payloads for the corpus's audio assets, synthesized
    * deterministically from each document (format parameters keyed on
    * doc_id, one 16-bit frame per UTF-8 text byte). Built in
    * mapPartitions like any media transcode — binary out, streams
    * through parquet/shuffle untouched. */
  def wavAssets(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .where(col("doc_id") % 3 === 1) // the 'audio' rows of assets()
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val sr = SampleRates((id % 4).toInt)
          val ch = 1 + (id % 2).toInt
          // one frame per text byte, interleaved channels: a centered
          // 8-bit waveform scaled to 16-bit — real PCM, reproducible
          val samples = Array.tabulate[Short](bytes.length * ch) { i =>
            (((bytes(i / ch) & 0xff) - 128) << 8).toShort
          }
          (id, WavCodec.encode(sr, ch, samples))
        }
      }.toDF("asset_id", "wav")
  }

  /** Declared query: decode REAL WAV bytes back to typed audio
    * metadata. Every output field is read out of the RIFF container by
    * [[WavCodec.decode]] — the oracle recomputes the expected values
    * from the generation parameters, so a decoder that misparses any
    * header field hash-mismatches. (mapPartitions is the sanctioned
    * multimodal shape: per-partition codec init, batch-streamed rows.) */
  def mmWav(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val decoded = wavAssets(spark, d).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = WavCodec // per-partition codec handle
        rows.map { case (id, wav) =>
          val m = codec.decode(wav)
          // PAYLOAD decode too: every 16-bit sample read off the bytes
          val (sumAbs, peakAbs) = codec.pcmStats(wav)
          (id, wav.length.toLong, m.sampleRate.toLong, m.channels.toLong,
            m.bitsPerSample.toLong, m.nFrames, m.durationMs, sumAbs, peakAbs)
        }
      }
    decoded.toDF("asset_id", "wav_bytes", "sample_rate", "channels",
      "bits", "n_frames", "duration_ms", "sum_abs", "peak_abs")
      .orderBy("asset_id")
  }

  /** Declared query `mm_resample`: a real DSP pass over the audio
    * modality — decode every WAV, DECIMATE by 4 (keep every 4th
    * frame, all channels), re-encode at sr÷4, and prove the output
    * container by decoding it again for the emitted stats (the
    * `mm_thumbnail` pattern applied to audio). Everything after the
    * stride is read back off the RE-ENCODED bytes, so a resampler
    * that corrupts framing, header fields, or channel interleave
    * hash-mismatches. (Straight decimation aliases, a low-pass would
    * precede it in production — the container/stride plumbing is the
    * Spark-side contract here.) Per-asset work is frame-linear in
    * executors; no shuffle beyond the output ordering. */
  def mmResample(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val decoded = wavAssets(spark, d).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = WavCodec // per-partition codec handle
        rows.map { case (id, wav) =>
          val (m, smp) = codec.samples(wav)
          val ch = m.channels
          val nf = m.nFrames.toInt
          val out = new Array[Short]((nf + 3) / 4 * ch)
          var f = 0; var o = 0
          while (f < nf) {
            var c = 0
            while (c < ch) { out(o) = smp(f * ch + c); o += 1; c += 1 }
            f += 4
          }
          val outWav = codec.encode(m.sampleRate / 4, ch, out)
          val om = codec.decode(outWav)
          val (sumAbs, peakAbs) = codec.pcmStats(outWav)
          (id, m.sampleRate.toLong, om.sampleRate.toLong, m.nFrames,
            om.nFrames, outWav.length.toLong, sumAbs, peakAbs)
        }
      }
    decoded.toDF("asset_id", "in_sr", "out_sr", "in_frames", "out_frames",
      "out_bytes", "sum_abs", "peak_abs")
      .orderBy("asset_id")
  }

  /** Oracle: replays the decimation arithmetic off the generation
    * parameters — frame f of asset id is text byte f, so the strided
    * sum/peak are byte-table expressions; out_bytes is the canonical
    * 44-byte RIFF header plus 2·ch per kept frame. */
  def mmResampleSql: String =
    """WITH a AS (
      |  SELECT doc_id, octet_length(encode(text)) AS bl,
      |    hex(encode(text)) AS hx, 1 + doc_id % 2 AS ch,
      |    CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 11025
      |                    WHEN 2 THEN 16000 ELSE 22050 END AS sr
      |  FROM documents WHERE doc_id % 3 = 1),
      |s AS (
      |  SELECT doc_id, bl, ch, sr, (bl + 3) // 4 AS nf_out,
      |    COALESCE(list_sum(list_transform(range((bl + 3) // 4),
      |      f -> abs(('0x' || substr(hx, (4*f)*2 + 1, 2))::BIGINT - 128) * 256 * ch)), 0) AS sabs,
      |    COALESCE(list_max(list_transform(range((bl + 3) // 4),
      |      f -> abs(('0x' || substr(hx, (4*f)*2 + 1, 2))::BIGINT - 128) * 256)), 0) AS pk
      |  FROM a)
      |SELECT doc_id AS asset_id, CAST(sr AS BIGINT) AS in_sr,
      |  CAST(sr // 4 AS BIGINT) AS out_sr,
      |  CAST(bl AS BIGINT) AS in_frames, CAST(nf_out AS BIGINT) AS out_frames,
      |  CAST(44 + nf_out * 2 * ch AS BIGINT) AS out_bytes,
      |  CAST(sabs AS BIGINT) AS sum_abs, CAST(pk AS BIGINT) AS peak_abs
      |FROM s ORDER BY asset_id""".stripMargin

  /** Hamming threshold for `mm_phash_dedup` — MUST stay ≤ 11: the
    * 4 × 16-bit multi-probe banding below probes each band out to
    * radius 2, which is pigeonhole-exact only while
    * `threshold < bands * (radius + 1)`. */
  private val PhashMaxHamming = 10

  /** Per-band probe radius and the XOR masks enumerating every 16-bit
    * value within that radius: 1 (self) + 16 (1-bit) + 120 (2-bit)
    * = 137 masks. */
  private val PhashProbeMasks: Array[Long] = {
    val one = (0 until 16).map(i => (1L << i))
    (Seq(0L) ++ one ++ (for {
      i <- 0 until 16; j <- i + 1 until 16
    } yield (1L << i) | (1L << j))).toArray
  }

  /** Perceptual near-duplicate detection over the IMAGE modality —
    * the multimodal face of the dedup family: every BMP asset decodes
    * to a 64-bit average-hash ([[BmpCodec.phash64]] — 8×8 floor-
    * mapped luminance vs mean), and pairs within Hamming distance
    * [[PhashMaxHamming]] are reported with their distance.
    *
    * Scale shape — multi-index Hamming search (Norouzi/Punjani/Fleet,
    * CVPR'12) on GROUPS of identical hashes:
    *  1. assets collapse to distinct (h1,h2) groups first, so a block
    *     of byte-identical images costs one row in the candidate join
    *     (its clique reappears only in the final, output-bound member
    *     expansion) — exact-dup skew cannot inflate the join;
    *  2. the 64-bit hash splits into 4 × 16-bit bands; by pigeonhole a
    *     pair within distance 10 agrees to within 2 bits on some band
    *     (4 bands × 3 errors each would already be 12 > 10), so each
    *     band value is probed at XOR radius ≤ 2 (137 masks) and
    *     candidates come from an EQUI-join of probes against exact
    *     band values. 16-bit keys give 65 536 buckets per band —
    *     random collisions stay rare as the corpus grows, unlike a
    *     4-bit banding whose 16 buckets force Θ(n²/16) accidental
    *     candidates per band. Probe fan-out is a CONSTANT 548 rows
    *     per distinct hash: the whole build is linear in assets.
    * Candidates are verified with two integer XOR/popcounts; the
    * |assets|² nested-loop the oracle replays never runs here. The
    * hash is split h1/h2 (32 bits each) so no arithmetic touches the
    * sign bit. */
  def mmPhashDedup(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val ph = bmpAssets(spark, d).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = BmpCodec
        rows.map { case (id, bmp) =>
          val (h1, h2) = codec.phash64(bmp); (id, h1, h2)
        }
      }.toDF("asset_id", "h1", "h2")
      .localCheckpoint(false) // read by the group build + member expansion
    // One row per DISTINCT hash; gid = min member id (stable, join-free).
    val grp = ph.groupBy(col("h1"), col("h2"))
      .agg(min(col("asset_id")).as("gid"))
      .localCheckpoint(false) // read by probes, exacts, and twice for verify
    val masks = PhashProbeMasks
    val probes = grp.as[(Long, Long, Long)].flatMap { case (h1, h2, gid) =>
      val bands = Array(h1 & 0xffffL, (h1 >>> 16) & 0xffffL,
        h2 & 0xffffL, (h2 >>> 16) & 0xffffL)
      for { bi <- 0 until 4; m <- masks } yield (bi, bands(bi) ^ m, gid)
    }.toDF("bi", "pv", "pg")
    val exactBands = (0 until 4).map { bi =>
      val src = if (bi < 2) col("h1") else col("h2")
      struct(lit(bi).as("bi"),
        shiftright(src, 16 * (bi % 2)).bitwiseAND(lit(0xffffL)).as("ev"))
    }
    val exacts = grp.select(col("gid").as("eg"),
        explode(array(exactBands: _*)).as("b"))
      .select(col("eg"), col("b.bi").as("bi"), col("b.ev").as("ev"))
    val gpairs = probes.join(exacts,
        probes("bi") === exacts("bi") && col("pv") === col("ev") &&
          col("pg") < col("eg"))
      .select(col("pg").as("g1"), col("eg").as("g2")).distinct()
    // Verify on group representatives (one popcount per DISTINCT pair).
    val near = gpairs
      .join(grp.select(col("gid").as("g1"), col("h1").as("a1"), col("h2").as("a2")), Seq("g1"))
      .join(grp.select(col("gid").as("g2"), col("h1").as("b1"), col("h2").as("b2")), Seq("g2"))
      .select(col("g1"), col("g2"),
        (expr("bit_count(a1 ^ b1)") + expr("bit_count(a2 ^ b2)")).cast("long")
          .as("hamming"))
      .where(col("hamming") <= PhashMaxHamming)
    // Member expansion — output-bound by construction.
    val mem = ph.join(grp, Seq("h1", "h2")).select(col("asset_id"), col("gid"))
    val inter = near
      .join(mem.select(col("gid").as("g1"), col("asset_id").as("a")), Seq("g1"))
      .join(mem.select(col("gid").as("g2"), col("asset_id").as("b")), Seq("g2"))
      .select(least(col("a"), col("b")).as("d1"),
        greatest(col("a"), col("b")).as("d2"), col("hamming"))
    val intra = mem.as("x").join(mem.as("y"),
        col("x.gid") === col("y.gid") &&
          col("x.asset_id") < col("y.asset_id"))
      .select(col("x.asset_id").as("d1"), col("y.asset_id").as("d2"),
        lit(0L).as("hamming"))
    inter.unionByName(intra).orderBy("d1", "d2")
  }

  /** Oracle: replays the hash arithmetic off the generation pixel
    * mapping (byte f of the cycled text drives pixel channels) and
    * scores ALL pairs — the banded Spark plan must produce the exact
    * same set (pigeonhole guarantee). Empty-text assets emulate the
    * generator's single-zero-byte source. */
  def mmPhashDedupSql: String =
    s"""WITH a AS (
       |  SELECT doc_id, 16 + (doc_id * 7) % 500 AS w, 1 + doc_id % 25 AS h,
       |    octet_length(encode(text)) AS bl, hex(encode(text)) AS hx
       |  FROM documents WHERE doc_id % 3 = 0),
       |lum AS (
       |  SELECT doc_id,
       |    CASE WHEN bl = 0 THEN list_transform(range(64), k -> CAST(0 AS BIGINT))
       |    ELSE list_transform(range(64), k ->
       |      (('0x' || substr(hx, ((3 * (((k // 8) * h // 8) * w + ((k % 8) * w // 8))) % bl) * 2 + 1, 2))::BIGINT
       |       + ('0x' || substr(hx, ((3 * (((k // 8) * h // 8) * w + ((k % 8) * w // 8)) + 1) % bl) * 2 + 1, 2))::BIGINT
       |       + ('0x' || substr(hx, ((3 * (((k // 8) * h // 8) * w + ((k % 8) * w // 8)) + 2) % bl) * 2 + 1, 2))::BIGINT) // 3)
       |    END AS ls
       |  FROM a),
       |ph AS (
       |  SELECT doc_id,
       |    list_sum(list_transform(range(32),
       |      i -> CASE WHEN ls[i+1] > list_sum(ls) // 64 THEN 1 << i ELSE 0 END)) AS h1,
       |    list_sum(list_transform(range(32),
       |      i -> CASE WHEN ls[i+33] > list_sum(ls) // 64 THEN 1 << i ELSE 0 END)) AS h2
       |  FROM lum)
       |SELECT a.doc_id AS d1, b.doc_id AS d2,
       |  CAST(bit_count(xor(a.h1, b.h1)) + bit_count(xor(a.h2, b.h2)) AS BIGINT)
       |    AS hamming
       |FROM ph a JOIN ph b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.h1, b.h1)) + bit_count(xor(a.h2, b.h2))
       |  <= $PhashMaxHamming
       |ORDER BY d1, d2""".stripMargin

  /** Real BMP payloads for the corpus's image assets: dimensions keyed
    * on doc_id (widths up to 515 so the resize math genuinely scales),
    * pixel bytes cycled from the document text. */
  def bmpAssets(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .where(col("doc_id") % 3 === 0) // the 'image' rows of assets()
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val w = (16 + (id * 7) % 500).toInt
          val h = (1 + id % 25).toInt
          val src = { val b = text.getBytes("UTF-8"); if (b.isEmpty) Array[Byte](0) else b }
          val pixels = Array.tabulate[Byte](w * h * 3)(i => src(i % src.length))
          (id, BmpCodec.encode(w, h, pixels))
        }
      }.toDF("asset_id", "bmp")
  }

  /** Declared query: decode REAL BMP bytes back to typed image
    * metadata + the resize plan a thumbnailing pass would use. Every
    * dimension field is parsed out of the bitmap headers by
    * [[BmpCodec.decode]]; the oracle recomputes expectations from the
    * generation arithmetic (54-byte header + 4-byte-aligned rows). */
  def mmBmp(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val decoded = bmpAssets(spark, d).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = BmpCodec // per-partition codec handle
        rows.map { case (id, bmp) =>
          val m = codec.decode(bmp)
          val scale = math.min(1.0, 256.0 / math.max(m.width, m.height))
          (id, bmp.length.toLong, m.width.toLong, m.height.toLong,
            m.bitsPerPixel.toLong, m.rowStride.toLong, m.imageBytes.toLong,
            math.max(1, (m.width * scale).toInt).toLong,
            math.max(1, (m.height * scale).toInt).toLong,
            // PAYLOAD decode: every pixel byte, stride-aware row walk
            codec.pixelSum(bmp))
        }
      }
    decoded.toDF("asset_id", "bmp_bytes", "width", "height", "bpp",
      "row_stride", "img_bytes", "resized_w", "resized_h", "pixel_sum")
      .orderBy("asset_id")
  }

  // Mirrors the generation arithmetic (dims from doc_id, 24-bit rows
  // padded to 4 bytes) and the resize formula with the same operation
  // order, so trunc-after-double-multiply agrees bit-for-bit. The
  // pixel payload is cycled text bytes, so its sum has a closed form:
  // fullCycles × (sum of all text bytes) + (prefix sum of the
  // remainder) — against which Spark's stride-aware row walk is
  // checked byte-for-byte.
  def mmBmpSql: String =
    """WITH dims AS (
      |  SELECT doc_id, 16 + (doc_id * 7) % 500 AS w, 1 + doc_id % 25 AS h,
      |    octet_length(encode(text)) AS bl, hex(encode(text)) AS hx
      |  FROM documents WHERE doc_id % 3 = 0),
      |geo AS (
      |  SELECT doc_id, w, h, bl, hx, ((w * 24 + 31) // 32) * 4 AS stride,
      |    LEAST(1.0, 256.0 / GREATEST(w, h)) AS scale,
      |    w * h * 3 AS total
      |  FROM dims),
      |px AS (
      |  SELECT doc_id, CASE WHEN bl = 0 THEN 0 ELSE
      |      (total // bl) * COALESCE(list_sum(list_transform(range(bl),
      |        i -> ('0x' || substr(hx, i*2 + 1, 2))::BIGINT)), 0)
      |      + COALESCE(list_sum(list_transform(range(total % bl),
      |        i -> ('0x' || substr(hx, i*2 + 1, 2))::BIGINT)), 0)
      |    END AS psum
      |  FROM geo)
      |SELECT g.doc_id AS asset_id,
      |  54 + g.stride * g.h AS bmp_bytes,
      |  g.w AS width, g.h AS height, 24 AS bpp,
      |  g.stride AS row_stride, g.stride * g.h AS img_bytes,
      |  GREATEST(1, CAST(trunc(g.w * g.scale) AS BIGINT)) AS resized_w,
      |  GREATEST(1, CAST(trunc(g.h * g.scale) AS BIGINT)) AS resized_h,
      |  CAST(px.psum AS BIGINT) AS pixel_sum
      |FROM geo g JOIN px ON px.doc_id = g.doc_id ORDER BY asset_id""".stripMargin

  /** Target thumbnail grid for [[mmThumbnail]] — fixed, so every
    * asset costs exactly 16×16×3 sampled bytes whatever its size. */
  private val ThumbSide = 16

  /** Declared query: REAL pixel-level thumbnailing — nearest-neighbor
    * resample of every BMP asset to a fixed [[ThumbSide]]² grid
    * ([[BmpCodec.thumbnailSum]]: floor-mapped source coordinates,
    * stride-aware byte reads), summarized as the sampled-byte sum the
    * oracle replays via the same index arithmetic on the cycled
    * source bytes. mm_bmp plans thumbnail GEOMETRY; this executes the
    * resample on the decoded payload — the decode → transform →
    * summarize pipeline shape, constant per-asset output however
    * large the image. */
  def mmThumbnail(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    bmpAssets(spark, d).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = BmpCodec
        rows.map { case (id, bmp) =>
          val m = codec.decode(bmp)
          (id, m.width.toLong, m.height.toLong,
            codec.thumbnailSum(bmp, ThumbSide, ThumbSide))
        }
      }
      .toDF("asset_id", "width", "height", "thumb_sum")
      .orderBy("asset_id")
  }

  // Same dims arithmetic as mmBmpSql; the 768 sampled bytes replay as
  // range(768) with i → (y, x, k) = (i div 48, (i mod 48) div 3,
  // i mod 3), source byte index (3·(⌊y·h/16⌋·w + ⌊x·w/16⌋) + k) mod bl
  // into the hex-encoded text — the identical floor map the codec
  // walks through the file's stride.
  def mmThumbnailSql: String =
    s"""WITH dims AS (
       |  SELECT doc_id, 16 + (doc_id * 7) % 500 AS w, 1 + doc_id % 25 AS h,
       |    octet_length(encode(text)) AS bl, hex(encode(text)) AS hx
       |  FROM documents WHERE doc_id % 3 = 0),
       |s AS (
       |  SELECT doc_id, w, h,
       |    CASE WHEN bl = 0 THEN 0 ELSE
       |      COALESCE(list_sum(list_transform(range(${3 * ThumbSide * ThumbSide}),
       |        i -> ('0x' || substr(hx,
       |          ((3 * ((((i // ${3 * ThumbSide}) * h) // $ThumbSide) * w
       |                 + (((i % ${3 * ThumbSide}) // 3) * w) // $ThumbSide)
       |            + i % 3) % bl) * 2 + 1, 2))::BIGINT)), 0)
       |    END AS thumb_sum
       |  FROM dims)
       |SELECT doc_id AS asset_id, CAST(w AS BIGINT) AS width,
       |  CAST(h AS BIGINT) AS height, CAST(thumb_sum AS BIGINT) AS thumb_sum
       |FROM s ORDER BY asset_id""".stripMargin

  /** Real TIFF payloads — the tagged-container image format: dims
    * keyed on doc_id (different arithmetic than BMP so the two
    * decoders can't accidentally validate each other), RGB bytes
    * cycled from the document text. */
  def tiffAssets(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .where(col("doc_id") % 3 === 0) // the 'image' rows of assets()
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val w = (16 + (id * 11) % 300).toInt
          val h = (1 + id % 17).toInt
          val src = { val b = text.getBytes("UTF-8"); if (b.isEmpty) Array[Byte](0) else b }
          val pixels = Array.tabulate[Byte](w * h * 3)(i => src(i % src.length))
          (id, TiffCodec.encode(w, h, pixels))
        }
      }.toDF("asset_id", "tiff")
  }

  /** Declared query: decode REAL TIFF bytes via the IFD walk back to
    * typed metadata + resize plan. Every field is read out of the
    * tag directory by [[TiffCodec.decode]] (offsets followed, not
    * assumed); the oracle recomputes expectations from the canonical
    * layout arithmetic (128-byte preamble + unpadded RGB strip) and
    * the cycled-source pixel-sum closed form. */
  def mmTiff(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val decoded = tiffAssets(spark, d).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = TiffCodec
        rows.map { case (id, tiff) =>
          val m = codec.decode(tiff)
          val scale = math.min(1.0, 256.0 / math.max(m.width, m.height))
          (id, tiff.length.toLong, m.width.toLong, m.height.toLong,
            m.samplesPerPixel.toLong, m.bitsPerSample.toLong,
            m.stripOffset.toLong, m.stripBytes.toLong,
            math.max(1, (m.width * scale).toInt).toLong,
            math.max(1, (m.height * scale).toInt).toLong,
            codec.pixelSum(tiff))
        }
      }
    decoded.toDF("asset_id", "tiff_bytes", "width", "height", "spp",
      "bits", "strip_off", "strip_bytes", "resized_w", "resized_h", "pixel_sum")
      .orderBy("asset_id")
  }

  // TIFF rows are UNPADDED (no BMP stride), so total bytes and the
  // pixel sum have the simplest closed forms: strip = w*h*3, file =
  // 128 + strip, sum = cycles × sum(text bytes) + prefix remainder.
  def mmTiffSql: String =
    s"""WITH dims AS (
       |  SELECT doc_id, 16 + (doc_id * 11) % 300 AS w, 1 + doc_id % 17 AS h,
       |    octet_length(encode(text)) AS bl, hex(encode(text)) AS hx
       |  FROM documents WHERE doc_id % 3 = 0),
       |geo AS (
       |  SELECT doc_id, w, h, bl, hx,
       |    LEAST(1.0, 256.0 / GREATEST(w, h)) AS scale,
       |    w * h * 3 AS total
       |  FROM dims),
       |px AS (
       |  SELECT doc_id, CASE WHEN bl = 0 THEN 0 ELSE
       |      (total // bl) * COALESCE(list_sum(list_transform(range(bl),
       |        i -> ('0x' || substr(hx, i*2 + 1, 2))::BIGINT)), 0)
       |      + COALESCE(list_sum(list_transform(range(total % bl),
       |        i -> ('0x' || substr(hx, i*2 + 1, 2))::BIGINT)), 0)
       |    END AS psum
       |  FROM geo)
       |SELECT g.doc_id AS asset_id,
       |  ${TiffCodec.PixelOffset} + g.total AS tiff_bytes,
       |  g.w AS width, g.h AS height, 3 AS spp, 8 AS bits,
       |  ${TiffCodec.PixelOffset} AS strip_off, g.total AS strip_bytes,
       |  GREATEST(1, CAST(trunc(g.w * g.scale) AS BIGINT)) AS resized_w,
       |  GREATEST(1, CAST(trunc(g.h * g.scale) AS BIGINT)) AS resized_h,
       |  CAST(px.psum AS BIGINT) AS pixel_sum
       |FROM geo g JOIN px ON px.doc_id = g.doc_id ORDER BY asset_id""".stripMargin

  /** Real PNG payloads for the corpus's image assets — a COMPRESSED
    * format (deflate over filtered scanlines), encoded with the JDK's
    * ImageIO: dims keyed on doc_id, RGB triplets cycled from the
    * document text like [[bmpAssets]]. */
  def pngAssets(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .where(col("doc_id") % 3 === 0) // the 'image' rows of assets()
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val w = (8 + (id * 5) % 120).toInt
          val h = (1 + id % 17).toInt
          val src = { val b = text.getBytes("UTF-8"); if (b.isEmpty) Array[Byte](0) else b }
          val rgb = Array.tabulate[Byte](w * h * 3)(i => src(i % src.length))
          (id, PngCodec.encode(w, h, rgb))
        }
      }.toDF("asset_id", "png")
  }

  /** Declared query: decode REAL compressed PNG bytes (zlib inflate +
    * scanline unfilter, via the JDK decoder) back to dims + an exact
    * pixel sum, then run a REAL bilinear thumbnail resize. PNG is
    * lossless, so pixel_sum equals the sum of the generated source
    * triplets — the oracle recomputes it from the text bytes, making a
    * faithful compressed roundtrip the thing being hash-checked. The
    * compressed byte length is encoder-dependent and deliberately NOT
    * declared (MultimodalSpec asserts it instead). resized_w/h are
    * read back off the physically resized raster. */
  def mmPng(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val decoded = pngAssets(spark, d).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = PngCodec // per-partition codec handle
        rows.map { case (id, png) =>
          val img = codec.decode(png)
          val resized = codec.resize(img, 64)
          (id, img.getWidth.toLong, img.getHeight.toLong,
            img.getWidth.toLong * img.getHeight, codec.pixelSum(img),
            resized.getWidth.toLong, resized.getHeight.toLong)
        }
      }
    decoded.toDF("asset_id", "width", "height", "n_px", "pixel_sum",
      "resized_w", "resized_h")
      .orderBy("asset_id")
  }

  // Mirrors the generation arithmetic (dims from doc_id, RGB cycled
  // from the text bytes — same closed-form cycle sum as mmBmpSql) and
  // the resize formula with the same trunc-after-double-multiply
  // order. Nothing here knows PNG: agreement means Spark's inflate +
  // unfilter reproduced every source byte.
  def mmPngSql: String =
    """WITH dims AS (
      |  SELECT doc_id, 8 + (doc_id * 5) % 120 AS w, 1 + doc_id % 17 AS h,
      |    octet_length(encode(text)) AS bl, hex(encode(text)) AS hx
      |  FROM documents WHERE doc_id % 3 = 0),
      |geo AS (
      |  SELECT doc_id, w, h, bl, hx,
      |    LEAST(1.0, 64.0 / GREATEST(w, h)) AS scale,
      |    w * h * 3 AS total
      |  FROM dims),
      |px AS (
      |  SELECT doc_id, CASE WHEN bl = 0 THEN 0 ELSE
      |      (total // bl) * COALESCE(list_sum(list_transform(range(bl),
      |        i -> ('0x' || substr(hx, i*2 + 1, 2))::BIGINT)), 0)
      |      + COALESCE(list_sum(list_transform(range(total % bl),
      |        i -> ('0x' || substr(hx, i*2 + 1, 2))::BIGINT)), 0)
      |    END AS psum
      |  FROM geo)
      |SELECT g.doc_id AS asset_id, g.w AS width, g.h AS height,
      |  g.w * g.h AS n_px,
      |  CAST(px.psum AS BIGINT) AS pixel_sum,
      |  GREATEST(1, CAST(trunc(g.w * g.scale) AS BIGINT)) AS resized_w,
      |  GREATEST(1, CAST(trunc(g.h * g.scale) AS BIGINT)) AS resized_h
      |FROM geo g JOIN px ON px.doc_id = g.doc_id ORDER BY asset_id""".stripMargin

  /** Real GIF payloads for the corpus's image assets: dims keyed on
    * doc_id, palette INDICES (one byte per pixel — GIF is an indexed
    * format) cycled from the document text like [[bmpAssets]]. */
  def gifAssets(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .where(col("doc_id") % 3 === 0) // the 'image' rows of assets()
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val w = (8 + (id * 5) % 200).toInt
          val h = (1 + id % 16).toInt
          val src = { val b = text.getBytes("UTF-8"); if (b.isEmpty) Array[Byte](0) else b }
          val idx = Array.tabulate[Byte](w * h)(i => src(i % src.length))
          (id, GifCodec.encode(w, h, idx))
        }
      }.toDF("asset_id", "gif")
  }

  /** Declared query: decode REAL GIF bytes — container walk plus a
    * from-scratch variable-width LZW inflate — back to dims, palette
    * geometry, and an exact index sum. GIF's LZW is lossless, so
    * pixel_sum equals the sum of the generated source indices; the
    * oracle recomputes it from the text bytes (same closed-form cycle
    * sum as mmBmpSql), making a faithful LZW roundtrip the thing under
    * the hash. Compressed length is dictionary-path-dependent and NOT
    * declared (MultimodalSpec bounds it instead). */
  def mmGif(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val decoded = gifAssets(spark, d).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = GifCodec // per-partition codec handle
        rows.map { case (id, gif) =>
          val m = codec.decode(gif)
          (id, m.width.toLong, m.height.toLong, m.paletteSize.toLong,
            m.minCodeSize.toLong, m.nPixels, codec.pixelSum(gif))
        }
      }
    decoded.toDF("asset_id", "width", "height", "palette_size",
      "min_code_size", "n_px", "pixel_sum")
      .orderBy("asset_id")
  }

  // Nothing here knows GIF: agreement means the LZW decoder
  // reproduced every palette index from the compressed stream.
  def mmGifSql: String =
    """WITH dims AS (
      |  SELECT doc_id, 8 + (doc_id * 5) % 200 AS w, 1 + doc_id % 16 AS h,
      |    octet_length(encode(text)) AS bl, hex(encode(text)) AS hx
      |  FROM documents WHERE doc_id % 3 = 0),
      |geo AS (SELECT doc_id, w, h, bl, hx, w * h AS total FROM dims),
      |px AS (
      |  SELECT doc_id, CASE WHEN bl = 0 THEN 0 ELSE
      |      (total // bl) * COALESCE(list_sum(list_transform(range(bl),
      |        i -> ('0x' || substr(hx, i*2 + 1, 2))::BIGINT)), 0)
      |      + COALESCE(list_sum(list_transform(range(total % bl),
      |        i -> ('0x' || substr(hx, i*2 + 1, 2))::BIGINT)), 0)
      |    END AS psum
      |  FROM geo)
      |SELECT g.doc_id AS asset_id, g.w AS width, g.h AS height,
      |  256 AS palette_size, 8 AS min_code_size, g.w * g.h AS n_px,
      |  CAST(px.psum AS BIGINT) AS pixel_sum
      |FROM geo g JOIN px ON px.doc_id = g.doc_id ORDER BY asset_id""".stripMargin

  // JPEG roundtrip tolerances (quality 0.9, grayscale sources),
  // derived from SPEC-level reasoning rather than one JVM's observed
  // worst case, so a different vendor codec can't shift a correct
  // roundtrip past them:
  //  - peak: per-coefficient quantization error is ≤ q/2; at IJG
  //    quality ~90 the luma table tops out near ~24, and the worst
  //    adversarial alignment across 63 AC bases (amplitude ≤ 1/4)
  //    bounds the spatial error near ~128 before the [0,255] clamp —
  //    192 sits above any correct codec's reachable error yet far
  //    below the vacuous 255.
  //  - mean: quantization error energy (Σ(q/2)²/12 over the table)
  //    puts the per-sample RMS at a few units for noise-like content;
  //    16 is ~4× the IJG-derived expectation and ≥4× the worst case
  //    ever observed on the sf tables (≤4.0, pinned by MultimodalSpec
  //    at half-tolerance so codec drift fails a TEST, not the gate).
  //  - dc: the DC quantum at q≈90 is ~3; its spatial spread is e/8
  //    per sample, so whole-image mean drift stays sub-unit — 8 is an
  //    order of magnitude of slack for vendor rounding differences.
  private[multimodal] val JpegMeanTol = 16.0
  private[multimodal] val JpegPeakTol = 192
  private[multimodal] val JpegDcTol = 8.0

  /** Real JPEG payloads for the corpus's image assets — the LOSSY
    * compressed format ([[JpegCodec]], JDK ImageIO): dims keyed on
    * doc_id, grayscale luma cycled from the document text. The source
    * raster rides along (gray_src) as the in-query scoring companion,
    * the way agg_approx carries its exact aggregates. */
  def jpegAssets(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .where(col("doc_id") % 3 === 0) // the 'image' rows of assets()
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val w = (8 + (id * 3) % 96).toInt
          val h = (1 + id % 13).toInt
          val src = { val b = text.getBytes("UTF-8"); if (b.isEmpty) Array[Byte](0) else b }
          val gray = Array.tabulate[Byte](w * h)(i => src(i % src.length))
          (id, JpegCodec.encode(w, h, gray), gray)
        }
      }.toDF("asset_id", "jpeg", "gray_src")
  }

  /** Declared query: decode REAL lossy JPEG bytes and score the
    * roundtrip in-query against the deterministic source raster —
    * exact header metadata (dims parsed from the JPEG) plus
    * within-tolerance flags for mean/peak/DC error that hold for any
    * correct encoder+decoder at the fixed quality. The oracle
    * recomputes the metadata from the generation arithmetic and
    * asserts the flags as literal TRUE (the compressed bytes and the
    * exact error values are encoder-dependent and deliberately NOT
    * declared; MultimodalSpec bounds them instead). */
  def mmJpeg(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val decoded = jpegAssets(spark, d)
      .as[(Long, Array[Byte], Array[Byte])]
      .mapPartitions { rows =>
        val codec = JpegCodec // per-partition codec handle
        rows.map { case (id, jpeg, gray) =>
          val img = codec.decode(jpeg)
          val (mae, peak, dc) = codec.errorStats(gray, img)
          (id, img.getWidth.toLong, img.getHeight.toLong,
            img.getWidth.toLong * img.getHeight,
            mae <= JpegMeanTol, peak <= JpegPeakTol, dc <= JpegDcTol)
        }
      }
    decoded.toDF("asset_id", "width", "height", "n_px",
      "mae_ok", "peak_ok", "dc_ok")
      .orderBy("asset_id")
  }

  // Metadata mirror of the generation arithmetic; the three flags are
  // literal TRUE — a broken DCT path, quantization table, or chroma
  // handling flips one on Spark's side and hash-mismatches. Nothing
  // here knows JPEG.
  def mmJpegSql: String =
    """SELECT doc_id AS asset_id,
      |  8 + (doc_id * 3) % 96 AS width,
      |  1 + doc_id % 13 AS height,
      |  (8 + (doc_id * 3) % 96) * (1 + doc_id % 13) AS n_px,
      |  TRUE AS mae_ok, TRUE AS peak_ok, TRUE AS dc_ok
      |FROM documents WHERE doc_id % 3 = 0 ORDER BY asset_id""".stripMargin

  /** JPEG+EXIF assets: the [[jpegAssets]] rasters with an APP1 EXIF
    * sidecar ([[ExifCodec]]) — orientation cycling all 8 EXIF values,
    * an EXIF-format DateTime, and the pixel dims duplicated into
    * ExifImageWidth/Height (all keyed on doc_id). */
  def exifAssets(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .where(col("doc_id") % 3 === 0) // the 'image' rows of assets()
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val w = (8 + (id * 3) % 96).toInt
          val h = (1 + id % 13).toInt
          val src = { val b = text.getBytes("UTF-8"); if (b.isEmpty) Array[Byte](0) else b }
          val gray = Array.tabulate[Byte](w * h)(i => src(i % src.length))
          val dt = f"2024:${1 + id % 12}%02d:${1 + id % 28}%02d ${id % 24}%02d:00:00"
          val jpeg = ExifCodec.insertApp1(JpegCodec.encode(w, h, gray),
            ExifCodec.app1((1 + id % 8).toInt, dt, w, h))
          (id, jpeg)
        }
      }.toDF("asset_id", "jpeg")
  }

  /** Declared query: walk the real JPEG segment chain and the EXIF
    * TIFF IFD inside APP1, emitting orientation / timestamp / claimed
    * dims — the rotate-before-resize metadata every image pipeline
    * must read before touching pixels. dims_match cross-checks the
    * EXIF claim against the independently decoded raster dims (a
    * scraped corpus is full of files whose EXIF lies after a naive
    * re-encode). The oracle mirrors the generation arithmetic;
    * nothing in it knows JPEG or TIFF. */
  def mmExif(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    exifAssets(spark, d).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, jpeg) =>
          val m = ExifCodec.readExif(jpeg)
          val img = JpegCodec.decode(jpeg)
          (id, m.orientation.toLong, m.dateTime, m.exifWidth.toLong,
            m.exifHeight.toLong,
            img.getWidth == m.exifWidth && img.getHeight == m.exifHeight)
        }
      }.toDF("asset_id", "orientation", "exif_datetime",
        "exif_w", "exif_h", "dims_match")
      .orderBy("asset_id")
  }

  def mmExifSql: String =
    """SELECT doc_id AS asset_id,
      |  1 + doc_id % 8 AS orientation,
      |  printf('2024:%02d:%02d %02d:00:00',
      |    1 + doc_id % 12, 1 + doc_id % 28, doc_id % 24) AS exif_datetime,
      |  8 + (doc_id * 3) % 96 AS exif_w,
      |  1 + doc_id % 13 AS exif_h,
      |  TRUE AS dims_match
      |FROM documents WHERE doc_id % 3 = 0 ORDER BY asset_id""".stripMargin

  private val FlacRates = Array(8000, 16000, 22050, 44100, 48000)

  /** FLAC containers for the corpus's 'audio' rows: STREAMINFO
    * parameters keyed on doc_id (all five common rates exercised),
    * payload bytes cycled from the text, MD5 stamped by the encoder. */
  def flacAssets(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .where(col("doc_id") % 3 === 1) // the 'audio' rows of assets()
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val src = { val b = text.getBytes("UTF-8"); if (b.isEmpty) Array[Byte](0) else b }
          val payload = Array.tabulate[Byte](64 + (id % 192).toInt)(i => src(i % src.length))
          (id, FlacCodec.encode(FlacRates((id % 5).toInt), (1 + id % 2).toInt,
            16, 1000 + id % 997, payload))
        }
      }.toDF("asset_id", "flac")
  }

  /** Declared query: walk real FLAC metadata chains — unpack the
    * sub-byte STREAMINFO bitfields (20-bit rate, 3-bit channels,
    * 5-bit bps, 36-bit sample count), derive the duration, and verify
    * the payload against the header's MD5 claim ([[FlacCodec]] raises
    * on mismatch, so md5_ok=TRUE is a survived integrity check, not a
    * constant). The oracle replays the generation arithmetic;
    * duration uses integer floor-division in both engines. */
  def mmFlac(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    flacAssets(spark, d).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, flac) =>
          val m = FlacCodec.decode(flac)
          (id, m.sampleRate.toLong, m.channels.toLong, m.bitsPerSample.toLong,
            m.totalSamples, m.totalSamples * 1000L / m.sampleRate, true)
        }
      }.toDF("asset_id", "sample_rate", "channels", "bits_per_sample",
        "total_samples", "duration_ms", "md5_ok")
      .orderBy("asset_id")
  }

  def mmFlacSql: String =
    s"""SELECT doc_id AS asset_id,
       |  CAST(([${FlacRates.mkString(", ")}])[CAST(1 + doc_id % 5 AS INT)]
       |    AS BIGINT) AS sample_rate,
       |  1 + doc_id % 2 AS channels,
       |  CAST(16 AS BIGINT) AS bits_per_sample,
       |  1000 + doc_id % 997 AS total_samples,
       |  (1000 + doc_id % 997) * 1000
       |    // ([${FlacRates.mkString(", ")}])[CAST(1 + doc_id % 5 AS INT)] AS duration_ms,
       |  TRUE AS md5_ok
       |FROM documents WHERE doc_id % 3 = 1 ORDER BY asset_id""".stripMargin

  /** SubRip subtitle assets for the corpus's 'video' rows: 1 + id%4
    * cues, start/duration keyed on doc_id, caption text sliced from
    * the document tokens — real timed-text containers built and
    * parsed with [[SrtCodec]]. */
  def srtAssets(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .where(col("doc_id") % 3 === 2) // the 'video' rows of assets()
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
          val k = (1 + id % 4).toInt
          val cues = (0 until k).map { i =>
            val start = i * 3000L + id % 997
            val dur = 800L + (id + i) % 1200
            (start, start + dur,
              toks.slice(i * 5, i * 5 + 5).mkString(" "))
          }
          (id, SrtCodec.encode(cues))
        }
      }.toDF("asset_id", "srt")
  }

  /** Declared query: parse real SubRip documents back to cue timings —
    * caption count, first-start / last-end (the captioned span), and
    * total captioned milliseconds, the coverage numbers an A/V
    * training pipeline computes before aligning transcripts to audio.
    * The parser validates structure loudly ([[SrtCodec.decode]]);
    * the oracle replays the generation arithmetic (list_sum over the
    * per-cue duration formula) and knows nothing about SRT. */
  def mmSrt(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    srtAssets(spark, d).as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, srt) =>
          val cues = SrtCodec.decode(srt)
          (id, cues.length.toLong, cues.head.startMs, cues.last.endMs,
            cues.map(c => c.endMs - c.startMs).sum)
        }
      }.toDF("asset_id", "n_cues", "first_start_ms", "last_end_ms",
        "total_caption_ms")
      .orderBy("asset_id")
  }

  def mmSrtSql: String =
    """SELECT doc_id AS asset_id,
      |  1 + doc_id % 4 AS n_cues,
      |  doc_id % 997 AS first_start_ms,
      |  (doc_id % 4) * 3000 + doc_id % 997
      |    + 800 + (doc_id + doc_id % 4) % 1200 AS last_end_ms,
      |  CAST(list_sum(list_transform(range(1 + doc_id % 4),
      |    i -> 800 + (doc_id + i) % 1200)) AS BIGINT) AS total_caption_ms
      |FROM documents WHERE doc_id % 3 = 2 ORDER BY asset_id""".stripMargin

  /** Real MP3 frame sequences for the corpus's audio assets —
    * format parameters keyed on doc_id (the full MPEG-1 L3 bitrate
    * table gets exercised), frame payloads cycled from the text. */
  def mp3Assets(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .where(col("doc_id") % 3 === 1) // the 'audio' rows of assets()
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val bIdx = (1 + id % 14).toInt
          val srIdx = ((id / 3) % 3).toInt
          val mode = if (id % 2 == 0) 3 else 0 // mono / stereo
          val bytes = text.getBytes("UTF-8")
          val nFrames = (1 + bytes.length % 24).toInt
          (id, Mp3Codec.encode(bIdx, srIdx, mode, nFrames, bytes, seed = id))
        }
      }.toDF("asset_id", "mp3")
  }

  /** Declared query: walk REAL MP3 frame sequences — every header
    * field (sync, version/layer, bitrate/sample-rate indices, channel
    * mode), the standard frame-length arithmetic used to SKIP each
    * frame, the BIT-PARSED side info of every frame (global_gain and
    * part2_3_length aggregated to per-file audio statistics, the
    * structural fields verified against the no-reservoir layout), and
    * the main-data byte sum are read off the raw bytes by
    * [[Mp3Codec.decode]]; the oracle recomputes all of it from the
    * generation parameters (bitrate table and seeded side-info
    * arithmetic included), so a misparsed header bit, a wrong frame
    * stride, or a misaligned side-info bit-read hash-mismatches. Only
    * the Huffman/MDCT spectral synthesis stays out (it needs a media
    * library); container + side-info levels are decoded for real. */
  def mmMp3(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val decoded = mp3Assets(spark, d).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = Mp3Codec // per-partition codec handle
        rows.map { case (id, mp3) =>
          val m = codec.decode(mp3)
          (id, mp3.length.toLong, m.sampleRate.toLong, m.bitrateKbps.toLong,
            m.channels.toLong, m.nFrames.toLong, m.payloadBytes,
            codec.payloadSum(mp3), m.durationMs,
            m.nGranules, m.sideGainSum, m.sideP23Sum)
        }
      }
    decoded.toDF("asset_id", "mp3_bytes", "sample_rate", "bitrate_kbps",
      "channels", "n_frames", "payload_bytes", "payload_sum", "duration_ms",
      "n_granules", "side_gain_sum", "side_p23_sum")
      .orderBy("asset_id")
  }

  // Generation-arithmetic mirror: bitrate/sample-rate tables as
  // literal lists, the 144·bps/sr frame length, the cycled-text
  // closed-form MAIN DATA sum (the mmBmpSql pattern), and the seeded
  // side-info sums — global_gain (seed + 5f + 3g + c mod 256) and
  // part2_3_length (3·seed + 7f + 11g + 13c mod 4096) over every
  // (frame, granule, channel), the g/c combinations unrolled as
  // constant offsets (mono: +0,+3; stereo adds +1,+4 / +13,+24).
  // Nothing here walks MP3 bytes.
  def mmMp3Sql: String =
    """WITH a AS (
      |  SELECT doc_id, octet_length(encode(text)) AS bl, hex(encode(text)) AS hx,
      |    CAST(1 + doc_id % 14 AS INT) AS bidx,
      |    CAST((doc_id // 3) % 3 AS INT) AS sridx
      |  FROM documents WHERE doc_id % 3 = 1),
      |p AS (
      |  SELECT doc_id, bl, hx,
      |    list_extract([32,40,48,56,64,80,96,112,128,160,192,224,256,320], bidx) AS br,
      |    list_extract([44100,48000,32000], sridx + 1) AS sr,
      |    1 + bl % 24 AS nf,
      |    CASE doc_id % 2 WHEN 0 THEN 1 ELSE 2 END AS ch
      |  FROM a),
      |g AS (
      |  SELECT doc_id, bl, hx, br, sr, nf, ch,
      |    144 * (br * 1000) // sr AS flen,
      |    CASE ch WHEN 1 THEN 17 ELSE 32 END AS si
      |  FROM p),
      |s AS (
      |  SELECT doc_id, (flen - 4 - si) * nf AS total,
      |    CASE WHEN bl = 0 THEN 0 ELSE
      |      (((flen - 4 - si) * nf) // bl) * COALESCE(list_sum(list_transform(range(bl),
      |        i -> ('0x' || substr(hx, i*2 + 1, 2))::BIGINT)), 0)
      |      + COALESCE(list_sum(list_transform(range(((flen - 4 - si) * nf) % bl),
      |        i -> ('0x' || substr(hx, i*2 + 1, 2))::BIGINT)), 0)
      |    END AS psum,
      |    COALESCE(list_sum(list_transform(range(nf), f ->
      |      (doc_id + 5*f) % 256 + (doc_id + 5*f + 3) % 256
      |      + CASE ch WHEN 2 THEN (doc_id + 5*f + 1) % 256 + (doc_id + 5*f + 4) % 256
      |                ELSE 0 END)), 0) AS gsum,
      |    COALESCE(list_sum(list_transform(range(nf), f ->
      |      (3*doc_id + 7*f) % 4096 + (3*doc_id + 7*f + 11) % 4096
      |      + CASE ch WHEN 2 THEN (3*doc_id + 7*f + 13) % 4096 + (3*doc_id + 7*f + 24) % 4096
      |                ELSE 0 END)), 0) AS p23sum
      |  FROM g)
      |SELECT g.doc_id AS asset_id,
      |  CAST(g.flen * g.nf AS BIGINT) AS mp3_bytes,
      |  CAST(g.sr AS BIGINT) AS sample_rate,
      |  CAST(g.br AS BIGINT) AS bitrate_kbps,
      |  CAST(g.ch AS BIGINT) AS channels,
      |  CAST(g.nf AS BIGINT) AS n_frames,
      |  CAST(s.total AS BIGINT) AS payload_bytes,
      |  CAST(s.psum AS BIGINT) AS payload_sum,
      |  (CAST(g.nf AS BIGINT) * 1152 * 1000) // g.sr AS duration_ms,
      |  CAST(g.nf * 2 * g.ch AS BIGINT) AS n_granules,
      |  CAST(s.gsum AS BIGINT) AS side_gain_sum,
      |  CAST(s.p23sum AS BIGINT) AS side_p23_sum
      |FROM g JOIN s ON s.doc_id = g.doc_id ORDER BY asset_id""".stripMargin

  private val FrameRates = Array((30, 1, 33333), (25, 1, 40000), (24, 1, 41667))

  /** Real AVI payloads for the corpus's video assets: frame rate and
    * count keyed on the doc, each `00dc` frame chunk carrying a slice
    * of the text bytes. */
  def aviAssets(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .where(col("doc_id") % 3 === 2) // the 'video' rows of assets()
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val w = (32 + (id % 8) * 16).toInt
          val h = (24 + (id % 6) * 12).toInt
          // (id/3) % 3: id % 3 is constant (2) on the video slice
          val (rate, scale, usec) = FrameRates(((id / 3) % 3).toInt)
          val nFrames = (1 + bytes.length % 48).toInt
          // frame f carries up to 16 text bytes starting at f*16,
          // cycling — real chunked payloads of varying (odd/even) size
          val frames = (0 until nFrames).map { f =>
            val len = 1 + (f + bytes.length) % 16
            Array.tabulate[Byte](len)(i =>
              if (bytes.isEmpty) 0 else bytes((f * 16 + i) % bytes.length))
          }
          (id, AviCodec.encode(w, h, usec, rate, scale, frames))
        }
      }.toDF("asset_id", "avi")
  }

  /** Declared query: decode REAL AVI containers back to typed video
    * metadata — header fields AND an actual walk of the movi frame
    * list (frames_present counts the `00dc` chunks physically in the
    * file; equal to the header's n_frames on a well-formed file, which
    * the oracle asserts by recomputing both from the generation
    * arithmetic). */
  def mmAvi(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val decoded = aviAssets(spark, d).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = AviCodec // per-partition codec handle
        rows.map { case (id, avi) =>
          val m = codec.decode(avi)
          (id, avi.length.toLong, m.width.toLong, m.height.toLong,
            m.nFrames.toLong, m.framesPresent.toLong, m.moviBytes,
            (m.fpsRate / m.fpsScale).toLong, m.durationMs,
            // PAYLOAD decode: every frame chunk's bytes summed
            codec.framePayloadSum(avi))
        }
      }
    decoded.toDF("asset_id", "avi_bytes", "width", "height",
      "n_frames", "frames_present", "movi_bytes", "fps", "duration_ms",
      "payload_sum")
      .orderBy("asset_id")
  }

  // Generation arithmetic mirror: n_frames = 1 + byte_len % 48; frame
  // f's payload is 1 + (f + byte_len) % 16 bytes, padded to even; the
  // container adds a fixed 224-byte preamble (RIFF + hdrl with
  // avih/strh/strf + LIST movi headers) and 8 bytes per frame chunk.
  def mmAviSql: String =
    """WITH base AS (
      |  SELECT doc_id, octet_length(encode(text)) AS bl, hex(encode(text)) AS hx
      |  FROM documents WHERE doc_id % 3 = 2),
      |fr AS (
      |  SELECT b.doc_id, b.bl, b.hx, t.f, 1 + (t.f + b.bl) % 16 AS flen
      |  FROM base b
      |  JOIN (SELECT unnest(range(48)) AS f) t ON t.f < 1 + b.bl % 48),
      |frames AS (
      |  SELECT doc_id, bl, 1 + bl % 48 AS nf,
      |    SUM(8 + flen + flen % 2) AS movi_body,
      |    SUM(flen) AS movi_payload
      |  FROM fr GROUP BY doc_id, bl),
      |pay AS (
      |  SELECT fr.doc_id, SUM(CASE WHEN fr.bl = 0 THEN 0 ELSE
      |      ('0x' || substr(fr.hx, ((fr.f * 16 + u.i) % fr.bl) * 2 + 1, 2))::BIGINT
      |    END) AS psum
      |  FROM fr JOIN (SELECT unnest(range(16)) AS i) u ON u.i < fr.flen
      |  GROUP BY fr.doc_id)
      |SELECT f.doc_id AS asset_id,
      |  CAST(224 + f.movi_body AS BIGINT) AS avi_bytes,
      |  32 + (f.doc_id % 8) * 16 AS width,
      |  24 + (f.doc_id % 6) * 12 AS height,
      |  f.nf AS n_frames, f.nf AS frames_present,
      |  CAST(f.movi_payload AS BIGINT) AS movi_bytes,
      |  CAST(CASE (f.doc_id // 3) % 3 WHEN 0 THEN 30 WHEN 1 THEN 25
      |            ELSE 24 END AS BIGINT) AS fps,
      |  (f.nf * (CASE (f.doc_id // 3) % 3 WHEN 0 THEN 33333 WHEN 1 THEN 40000
      |                                    ELSE 41667 END)) // 1000 AS duration_ms,
      |  CAST(pay.psum AS BIGINT) AS payload_sum
      |FROM frames f JOIN pay ON pay.doc_id = f.doc_id ORDER BY asset_id""".stripMargin

  /** Real H.264 Annex-B streams for the corpus's video assets:
    * SPS + PPS + slices, IDR cadence keyed on the doc, slice payloads
    * cycled from the text (zero-free ASCII ⇒ no start-code emulation,
    * see [[H264Codec]]). */
  def h264Assets(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .where(col("doc_id") % 3 === 2) // the 'video' rows of assets()
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val nSlices = (1 + bytes.length % 30).toInt
          val idrInterval = (1 + (id / 3) % 4).toInt
          (id, H264Codec.encode(nSlices, idrInterval, bytes, seed = id))
        }
      }.toDF("asset_id", "h264")
  }

  /** Declared query: walk REAL Annex-B byte streams — start-code
    * scanning (both 3- and 4-byte forms), NAL header classification
    * (SPS/PPS/IDR/non-IDR, forbidden-bit check), a BIT-PARSED
    * exp-Golomb slice header per slice (frame_num / idr_pic_id
    * aggregated into per-file statistics, the fixed fields verified
    * loudly), and slice data byte accounting, all read off the raw
    * bytes by [[H264Codec.decode]]. The oracle recomputes every
    * count and sum — the variable-length header sizes included —
    * from the generation arithmetic; only slice CABAC/transform
    * decode needs a media library and stays out of scope (the
    * [[mmMp3]] side-info depth). */
  def mmH264(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val decoded = h264Assets(spark, d).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = H264Codec // per-partition codec handle
        rows.map { case (id, h264) =>
          val m = codec.decode(h264)
          (id, m.streamBytes, m.nNals.toLong, m.nSps.toLong, m.nPps.toLong,
            m.nIdr.toLong, (m.nIdr + m.nNonIdr).toLong, m.sliceBytes,
            codec.slicePayloadSum(h264),
            m.hdrBytes, m.frameNumSum, m.idrPicIdSum)
        }
      }
    decoded.toDF("asset_id", "stream_bytes", "n_nals", "n_sps", "n_pps",
      "n_idr", "n_slices", "slice_bytes", "slice_sum",
      "hdr_bytes", "frame_num_sum", "idr_pic_id_sum")
      .orderBy("asset_id")
  }

  // Generation mirror: slice s carries a parsed exp-Golomb header
  // (2 bytes for non-IDR — 12 bits; IDR: 15 bits + ue(idr_pic_id),
  // i.e. 2 bytes when (doc_id+s)%8 = 0 else 3) plus 1+(s+bl)%24 data
  // bytes, with a 4-byte start code on every k-th slice (3-byte
  // otherwise); the stream preamble is SPS (8 bytes) + PPS (7); the
  // continuous cycled text gives the closed-form data sum (bl=0 ⇒
  // the encoder fills with 1s, so the sum is the byte count).
  // frame_num is 0 on IDR slices (spec) and s mod 16 otherwise;
  // idr_pic_id is (doc_id + s) mod 8.
  def mmH264Sql: String =
    """WITH base AS (
      |  SELECT doc_id, octet_length(encode(text)) AS bl, hex(encode(text)) AS hx,
      |    CAST(1 + (doc_id // 3) % 4 AS INT) AS k
      |  FROM documents WHERE doc_id % 3 = 2),
      |sl AS (
      |  SELECT b.doc_id, b.bl, b.hx, b.k, t.s,
      |    1 + (t.s + b.bl) % 24 AS slen,
      |    CASE WHEN t.s % b.k = 0 THEN 4 ELSE 3 END AS sc,
      |    CASE WHEN t.s % b.k = 0
      |         THEN CASE WHEN (b.doc_id + t.s) % 8 = 0 THEN 2 ELSE 3 END
      |         ELSE 2 END AS hdr,
      |    CASE WHEN t.s % b.k = 0 THEN 0 ELSE t.s % 16 END AS fnum,
      |    CASE WHEN t.s % b.k = 0 THEN (b.doc_id + t.s) % 8 ELSE 0 END AS pid
      |  FROM base b JOIN (SELECT unnest(range(30)) AS s) t ON t.s < 1 + b.bl % 30),
      |agg AS (
      |  SELECT doc_id, bl, hx, k, COUNT(*) AS nsl,
      |    SUM(CASE WHEN s % k = 0 THEN 1 ELSE 0 END) AS nidr,
      |    SUM(slen) AS total, SUM(sc + 1 + hdr + slen) AS slice_stream,
      |    SUM(hdr) AS hsum, SUM(fnum) AS fnsum, SUM(pid) AS pidsum
      |  FROM sl GROUP BY doc_id, bl, hx, k),
      |ps AS (
      |  SELECT doc_id, CASE WHEN bl = 0 THEN total ELSE
      |      (total // bl) * COALESCE(list_sum(list_transform(range(bl),
      |        i -> ('0x' || substr(hx, i*2 + 1, 2))::BIGINT)), 0)
      |      + COALESCE(list_sum(list_transform(range(CAST(total % bl AS INT)),
      |        i -> ('0x' || substr(hx, i*2 + 1, 2))::BIGINT)), 0)
      |    END AS psum
      |  FROM agg)
      |SELECT a.doc_id AS asset_id,
      |  CAST(15 + a.slice_stream AS BIGINT) AS stream_bytes,
      |  CAST(2 + a.nsl AS BIGINT) AS n_nals,
      |  CAST(1 AS BIGINT) AS n_sps,
      |  CAST(1 AS BIGINT) AS n_pps,
      |  CAST(a.nidr AS BIGINT) AS n_idr,
      |  CAST(a.nsl AS BIGINT) AS n_slices,
      |  CAST(a.total AS BIGINT) AS slice_bytes,
      |  CAST(ps.psum AS BIGINT) AS slice_sum,
      |  CAST(a.hsum AS BIGINT) AS hdr_bytes,
      |  CAST(a.fnsum AS BIGINT) AS frame_num_sum,
      |  CAST(a.pidsum AS BIGINT) AS idr_pic_id_sum
      |FROM agg a JOIN ps ON ps.doc_id = a.doc_id ORDER BY asset_id""".stripMargin

  // The oracle knows the generation arithmetic (44-byte canonical
  // header + frames × channels × 2 data bytes; sample f = (byte_f -
  // 128) << 8 interleaved per channel); Spark knows only the bytes.
  // Agreement = a faithful encode→decode roundtrip, now INCLUDING the
  // PCM payload (sum/peak of |amplitude| recomputed from the text
  // bytes via the hex trick — one 2-hex-digit slice per byte).
  def mmWavSql: String =
    """WITH a AS (
      |  SELECT doc_id, octet_length(encode(text)) AS bl,
      |    hex(encode(text)) AS hx, 1 + doc_id % 2 AS ch,
      |    CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 11025
      |                    WHEN 2 THEN 16000 ELSE 22050 END AS sr
      |  FROM documents WHERE doc_id % 3 = 1),
      |s AS (
      |  SELECT doc_id, bl, ch, sr,
      |    COALESCE(list_sum(list_transform(range(bl),
      |      i -> abs(('0x' || substr(hx, i*2 + 1, 2))::BIGINT - 128) * 256)), 0) AS babs,
      |    COALESCE(list_max(list_transform(range(bl),
      |      i -> abs(('0x' || substr(hx, i*2 + 1, 2))::BIGINT - 128) * 256)), 0) AS pk
      |  FROM a)
      |SELECT doc_id AS asset_id,
      |  44 + bl * ch * 2 AS wav_bytes,
      |  sr AS sample_rate, ch AS channels, 16 AS bits,
      |  bl AS n_frames,
      |  (bl * 1000) // sr AS duration_ms,
      |  CAST(ch * babs AS BIGINT) AS sum_abs,
      |  CAST(pk AS BIGINT) AS peak_abs
      |FROM s ORDER BY asset_id""".stripMargin

  // encode(text) = UTF-8 bytes (CAST(text AS BLOB) raises on non-ASCII);
  // head_hex slices the first 8 BYTES via the hex string — byte-exact
  // mirror of Spark's substring on BINARY even for multibyte UTF-8.
  def mmFeaturesSql: String =
    """SELECT doc_id AS asset_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image'
      |       WHEN doc_id % 3 = 1 THEN 'audio'
      |       ELSE 'video' END AS kind,
      |  octet_length(encode(text)) AS byte_len,
      |  md5(text) AS content_md5,
      |  lower(substr(hex(encode(text)), 1, 16)) AS head_hex,
      |  64 + octet_length(encode(text)) % 577 AS width,
      |  64 + (octet_length(encode(text)) * 31) % 433 AS height,
      |  1 + octet_length(encode(text)) % 24 AS n_frames
      |FROM documents ORDER BY asset_id""".stripMargin

  /** Real MP4 (ISO-BMFF) containers for the corpus's video assets:
    * one video track, constant 100-tick sample cadence, timescale
    * keyed on the doc, sample payloads cycled from the text — the
    * same deterministic generation arithmetic family as
    * [[aviAssets]] so the oracle can replay every field. */
  def mp4Assets(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .where(col("doc_id") % 3 === 2) // the 'video' rows of assets()
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val w = (32 + (id % 8) * 16).toInt
          val h = (24 + (id % 6) * 12).toInt
          val ts = (600 * (1 + (id / 3) % 3)).toInt // {600,1200,1800}
          val nSamples = (1 + bytes.length % 40).toInt
          // sample f carries up to 24 text bytes starting at f*24,
          // cycling — varying sizes so the stsz table is a real table
          val samples = (0 until nSamples).map { f =>
            val len = 1 + (f + bytes.length) % 24
            Array.tabulate[Byte](len)(i =>
              if (bytes.isEmpty) 0 else bytes((f * 24 + i) % bytes.length))
          }
          (id, Mp4Codec.encode(w, h, ts, 100, samples))
        }
      }.toDF("asset_id", "mp4")
  }

  /** Declared query `mm_mp4`: decode REAL ISO-BMFF containers — the
    * head-first box walk (ftyp brand check, moov -> mvhd/trak/tkhd/
    * mdia/mdhd/minf/stbl recursion, stts cadence, stsz sample table)
    * with the mdat payload ACCOUNTED against the stsz sizes (decode
    * refuses a file whose tables lie), plus the payload byte sum.
    * The oracle replays every field from the generation arithmetic:
    * container overhead is the closed form 348 + 4*n_samples, and
    * payload bytes are re-derived from the text via the same cycling
    * rule. Same per-asset map-only shape as [[mmAvi]]. */
  def mmMp4(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val decoded = mp4Assets(spark, d).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = Mp4Codec // per-partition codec handle
        rows.map { case (id, mp4) =>
          val m = codec.decode(mp4)
          (id, mp4.length.toLong, m.width.toLong, m.height.toLong,
            m.timescale.toLong, m.nSamples.toLong, m.mdatBytes,
            m.durationMs, codec.mdatPayloadSum(mp4))
        }
      }
    decoded.toDF("asset_id", "mp4_bytes", "width", "height",
      "timescale", "n_samples", "mdat_bytes", "duration_ms",
      "payload_sum")
      .orderBy("asset_id")
  }

  // Generation arithmetic mirror: n_samples = 1 + byte_len % 40;
  // sample f's payload is 1 + (f + byte_len) % 24 bytes cycled from
  // the text; the container adds 348 fixed bytes + 4 per stsz entry;
  // duration_ms = n*100 ticks scaled by timescale 600*(1+(id/3)%3).
  def mmMp4Sql: String =
    """WITH base AS (
      |  SELECT doc_id, octet_length(encode(text)) AS bl, hex(encode(text)) AS hx
      |  FROM documents WHERE doc_id % 3 = 2),
      |sm AS (
      |  SELECT b.doc_id, b.bl, b.hx, t.f, 1 + (t.f + b.bl) % 24 AS slen
      |  FROM base b
      |  JOIN (SELECT unnest(range(40)) AS f) t ON t.f < 1 + b.bl % 40),
      |tabs AS (
      |  SELECT doc_id, bl, 1 + bl % 40 AS n,
      |    SUM(slen) AS mdat_bytes
      |  FROM sm GROUP BY doc_id, bl),
      |pay AS (
      |  SELECT sm.doc_id, SUM(CASE WHEN sm.bl = 0 THEN 0 ELSE
      |      ('0x' || substr(sm.hx, ((sm.f * 24 + u.i) % sm.bl) * 2 + 1, 2))::BIGINT
      |    END) AS psum
      |  FROM sm JOIN (SELECT unnest(range(24)) AS i) u ON u.i < sm.slen
      |  GROUP BY sm.doc_id)
      |SELECT t.doc_id AS asset_id,
      |  CAST(348 + 4 * t.n + t.mdat_bytes AS BIGINT) AS mp4_bytes,
      |  32 + (t.doc_id % 8) * 16 AS width,
      |  24 + (t.doc_id % 6) * 12 AS height,
      |  CAST(600 * (1 + (t.doc_id // 3) % 3) AS BIGINT) AS timescale,
      |  CAST(t.n AS BIGINT) AS n_samples,
      |  CAST(t.mdat_bytes AS BIGINT) AS mdat_bytes,
      |  (t.n * 100 * 1000) // (600 * (1 + (t.doc_id // 3) % 3)) AS duration_ms,
      |  CAST(pay.psum AS BIGINT) AS payload_sum
      |FROM tabs t JOIN pay ON pay.doc_id = t.doc_id ORDER BY asset_id""".stripMargin

  /** Declared query `mm_mp4_frag`: the FRAGMENTED (DASH-style)
    * ISO-BMFF walk — the same video assets re-containerized as
    * ftyp/moov(mvex/trex)+moof/mdat pairs, which is how streaming
    * captures actually arrive (the monolithic `mm_mp4` form requires
    * the writer to know every sample up front). decodeFragmented
    * verifies the fragment stream structurally (consecutive mfhd
    * sequence numbers, trun data offsets, EMPTY moov sample tables)
    * and accounts each fragment's trun sizes against its OWN mdat —
    * a size-lying or truncated fragment fails loudly. The oracle
    * replays the closed-form container arithmetic: 372 fixed bytes +
    * 76 per fragment + 4 per sample + payload, fragments of
    * [[Mp4Codec.FragSamples]] samples. Map-only per asset, no
    * shuffle until the final orderBy. */
  def mmMp4Frag(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val decoded = mp4Assets(spark, d).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = Mp4Codec
        rows.map { case (id, mp4) =>
          // re-containerize: monolithic decode yields the sample
          // table, the fragmented encoder re-wraps the same samples
          val meta = codec.decode(mp4)
          val bb = java.nio.ByteBuffer.wrap(mp4)
            .order(java.nio.ByteOrder.BIG_ENDIAN)
          // stsz sizes live right before mdat in Mp4Codec.encode's
          // layout — but decode() does not enforce box order inside
          // moov/stbl, so VERIFY the layout before trusting the
          // arithmetic: the stsz entry table is preceded by its own
          // 20-byte header (size, 'stsz', version/flags, sample_size=0,
          // sample_count=n) and mdat's payload by its 8-byte header.
          // An asset not produced by encode() fails loudly here
          // instead of silently reading garbage sample lengths.
          val mdatStart = mp4.length - meta.mdatBytes.toInt
          val stszBase = mdatStart - 8 - 4 * meta.nSamples
          def tag(at: Int) = new String(mp4, at, 4, "ISO-8859-1")
          require(tag(mdatStart - 4) == "mdat",
            s"asset $id: expected mdat header before payload, got '${tag(mdatStart - 4)}'")
          require(tag(stszBase - 16) == "stsz",
            s"asset $id: expected stsz table before mdat, got '${tag(stszBase - 16)}'")
          require(bb.getInt(stszBase - 8) == 0,
            s"asset $id: stsz sample_size must be 0 (per-sample table)")
          require(bb.getInt(stszBase - 4) == meta.nSamples,
            s"asset $id: stsz sample_count ${bb.getInt(stszBase - 4)} != stts ${meta.nSamples}")
          var off = mdatStart
          val samples = (0 until meta.nSamples).map { k =>
            val len = bb.getInt(stszBase + 4 * k)
            val s = java.util.Arrays.copyOfRange(mp4, off, off + len)
            off += len
            s
          }
          val frag = codec.encodeFragmented(meta.width, meta.height,
            meta.timescale, meta.sampleDelta, samples)
          val m = codec.decodeFragmented(frag)
          (id, frag.length.toLong, m.width.toLong, m.height.toLong,
            m.nFragments.toLong, m.nSamples.toLong, m.mdatBytes,
            m.durationMs, codec.fragPayloadSum(frag))
        }
      }
    decoded.toDF("asset_id", "frag_bytes", "width", "height",
      "n_fragments", "n_samples", "mdat_bytes", "duration_ms",
      "payload_sum")
      .orderBy("asset_id")
  }

  // Same generation arithmetic as mmMp4Sql plus the fragment closed
  // form: F = ceil(n/8) fragments, container = 372 + 76*F + 4*n.
  def mmMp4FragSql: String =
    """WITH base AS (
      |  SELECT doc_id, octet_length(encode(text)) AS bl, hex(encode(text)) AS hx
      |  FROM documents WHERE doc_id % 3 = 2),
      |sm AS (
      |  SELECT b.doc_id, b.bl, b.hx, t.f, 1 + (t.f + b.bl) % 24 AS slen
      |  FROM base b
      |  JOIN (SELECT unnest(range(40)) AS f) t ON t.f < 1 + b.bl % 40),
      |tabs AS (
      |  SELECT doc_id, bl, 1 + bl % 40 AS n,
      |    SUM(slen) AS mdat_bytes
      |  FROM sm GROUP BY doc_id, bl),
      |pay AS (
      |  SELECT sm.doc_id, SUM(CASE WHEN sm.bl = 0 THEN 0 ELSE
      |      ('0x' || substr(sm.hx, ((sm.f * 24 + u.i) % sm.bl) * 2 + 1, 2))::BIGINT
      |    END) AS psum
      |  FROM sm JOIN (SELECT unnest(range(24)) AS i) u ON u.i < sm.slen
      |  GROUP BY sm.doc_id)
      |SELECT t.doc_id AS asset_id,
      |  CAST(372 + 76 * ((t.n + 7) // 8) + 4 * t.n + t.mdat_bytes AS BIGINT)
      |    AS frag_bytes,
      |  32 + (t.doc_id % 8) * 16 AS width,
      |  24 + (t.doc_id % 6) * 12 AS height,
      |  CAST((t.n + 7) // 8 AS BIGINT) AS n_fragments,
      |  CAST(t.n AS BIGINT) AS n_samples,
      |  CAST(t.mdat_bytes AS BIGINT) AS mdat_bytes,
      |  (t.n * 100 * 1000) // (600 * (1 + (t.doc_id // 3) % 3)) AS duration_ms,
      |  CAST(pay.psum AS BIGINT) AS payload_sum
      |FROM tabs t JOIN pay ON pay.doc_id = t.doc_id ORDER BY asset_id""".stripMargin
}
