package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted in batch per partition.
  *
  * The decode tier is REAL, pure-JVM parsers for three public byte
  * formats (binary PPM, uncompressed 24bpp BMP, PCM WAV) plus a
  * magic-byte dispatcher with quarantine (`decodeAny`) — the shape a
  * mixed-format 100 TB corpus actually routes through: payloads never
  * leave executors, decoding is one pass per partition, a bad file
  * yields a quarantine row instead of killing the job, and metadata
  * lives in a typed struct column so planners can prune it
  * independently of the payload.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("data", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType))))))

  /** Build a media table from any (id, text) source: payload = UTF-8
    * bytes, metadata derived deterministically. Stands in for real
    * image/audio ingestion; the column shapes are the contract. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(payloadCol), "UTF-8").as("data"),
      struct(
        element_at(array(lit("png"), lit("jpeg"), lit("wav"), lit("mp4")),
          (pmod(col(idCol), lit(4)) + 1).cast("int")).as("format"),
        (pmod(col(idCol), lit(64)) + 16).cast("int").as("width"),
        (pmod(col(idCol), lit(48)) + 16).cast("int").as("height"),
        (pmod(col(idCol), lit(30)) + 1).cast("int").as("n_frames")).as("meta"))

  /** Unified mixed-format decode summary: detected format, parse
    * success, decoded unit count (pixels for rasters, frames×channels
    * for audio), and the exact integer sum of every decoded value (all
    * channel bytes for rasters, all signed samples for audio). */
  final case class DecodedAny(fmt: String, ok: Boolean, units: Long,
      valSum: Long)

  /** Deterministic mixed-format payload: id%17==0 → corrupt bytes with
    * garbage magic (the quarantine path), else id%3 selects P6 / BMP /
    * WAV — one corpus exercising every decoder AND the dispatcher. */
  def buildMixed(id: Long): Array[Byte] =
    if (id % 17 == 0)
      Array(0xDE.toByte, 0xAD.toByte, 0xBE.toByte, 0xEF.toByte,
        (id % 256).toByte)
    else (id % 3) match {
      case 0 => buildPpm(id)
      case 1 => buildBmp(id)
      case _ => buildWav(id)
    }

  /** Magic-dispatched decode with quarantine — the single entry point a
    * mixed-format corpus routes through. Unknown magic OR a parse
    * failure of a recognized format yields a quarantine row (ok=false,
    * fmt = what the magic claimed) instead of an exception: at 100 TB
    * one corrupt object must never kill the job. */
  private[graft] def decodeAny(data: Array[Byte]): DecodedAny = {
    val fmt =
      if (data.length >= 2 && data(0) == 'P' && data(1) == '6') "ppm"
      else if (data.length >= 2 && data(0) == 'B' && data(1) == 'M') "bmp"
      else if (data.length >= 4 && data(0) == 'R' && data(1) == 'I'
        && data(2) == 'F' && data(3) == 'F') "wav"
      else if (data.length >= 4 && data(0) == 'Y' && data(1) == 'U'
        && data(2) == 'V' && data(3) == '4') "y4m"
      else "unknown"
    try fmt match {
      case "ppm" =>
        val d = decodePpm(data)
        DecodedAny("ppm", ok = true, d.width.toLong * d.height,
          d.sumR + d.sumG + d.sumB)
      case "bmp" =>
        val d = decodeBmp(data)
        DecodedAny("bmp", ok = true, d.width.toLong * d.height,
          d.sumR + d.sumG + d.sumB)
      case "wav" =>
        val d = decodeWav(data)
        DecodedAny("wav", ok = true, d.nFrames.toLong * d.nCh, d.sums.sum)
      case "y4m" =>
        val d = decodeY4m(data)
        DecodedAny("y4m", ok = true, d.nFrames.toLong, d.ySum + d.uvSum)
      case _ => DecodedAny("unknown", ok = false, 0L, 0L)
    } catch {
      case scala.util.control.NonFatal(_) => DecodedAny(fmt, ok = false, 0L, 0L)
    }
  }

  /** Build mixed-format payloads per id and route them through the
    * dispatcher partition-wise — same one-pass batch shape as the
    * per-format stats, with `ok` as 1/0 so the oracle hashes integers. */
  def decodeMixedStats(ids: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("fmt", StringType),
      StructField("ok", LongType),
      StructField("units", LongType),
      StructField("val_sum", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    ids.select(col(ids.columns.head).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val d = decodeAny(buildMixed(id))
          Row(id, d.fmt, if (d.ok) 1L else 0L, d.units, d.valSum)
        }
      }(enc)
  }

  /** Frame sampling for "video" payloads: every `stride`-th frame index
    * from the metadata — pure column math, no payload touch (planner can
    * satisfy it from the meta struct alone). */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.select(col("media_id"), col("meta.n_frames").as("n_frames"),
      sequence(lit(0), col("meta.n_frames") - 1, lit(stride)).as("frame_ids"))

  // ---- REAL raster decode (pure JVM, no codec deps) ---------------------
  // Two public byte formats a 100 TB multimodal pipeline can always fall
  // back to: binary PPM (P6) and uncompressed 24-bit BMP. The decoders
  // are genuine parsers — text header with comment skipping for PPM;
  // little-endian headers, bottom-up row order, BGR channel order, and
  // 4-byte row padding for BMP — so the oracle catches a decoder that
  // mis-parses any of those (a row-padding or orientation slip shifts
  // every downstream byte and changes the per-channel stats).

  /** Decoded raster summary: dimensions, the TOP-LEFT pixel in image
    * space (orientation-sensitive), and per-channel byte sums. */
  final case class DecodedImage(width: Int, height: Int,
      r00: Int, g00: Int, b00: Int, sumR: Long, sumG: Long, sumB: Long)

  /** Deterministic P6 payload for tests/fixtures: w=id%13+4, h=id%11+4,
    * raster byte i = (id*31 + i*7) % 256 — reproducible from the id by
    * any engine. A `#` comment line exercises the parser's comment path. */
  def buildPpm(id: Long): Array[Byte] = {
    val w = (id % 13 + 4).toInt; val h = (id % 11 + 4).toInt
    val header = s"P6\n# synthetic fixture $id\n$w $h\n255\n"
      .getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < w * h * 3) {
      out(header.length + i) = ((id * 31 + i.toLong * 7) % 256).toByte
      i += 1
    }
    out
  }

  /** Deterministic 24bpp bottom-up BMP: w=id%9+4 (w mod 4 cycles all four
    * row-padding cases), h=id%7+3; image-space pixel value
    * v(x, y, c) = (id*31 + (y*w+x)*7 + c*11) % 256 for c = R,G,B = 0,1,2.
    * The FILE stores rows bottom-up as B,G,R with zero padding — exactly
    * what the decoder must undo. */
  def buildBmp(id: Long): Array[Byte] = {
    val w = (id % 9 + 4).toInt; val h = (id % 7 + 3).toInt
    val rowSize = (3 * w + 3) / 4 * 4
    val dataSize = rowSize * h
    val out = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54) // reserved, pixel-data offset
    out.putInt(40).putInt(w).putInt(h) // BITMAPINFOHEADER, +h = bottom-up
      .putShort(1).putShort(24).putInt(0).putInt(dataSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    def v(x: Int, y: Int, c: Int): Byte =
      ((id * 31 + (y.toLong * w + x) * 7 + c.toLong * 11) % 256).toByte
    var fy = 0
    while (fy < h) {
      val y = h - 1 - fy // file row fy holds image row h-1-fy
      var x = 0
      while (x < w) {
        out.put(v(x, y, 2)).put(v(x, y, 1)).put(v(x, y, 0)) // B, G, R
        x += 1
      }
      var p = 3 * w
      while (p < rowSize) { out.put(0.toByte); p += 1 }
      fy += 1
    }
    out.array()
  }

  /** Parse a P6 header: magic, whitespace/comment-tolerant ints, single
    * whitespace after maxval. Returns (width, height, rasterOffset). */
  private def ppmHeader(data: Array[Byte]): (Int, Int, Int) = {
    require(data.length >= 2 && data(0) == 'P' && data(1) == '6', "not P6")
    var pos = 2
    def nextInt(): Int = {
      // skip whitespace and '#'-to-end-of-line comments
      var done = false
      while (!done) {
        while (pos < data.length && data(pos).toChar.isWhitespace) pos += 1
        if (pos < data.length && data(pos) == '#')
          while (pos < data.length && data(pos) != '\n') pos += 1
        else done = true
      }
      var v = 0
      while (pos < data.length && data(pos) >= '0' && data(pos) <= '9') {
        v = v * 10 + (data(pos) - '0'); pos += 1
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    require(w > 0 && h > 0 && maxval == 255, s"bad P6 header $w x $h / $maxval")
    pos += 1 // exactly one whitespace byte after maxval
    require(data.length - pos >= w * h * 3, "truncated P6 raster")
    (w, h, pos)
  }

  /** Parse a binary-PPM (P6) payload: magic, whitespace/comment-tolerant
    * header ints, single whitespace after maxval, then top-down RGB
    * raster. */
  private[graft] def decodePpm(data: Array[Byte]): DecodedImage = {
    val (w, h, pos) = ppmHeader(data)
    var sr = 0L; var sg = 0L; var sb = 0L
    var p = 0
    while (p < w * h) {
      sr += data(pos + 3 * p) & 0xff
      sg += data(pos + 3 * p + 1) & 0xff
      sb += data(pos + 3 * p + 2) & 0xff
      p += 1
    }
    DecodedImage(w, h, data(pos) & 0xff, data(pos + 1) & 0xff,
      data(pos + 2) & 0xff, sr, sg, sb)
  }

  /** Parse an uncompressed 24bpp BMP: little-endian headers, pixel-data
    * offset from the file header, bottom-up row order when height is
    * positive, BGR byte order, rows padded to 4 bytes. */
  private[graft] def decodeBmp(data: Array[Byte]): DecodedImage = {
    require(data.length >= 54 && data(0) == 'B' && data(1) == 'M', "not BMP")
    val buf = java.nio.ByteBuffer.wrap(data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val off = buf.getInt(10)
    val w = buf.getInt(18)
    val hRaw = buf.getInt(22)
    val bottomUp = hRaw > 0
    val h = math.abs(hRaw)
    require(buf.getShort(28) == 24, "only 24bpp supported")
    require(buf.getInt(30) == 0, "only uncompressed (BI_RGB) supported")
    val rowSize = (3 * w + 3) / 4 * 4
    require(data.length >= off + rowSize * h, "truncated BMP raster")
    def rowStart(y: Int): Int = // y in IMAGE space (0 = top)
      off + (if (bottomUp) (h - 1 - y) else y) * rowSize
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      val rs = rowStart(y)
      var x = 0
      while (x < w) {
        sb += data(rs + 3 * x) & 0xff
        sg += data(rs + 3 * x + 1) & 0xff
        sr += data(rs + 3 * x + 2) & 0xff
        x += 1
      }
      y += 1
    }
    val r0 = rowStart(0)
    DecodedImage(w, h, data(r0 + 2) & 0xff, data(r0 + 1) & 0xff,
      data(r0) & 0xff, sr, sg, sb)
  }

  // ---- REAL audio decode (pure JVM, PCM WAV) ----------------------------
  // The audio twin of the PPM/BMP tier: RIFF/WAVE is a public container
  // format a 100 TB multimodal pipeline can always fall back to. The
  // parser is genuine — chunk walking with word-alignment padding,
  // little-endian fmt fields, an unknown chunk it must skip, interleaved
  // signed 16-bit samples — so the oracle catches a decoder that slips
  // on any of those (a mis-skipped chunk or sign error shifts every
  // downstream stat).

  /** Decoded PCM summary: per-channel frame count, amplitude sum, sum of
    * squares, and peak (max |s|). */
  final case class DecodedAudio(nCh: Int, nFrames: Int,
      sums: Array[Long], sumSqs: Array[Long], peaks: Array[Int]) {
    override def equals(o: Any): Boolean = o match {
      case a: DecodedAudio => nCh == a.nCh && nFrames == a.nFrames &&
        sums.sameElements(a.sums) && sumSqs.sameElements(a.sumSqs) &&
        peaks.sameElements(a.peaks)
      case _ => false
    }
  }

  /** Deterministic sample value: s(id, frame, ch) =
    * (id*31 + frame*7 + ch*13) % 4096 − 2048 — spans negative amplitudes
    * so the parser's int16 sign handling is load-bearing. */
  def wavSample(id: Long, f: Int, c: Int): Short =
    (((id * 31 + f.toLong * 7 + c.toLong * 13) % 4096) - 2048).toShort

  /** Deterministic 16-bit PCM WAV: channels = id%2+1 (mono/stereo),
    * frames = id%50+20, plus a LIST chunk of id%5+1 junk bytes between
    * fmt and data — odd sizes force the parser through RIFF's
    * word-alignment pad byte. */
  def buildWav(id: Long): Array[Byte] = {
    val nCh = (id % 2 + 1).toInt
    val nFrames = (id % 50 + 20).toInt
    val blockAlign = nCh * 2
    val dataSize = nFrames * blockAlign
    val junkSize = (id % 5 + 1).toInt
    val junkPadded = junkSize + (junkSize & 1)
    val riffSize = 4 + (8 + 16) + (8 + junkPadded) + (8 + dataSize)
    val out = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(nCh.toShort).putInt(8000).putInt(8000 * blockAlign)
      .putShort(blockAlign.toShort).putShort(16)
    out.put("LIST".getBytes("US-ASCII")).putInt(junkSize)
    var j = 0
    while (j < junkSize) { out.put(((id + j) % 256).toByte); j += 1 }
    if ((junkSize & 1) == 1) out.put(0.toByte) // alignment pad
    out.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var f = 0
    while (f < nFrames) {
      var c = 0
      while (c < nCh) { out.putShort(wavSample(id, f, c)); c += 1 }
      f += 1
    }
    out.array()
  }

  /** Parse a PCM WAV payload: RIFF/WAVE magic, chunk walk (word-aligned —
    * odd-length chunks carry a pad byte), fmt validation (PCM, 16-bit),
    * unknown chunks skipped, interleaved LE int16 frames. */
  /** RIFF chunk walk shared by the stat decode and the sample reader:
    * (channels, data offset, frame count) after validating fmt/data. */
  private def wavLayout(data: Array[Byte])
      : (Int, Int, Int) = {
    require(data.length >= 12 && data(0) == 'R' && data(1) == 'I'
      && data(2) == 'F' && data(3) == 'F', "not RIFF")
    require(new String(data, 8, 4, "US-ASCII") == "WAVE", "not WAVE")
    val buf = java.nio.ByteBuffer.wrap(data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var nCh = -1; var blockAlign = -1
    var dataOff = -1; var dataLen = -1
    while (pos + 8 <= data.length && (nCh < 0 || dataOff < 0)) {
      val cid = new String(data, pos, 4, "US-ASCII")
      val clen = buf.getInt(pos + 4)
      if (cid == "fmt ") {
        require(buf.getShort(pos + 8) == 1, "only PCM supported")
        nCh = buf.getShort(pos + 10)
        blockAlign = buf.getShort(pos + 20)
        require(buf.getShort(pos + 22) == 16, "only 16-bit supported")
      } else if (cid == "data") { dataOff = pos + 8; dataLen = clen }
      pos += 8 + clen + (clen & 1) // chunks are word-aligned
    }
    require(nCh > 0 && dataOff >= 0, "missing fmt/data chunk")
    require(blockAlign == nCh * 2 && dataLen % blockAlign == 0,
      s"bad block alignment $blockAlign / data length $dataLen")
    require(data.length >= dataOff + dataLen, "truncated data chunk")
    (nCh, dataOff, dataLen / blockAlign)
  }

  private[graft] def decodeWav(data: Array[Byte], stride: Int = 1)
      : DecodedAudio = {
    val (nCh, dataOff, nFrames) = wavLayout(data)
    val buf = java.nio.ByteBuffer.wrap(data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val sums = new Array[Long](nCh)
    val sumSqs = new Array[Long](nCh)
    val peaks = new Array[Int](nCh)
    // stride > 1 = integer decimation (mm7): keep frames 0, stride, 2·
    // stride, …; nFrames reports the KEPT count so means divide by what
    // was actually accumulated. stride == 1 is the full mm5 decode.
    var f = 0
    var kept = 0
    while (f < nFrames) {
      var c = 0
      while (c < nCh) {
        val s = buf.getShort(dataOff + (f * nCh + c) * 2).toInt
        sums(c) += s
        sumSqs(c) += s.toLong * s
        if (math.abs(s) > peaks(c)) peaks(c) = math.abs(s)
        c += 1
      }
      kept += 1
      f += stride
    }
    DecodedAudio(nCh, kept, sums, sumSqs, peaks)
  }

  /** mm12: time-domain audio features per channel — lag-L
    * autocorrelation (periodicity / voiced-ness) and zero-crossing
    * count (noisiness), both exact BIGINT sums over the decoded int16
    * samples. One row per (media_id, channel); the usual one-pass
    * no-shuffle batch shape. */
  def audioFeatureStats(ids: DataFrame, lag: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("channel", LongType),
      StructField("n_frames", LongType),
      StructField("autocorr", LongType),
      StructField("zero_cross", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    ids.select(col(ids.columns.head).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val data = buildWav(id)
          val (nCh, dataOff, nFrames) = wavLayout(data)
          val buf = java.nio.ByteBuffer.wrap(data)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          def s(f: Int, c: Int): Int = buf.getShort(dataOff + (f * nCh + c) * 2).toInt
          (0 until nCh).map { c =>
            var ac = 0L; var zc = 0L
            var f = 0
            while (f < nFrames - lag) {
              ac += s(f, c).toLong * s(f + lag, c); f += 1
            }
            f = 1
            while (f < nFrames) {
              if ((s(f, c) >= 0) != (s(f - 1, c) >= 0)) zc += 1
              f += 1
            }
            Row(id, c.toLong, nFrames.toLong, ac, zc)
          }
        }
      }(enc)
  }

  /** Build WAV payloads per id and decode them partition-wise — one row
    * per (media_id, channel), same batch shape as decodeImageStats. */
  def decodeWavStats(ids: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("channel", LongType),
      StructField("n_frames", LongType),
      StructField("amp_sum", LongType),
      StructField("amp_sumsq", LongType),
      StructField("amp_peak", LongType),
      StructField("amp_mean", DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    ids.select(col(ids.columns.head).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val d = decodeWav(buildWav(id))
          (0 until d.nCh).map { c =>
            Row(id, c.toLong, d.nFrames.toLong, d.sums(c), d.sumSqs(c),
              d.peaks(c).toLong, d.sums(c).toDouble / d.nFrames)
          }
        }
      }(enc)
  }

  /** mm7: audio DOWNSAMPLE by integer decimation — keep every `stride`-th
    * frame, stats over the decimated signal only. (Production resampling
    * low-pass-filters before decimating to avoid aliasing; plain
    * decimation keeps the math integer-exact and oracle-checkable, and
    * the partition-wise batch shape — the part that matters at 100 TB —
    * is identical either way.) */
  def downsampleWavStats(ids: DataFrame, stride: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("channel", LongType),
      StructField("n_frames", LongType),
      StructField("amp_sum", LongType),
      StructField("amp_peak", LongType),
      StructField("amp_mean", DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    ids.select(col(ids.columns.head).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val d = decodeWav(buildWav(id), stride)
          (0 until d.nCh).map { c =>
            Row(id, c.toLong, d.nFrames.toLong, d.sums(c),
              d.peaks(c).toLong, d.sums(c).toDouble / d.nFrames)
          }
        }
      }(enc)
  }

  /** mm8: perceptual average-hash (aHash — public knowledge: resample
    * to 8x8, grayscale, threshold each pixel at the mean) over a
    * re-used-creative corpus: payload class = id % 40, and every
    * id % 5 == 1 payload carries a one-byte brightness bump — a
    * byte-exact hash splits those from their class, the perceptual
    * hash usually does not (a bit only flips when the bumped gray
    * crosses the mean). The hash is a 64-char '0'/'1' string so no
    * engine's signed-shift semantics are in play. Same one-pass
    * partition-wise batch shape as every mm decoder. */
  def ahashBits(ids: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("ahash", StringType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    ids.select(col(ids.columns.head).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = buildPpm(id % 40)
          val (_, _, off) = ppmHeader(payload)
          if (id % 5 == 1)
            payload(off) = (((payload(off) & 0xff) + 1) % 256).toByte
          val raster = resampleNearestRaster(payload, 8, 8)
          val g = new Array[Int](64)
          var p = 0
          var sum = 0L
          while (p < 64) {
            g(p) = ((raster(3 * p) & 0xff) + (raster(3 * p + 1) & 0xff) +
              (raster(3 * p + 2) & 0xff)) / 3
            sum += g(p)
            p += 1
          }
          val mean = sum / 64
          val sb = new StringBuilder(64)
          p = 0
          while (p < 64) { sb.append(if (g(p) > mean) '1' else '0'); p += 1 }
          Row(id, sb.toString)
        }
      }(enc)
  }

  /** Magic-dispatched raster decode (throwing form — `decodeAny` is the
    * quarantining entry point for mixed corpora). */
  private[graft] def decodeImage(data: Array[Byte]): DecodedImage =
    if (data.length >= 2 && data(0) == 'P' && data(1) == '6') decodePpm(data)
    else if (data.length >= 2 && data(0) == 'B' && data(1) == 'M') decodeBmp(data)
    else throw new IllegalArgumentException(
      s"unknown image magic: ${data.take(2).map(_ & 0xff).mkString(",")}")

  /** Build payloads with `builder` and decode them partition-wise — one
    * iterator pass per partition (the Scala twin of a pandas-batched
    * UDF), emitting orientation-sensitive pixel stats the oracle can
    * recompute. */
  /** Resized-raster summary: source dims, output dims, the BOTTOM-RIGHT
    * output pixel (sensitive to the sampling-coordinate math on both
    * axes), and per-channel byte sums over the RESIZED raster. */
  final case class ResizedImage(srcW: Int, srcH: Int, w: Int, h: Int,
      rLast: Int, gLast: Int, bLast: Int, sumR: Long, sumG: Long, sumB: Long)

  /** Nearest-neighbor resize of a P6 payload to `outW`×`outH`: output
    * pixel (x, y) samples source pixel (⌊x·w/outW⌋, ⌊y·h/outH⌋). A real
    * resize — the output raster is materialized, then summarized — and
    * the standard thumbnail/normalize step before any vision model sees
    * a training batch. Handles up- AND down-sampling (source dims span
    * both sides of the target). */
  /** nearest-neighbor resample of a PPM payload to outW x outH — the
    * raster-producing core shared by mm6's resize stats and mm8's
    * perceptual hash */
  private def resampleNearestRaster(data: Array[Byte], outW: Int,
      outH: Int): Array[Byte] = {
    val (w, h, off) = ppmHeader(data)
    val out = new Array[Byte](outW * outH * 3)
    var y = 0
    while (y < outH) {
      val sy = y * h / outH
      var x = 0
      while (x < outW) {
        val sp = off + (sy * w + x * w / outW) * 3
        val dp = (y * outW + x) * 3
        out(dp) = data(sp); out(dp + 1) = data(sp + 1)
        out(dp + 2) = data(sp + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  private[graft] def resizePpmNearest(data: Array[Byte], outW: Int,
      outH: Int): ResizedImage = {
    val (w, h, _) = ppmHeader(data)
    val out = resampleNearestRaster(data, outW, outH)
    var sr = 0L; var sg = 0L; var sb = 0L
    var p = 0
    while (p < outW * outH) {
      sr += out(3 * p) & 0xff; sg += out(3 * p + 1) & 0xff
      sb += out(3 * p + 2) & 0xff
      p += 1
    }
    val lp = (outH * outW - 1) * 3
    ResizedImage(w, h, outW, outH, out(lp) & 0xff, out(lp + 1) & 0xff,
      out(lp + 2) & 0xff, sr, sg, sb)
  }

  /** Build PPM payloads per id and resize them partition-wise to a fixed
    * target — same one-pass batch shape as decodeImageStats; all-integer
    * outputs so the oracle hashes exactly. */
  def resizeStats(ids: DataFrame, outW: Int, outH: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("src_w", LongType), StructField("src_h", LongType),
      StructField("out_w", LongType), StructField("out_h", LongType),
      StructField("r_last", LongType), StructField("g_last", LongType),
      StructField("b_last", LongType),
      StructField("sum_r", LongType), StructField("sum_g", LongType),
      StructField("sum_b", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    ids.select(col(ids.columns.head).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val d = resizePpmNearest(buildPpm(id), outW, outH)
          Row(id, d.srcW.toLong, d.srcH.toLong, d.w.toLong, d.h.toLong,
            d.rLast.toLong, d.gLast.toLong, d.bLast.toLong,
            d.sumR, d.sumG, d.sumB)
        }
      }(enc)
  }

  // ---- REAL video decode: Y4M (YUV4MPEG2) ------------------------------
  // The one public video container that needs no codec: a plain-text
  // header line (`YUV4MPEG2 W.. H.. F..:.. [Ip A..:.. C..]`) followed by
  // raw frames, each prefixed by a `FRAME[ params]\n` marker (used by
  // ffmpeg/mjpegtools as the uncompressed interchange format). The
  // parser is genuine: header parameters are keyed by leading letter and
  // may appear in ANY order, unknown parameters (F/I/A/X) are skipped,
  // frame markers may carry parameter strings that must be consumed to
  // the newline, and the frame payload size depends on the colorspace
  // (C444 = 3 planes of w*h, Cmono = Y only) — mis-parsing any of these
  // desynchronizes every following frame and diverges the stats.

  /** Decoded video summary over the KEPT (strided) frames: dimensions,
    * colorspace, total vs kept frame counts, Y-plane and chroma byte
    * sums, and the first Y byte of the LAST kept frame (any frame-size
    * or marker slip shifts it). */
  final case class DecodedVideo(width: Int, height: Int, cs: String,
      nFrames: Int, kept: Int, ySum: Long, uvSum: Long, y00Last: Int)

  /** Deterministic frame byte: byte `p` of frame `f` of video `id`. */
  def y4mByte(id: Long, f: Int, p: Int): Int =
    ((id * 31 + f.toLong * 19 + p.toLong * 7) % 256).toInt

  /** Deterministic Y4M payload: w=id%9+4, h=id%7+3, frames=id%20+5
    * (covers every mod-stride residue for small strides), colorspace
    * C444 for even ids / Cmono for odd ids (frame size math differs),
    * header parameter ORDER varies by id%3, and every third frame
    * marker carries a parameter string — all real-format variation the
    * parser must absorb. */
  def buildY4m(id: Long): Array[Byte] = {
    val w = (id % 9 + 4).toInt; val h = (id % 7 + 3).toInt
    val nf = (id % 20 + 5).toInt
    val cs = if (id % 2 == 0) "C444" else "Cmono"
    val bpp = if (id % 2 == 0) 3 else 1
    val header =
      if (id % 3 == 0) s"YUV4MPEG2 $cs W$w H$h F25:1\n"
      else s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 $cs\n"
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(header.getBytes("US-ASCII"))
    var f = 0
    while (f < nf) {
      val marker = if (f % 3 == 2) "FRAME Xgraft\n" else "FRAME\n"
      bos.write(marker.getBytes("US-ASCII"))
      val n = bpp * w * h
      var p = 0
      while (p < n) { bos.write(y4mByte(id, f, p)); p += 1 }
      f += 1
    }
    bos.toByteArray
  }

  /** Parse a Y4M payload, keeping every `stride`-th frame (stride 1 =
    * full decode). Throws on malformed/truncated input — callers that
    * need quarantine semantics route through `decodeAny`. */
  /** Parse the YUV4MPEG2 stream header: (w, h, bytes-per-pixel,
    * offset of the first FRAME marker). Shared by the full decode and
    * the per-frame luma walk. */
  private def y4mHeader(data: Array[Byte]): (Int, Int, Int, Int) = {
    var eol = 0
    while (eol < data.length && data(eol) != '\n') eol += 1
    require(eol < data.length, "unterminated Y4M header")
    val header = new String(data, 0, eol, "US-ASCII")
    val toks = header.split(" ")
    require(toks.nonEmpty && toks(0) == "YUV4MPEG2", "not YUV4MPEG2")
    var w = -1; var h = -1; var cs = "C420" // format default when absent
    toks.iterator.drop(1).filter(_.nonEmpty).foreach { tk =>
      tk.charAt(0) match {
        case 'W' => w = tk.substring(1).toInt
        case 'H' => h = tk.substring(1).toInt
        case 'C' => cs = tk
        case _   => () // F (rate), I (interlace), A (aspect), X (app)
      }
    }
    require(w > 0 && h > 0, "missing W/H header parameters")
    val bpp = cs match {
      case "C444"  => 3
      case "Cmono" => 1
      case other => throw new IllegalArgumentException(
        s"unsupported colorspace $other")
    }
    (w, h, bpp, eol + 1)
  }

  private[graft] def decodeY4m(data: Array[Byte], stride: Int = 1)
      : DecodedVideo = {
    val (w, h, bpp, start) = y4mHeader(data)
    val cs = if (bpp == 3) "C444" else "Cmono"
    val frameBytes = bpp * w * h
    val yBytes = w * h
    var pos = start
    var f = 0; var kept = 0
    var ySum = 0L; var uvSum = 0L; var y00Last = -1
    while (pos < data.length) {
      require(pos + 5 <= data.length &&
        new String(data, pos, 5, "US-ASCII") == "FRAME",
        s"bad FRAME marker at offset $pos")
      var e = pos + 5
      while (e < data.length && data(e) != '\n') e += 1
      require(e < data.length, "unterminated FRAME marker")
      pos = e + 1
      require(pos + frameBytes <= data.length, "truncated frame payload")
      if (f % stride == 0) {
        var p = 0
        while (p < frameBytes) {
          val v = data(pos + p) & 0xFF
          if (p < yBytes) ySum += v else uvSum += v
          p += 1
        }
        y00Last = data(pos) & 0xFF
        kept += 1
      }
      pos += frameBytes
      f += 1
    }
    require(f > 0, "no frames")
    DecodedVideo(w, h, cs, f, kept, ySum, uvSum, y00Last)
  }

  /** mm9: frame-sample the video tier — build Y4M payloads per id,
    * decode every `stride`-th frame partition-wise (the temporal
    * analog of mm7's audio decimation, over a CONTAINER format whose
    * frames must be walked to be skipped). One row per video; same
    * one-pass no-shuffle batch shape as every mm decoder. */
  def frameSampleY4mStats(ids: DataFrame, stride: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("w", LongType), StructField("h", LongType),
      StructField("cs", StringType),
      StructField("n_frames", LongType), StructField("kept", LongType),
      StructField("y_sum", LongType), StructField("uv_sum", LongType),
      StructField("y00_last", LongType),
      StructField("y_mean", DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    ids.select(col(ids.columns.head).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val d = decodeY4m(buildY4m(id), stride)
          Row(id, d.width.toLong, d.height.toLong, d.cs,
            d.nFrames.toLong, d.kept.toLong, d.ySum, d.uvSum,
            d.y00Last.toLong,
            d.ySum.toDouble / (d.kept.toLong * d.width * d.height))
        }
      }(enc)
  }

  /** Walk every frame of a Y4M payload and return (w, h, per-frame
    * LUMA sums) — the Y plane is the first w·h bytes of each frame in
    * both supported colorspaces. Skipped chroma planes are still
    * walked positionally (a size slip desynchronizes the rest, same
    * discipline as the strided decode). */
  private[graft] def decodeY4mFrameYSums(data: Array[Byte])
      : (Int, Int, Array[Long]) = {
    val (w, h, bpp, start) = y4mHeader(data)
    val frameBytes = bpp * w * h
    val yBytes = w * h
    var pos = start
    val sums = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (pos < data.length) {
      require(pos + 5 <= data.length &&
        new String(data, pos, 5, "US-ASCII") == "FRAME",
        s"bad FRAME marker at offset $pos")
      var e = pos + 5
      while (e < data.length && data(e) != '\n') e += 1
      require(e < data.length, "unterminated FRAME marker")
      pos = e + 1
      require(pos + frameBytes <= data.length, "truncated frame payload")
      var s = 0L; var p = 0
      while (p < yBytes) { s += data(pos + p) & 0xFF; p += 1 }
      sums += s
      pos += frameBytes
    }
    require(sums.nonEmpty, "no frames")
    (w, h, sums.toArray)
  }

  /** mm11: per-frame luma rows for shot detection — one row per frame
    * with the frame's exact Y sum and the plane size; boundary logic
    * stays declarative in the query (a lag window over (video, frame)).
    * Same one-pass no-shuffle batch shape as every mm decoder. */
  def frameLumaStats(ids: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType), StructField("f", LongType),
      StructField("wh", LongType), StructField("y_sum", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    ids.select(col(ids.columns.head).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val (w, h, sums) = decodeY4mFrameYSums(buildY4m(id))
          sums.iterator.zipWithIndex.map { case (s, f) =>
            Row(id, f.toLong, w.toLong * h, s)
          }
        }
      }(enc)
  }

  /** mm10: PATCHIFY — the ViT-style preprocessing step that turns an
    * image into a grid of patch tokens: the raster splits into a
    * grid×grid tiling with integer-division boundaries (x ∈
    * [px·w/g, (px+1)·w/g) — exact cover, no pixel dropped or counted
    * twice even when g doesn't divide w), one output row per patch with
    * its dims and per-channel sums. Same one-pass no-shuffle batch
    * shape as every mm decoder; downstream these rows pivot to the
    * patch-embedding layout a vision model consumes. */
  def patchifyStats(ids: DataFrame, grid: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("px", LongType), StructField("py", LongType),
      StructField("pw", LongType), StructField("ph", LongType),
      StructField("sum_r", LongType), StructField("sum_g", LongType),
      StructField("sum_b", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    ids.select(col(ids.columns.head).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val data = buildPpm(id)
          val (w, h, off) = ppmHeader(data)
          for (py <- 0 until grid; px <- 0 until grid) yield {
            val x0 = px * w / grid; val x1 = (px + 1) * w / grid
            val y0 = py * h / grid; val y1 = (py + 1) * h / grid
            var sr = 0L; var sg = 0L; var sb = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val p = off + (y * w + x) * 3
                sr += data(p) & 0xff; sg += data(p + 1) & 0xff
                sb += data(p + 2) & 0xff
                x += 1
              }
              y += 1
            }
            Row(id, px.toLong, py.toLong, (x1 - x0).toLong,
              (y1 - y0).toLong, sr, sg, sb)
          }
        }
      }(enc)
  }

  def decodeImageStats(ids: DataFrame, builder: Long => Array[Byte]): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("w", LongType), StructField("h", LongType),
      StructField("r00", LongType), StructField("g00", LongType),
      StructField("b00", LongType),
      StructField("mean_r", DoubleType), StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    ids.select(col(ids.columns.head).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val d = decodeImage(builder(id))
          val n = d.width.toLong * d.height
          Row(id, d.width.toLong, d.height.toLong, d.r00.toLong,
            d.g00.toLong, d.b00.toLong,
            d.sumR.toDouble / n, d.sumG.toDouble / n, d.sumB.toDouble / n)
        }
      }(enc)
  }
}
