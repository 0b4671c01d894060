package graft

import org.apache.spark.sql.functions._
import graft.functions.Multimodal

class MultimodalSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private lazy val media = Multimodal.asMedia(
    spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text").cache()

  test("media schema: binary payload + typed metadata struct") {
    def shape(s: org.apache.spark.sql.types.StructType): Seq[(String, String)] =
      s.fields.map(f =>
        f.name -> f.dataType.sql.replace(" NOT NULL", "")).toSeq
    assert(shape(media.schema) == shape(Multimodal.mediaSchema))
  }

  test("decodeAny: routes each format by magic and matches the " +
      "per-format decoders") {
    val idPpm = 3L; val idBmp = 7L; val idWav = 5L // id%3 = 0/1/2, none %17==0
    val p = Multimodal.decodeAny(Multimodal.buildMixed(idPpm))
    val dp = Multimodal.decodePpm(Multimodal.buildPpm(idPpm))
    assert(p == Multimodal.DecodedAny("ppm", ok = true,
      dp.width.toLong * dp.height, dp.sumR + dp.sumG + dp.sumB))
    val b = Multimodal.decodeAny(Multimodal.buildMixed(idBmp))
    val db = Multimodal.decodeBmp(Multimodal.buildBmp(idBmp))
    assert(b == Multimodal.DecodedAny("bmp", ok = true,
      db.width.toLong * db.height, db.sumR + db.sumG + db.sumB))
    val w = Multimodal.decodeAny(Multimodal.buildMixed(idWav))
    val dw = Multimodal.decodeWav(Multimodal.buildWav(idWav))
    assert(w == Multimodal.DecodedAny("wav", ok = true,
      dw.nFrames.toLong * dw.nCh, dw.sums.sum))
  }

  test("decodeAny: quarantines instead of throwing — garbage magic AND " +
      "valid-magic-but-truncated payloads") {
    // id%17==0 → corrupt payload class from the mixed builder
    assert(Multimodal.decodeAny(Multimodal.buildMixed(17L))
      == Multimodal.DecodedAny("unknown", ok = false, 0L, 0L))
    // truncated WAV keeps its detected format in the quarantine row
    val wav = Multimodal.buildWav(9L)
    assert(Multimodal.decodeAny(wav.take(wav.length - 3))
      == Multimodal.DecodedAny("wav", ok = false, 0L, 0L))
    // truncated PPM raster likewise
    val ppm = Multimodal.buildPpm(9L)
    assert(Multimodal.decodeAny(ppm.take(ppm.length - 1))
      == Multimodal.DecodedAny("ppm", ok = false, 0L, 0L))
  }

  test("frame sampling reads only metadata") {
    val frames = Multimodal.sampleFrames(media, 5).collect()
    frames.foreach { r =>
      val n = r.getAs[Int]("n_frames")
      val ids = r.getAs[scala.collection.Seq[Long]]("frame_ids")
      assert(ids == (0 until n by 5).map(_.toLong))
    }
  }

  test("PPM decode: parser matches the generation formula, including the " +
      "comment line and corner pixel") {
    for (id <- Seq(0L, 7L, 123L)) {
      val d = Multimodal.decodePpm(Multimodal.buildPpm(id))
      val w = (id % 13 + 4).toInt; val h = (id % 11 + 4).toInt
      assert(d.width == w && d.height == h)
      assert(d.r00 == (id * 31 % 256).toInt
        && d.g00 == ((id * 31 + 7) % 256).toInt
        && d.b00 == ((id * 31 + 14) % 256).toInt)
      val sums = (0 until 3).map(c => (0 until w * h)
        .map(p => (id * 31 + (3L * p + c) * 7) % 256).sum)
      assert((d.sumR, d.sumG, d.sumB) == ((sums(0), sums(1), sums(2))))
    }
  }

  test("BMP decode: bottom-up AND top-down (negative height) payloads " +
      "yield identical image-space stats") {
    val id = 42L
    val up = Multimodal.buildBmp(id)
    val d1 = Multimodal.decodeBmp(up)
    val w = (id % 9 + 4).toInt; val h = (id % 7 + 3).toInt
    assert(d1.width == w && d1.height == h)
    assert(d1.r00 == (id * 31 % 256).toInt
      && d1.g00 == ((id * 31 + 11) % 256).toInt
      && d1.b00 == ((id * 31 + 22) % 256).toInt)
    // flip to a TOP-DOWN file: negate height, reverse stored row order —
    // a correct decoder returns the identical image-space result
    val rowSize = (3 * w + 3) / 4 * 4
    val down = up.clone()
    val buf = java.nio.ByteBuffer.wrap(down)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(22, -h)
    for (fy <- 0 until h; i <- 0 until rowSize)
      down(54 + fy * rowSize + i) = up(54 + (h - 1 - fy) * rowSize + i)
    val d2 = Multimodal.decodeBmp(down)
    assert(d1 == d2, s"orientation must be normalized: $d1 vs $d2")
  }

  test("WAV decode: parser matches the generation formula across mono/" +
      "stereo, odd junk-chunk padding, and negative amplitudes") {
    for (id <- Seq(0L, 7L, 123L, 4L)) { // ids cover nch=1/2, junk odd/even
      val d = Multimodal.decodeWav(Multimodal.buildWav(id))
      val nCh = (id % 2 + 1).toInt; val nF = (id % 50 + 20).toInt
      assert(d.nCh == nCh && d.nFrames == nF)
      for (c <- 0 until nCh) {
        val samples = (0 until nF).map(f => Multimodal.wavSample(id, f, c).toInt)
        assert(d.sums(c) == samples.map(_.toLong).sum)
        assert(d.sumSqs(c) == samples.map(s => s.toLong * s).sum)
        assert(d.peaks(c) == samples.map(math.abs).max)
        assert(samples.exists(_ < 0), "fixture must exercise the sign path")
      }
    }
  }

  test("PPM resize: nearest-neighbor matches an independent per-pixel " +
      "recomputation, and a same-size resize is the identity") {
    for (id <- Seq(0L, 7L, 123L, 4L)) { // source dims span both sides of 8x8
      val r = Multimodal.resizePpmNearest(Multimodal.buildPpm(id), 8, 8)
      val w = (id % 13 + 4).toInt; val h = (id % 11 + 4).toInt
      assert(r.srcW == w && r.srcH == h && r.w == 8 && r.h == 8)
      def px(x: Int, y: Int, c: Int): Long = {
        val p = (y * h / 8) * w + x * w / 8
        (id * 31 + (3L * p + c) * 7) % 256
      }
      assert(r.rLast == px(7, 7, 0) && r.gLast == px(7, 7, 1)
        && r.bLast == px(7, 7, 2))
      val sums = (0 until 3).map(c =>
        (for (y <- 0 until 8; x <- 0 until 8) yield px(x, y, c)).sum)
      assert((r.sumR, r.sumG, r.sumB) == ((sums(0), sums(1), sums(2))))
      // resize to the source's own dims = identity → sums match decodePpm
      val same = Multimodal.resizePpmNearest(Multimodal.buildPpm(id), w, h)
      val d = Multimodal.decodePpm(Multimodal.buildPpm(id))
      assert((same.sumR, same.sumG, same.sumB) == ((d.sumR, d.sumG, d.sumB)))
    }
  }

  test("WAV decode rejects non-RIFF and truncated payloads") {
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav("nope".getBytes("US-ASCII"))
    }
    val ok = Multimodal.buildWav(9L)
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav(ok.take(ok.length - 3))
    }
  }

  test("WAV strided decode: decimation matches an independent " +
      "recomputation across mono/stereo and every mod-4 frame residue, " +
      "and stride=1 is the unchanged full decode") {
    // ids 20..27 cover nch 1/2 x nFrames % 4 in {0,1,2,3}
    for (id <- 20L to 27L; stride <- Seq(1, 4)) {
      val d = Multimodal.decodeWav(Multimodal.buildWav(id), stride)
      val nCh = (id % 2 + 1).toInt
      val total = (id % 50 + 20).toInt
      val keptFrames = 0 until total by stride
      assert(d.nCh == nCh)
      assert(d.nFrames == keptFrames.size,
        s"id=$id stride=$stride: kept-count ceiling math")
      for (c <- 0 until nCh) {
        val samples = keptFrames.map(f => Multimodal.wavSample(id, f, c).toInt)
        assert(d.sums(c) == samples.map(_.toLong).sum)
        assert(d.sumSqs(c) == samples.map(s => s.toLong * s).sum)
        assert(d.peaks(c) == samples.map(math.abs).max)
      }
      if (stride == 1)
        assert(d == Multimodal.decodeWav(Multimodal.buildWav(id)),
          "default decode must be byte-for-byte the stride-1 decode")
    }
  }

  test("Y4M decode: parser matches an independent recomputation across " +
      "both colorspaces, both header orders, frame params, and every " +
      "mod-3 stride residue") {
    // ids 30..41 cover C444/Cmono x header order (id%3) x nf%3 residues
    for (id <- 30L to 41L; stride <- Seq(1, 3)) {
      val d = Multimodal.decodeY4m(Multimodal.buildY4m(id), stride)
      val w = (id % 9 + 4).toInt; val h = (id % 7 + 3).toInt
      val nf = (id % 20 + 5).toInt
      val bpp = if (id % 2 == 0) 3 else 1
      val keptFrames = 0 until nf by stride
      assert(d.width == w && d.height == h)
      assert(d.cs == (if (id % 2 == 0) "C444" else "Cmono"))
      assert(d.nFrames == nf && d.kept == keptFrames.size,
        s"id=$id stride=$stride: kept-count math")
      val bytes = for (f <- keptFrames; p <- 0 until bpp * w * h)
        yield (f, p, Multimodal.y4mByte(id, f, p))
      assert(d.ySum == bytes.collect { case (_, p, v) if p < w * h => v.toLong }.sum)
      assert(d.uvSum == bytes.collect { case (_, p, v) if p >= w * h => v.toLong }.sum)
      assert(d.y00Last == Multimodal.y4mByte(id, keptFrames.last, 0))
      if (stride == 1)
        assert(d == Multimodal.decodeY4m(Multimodal.buildY4m(id)),
          "default decode must be the stride-1 decode")
    }
  }

  test("Y4M decode rejects malformed payloads; decodeAny quarantines " +
      "them and routes valid Y4M by magic") {
    intercept[IllegalArgumentException] {
      Multimodal.decodeY4m("MPEG2 W4 H3\n".getBytes("US-ASCII"))
    }
    val ok = Multimodal.buildY4m(8L)
    intercept[IllegalArgumentException] { // truncated mid-frame
      Multimodal.decodeY4m(ok.take(ok.length - 2))
    }
    intercept[IllegalArgumentException] { // unsupported colorspace
      Multimodal.decodeY4m(
        "YUV4MPEG2 W2 H2 C420jpeg\nFRAME\nabcd".getBytes("US-ASCII"))
    }
    val d = Multimodal.decodeY4m(ok)
    assert(Multimodal.decodeAny(ok)
      == Multimodal.DecodedAny("y4m", ok = true, d.nFrames.toLong,
        d.ySum + d.uvSum))
    assert(Multimodal.decodeAny(ok.take(ok.length - 2))
      == Multimodal.DecodedAny("y4m", ok = false, 0L, 0L))
  }

  test("aHash: the one-byte brightness bump breaks byte-exact hashing " +
      "but not the perceptual hash — and the hash matches a direct " +
      "recomputation") {
    import spark.implicits._
    val ids = (0L until 200L).toDF("doc_id")
    val got = Multimodal.ahashBits(ids).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // independent recomputation from the generation formula
    def ref(id: Long): String = {
      val cls = id % 40
      val w = (cls % 13 + 4).toInt; val h = (cls % 11 + 4).toInt
      val g = (0 until 64).map { q =>
        val base = 3 * ((q / 8 * h / 8) * w + (q % 8) * w / 8)
        val v = (0 until 3).map { c =>
          val raw = ((cls * 31 + (base + c) * 7) % 256).toInt
          if (id % 5 == 1 && base + c == 0) (raw + 1) % 256 else raw
        }
        (v.sum / 3)
      }
      val mean = g.map(_.toLong).sum / 64
      g.map(x => if (x > mean) '1' else '0').mkString
    }
    (0L until 200L).foreach { id =>
      assert(got(id) == ref(id), s"ahash mismatch for id $id")
    }
    // perceptual property on this corpus: every noisy variant hashes
    // with its clean class, while the payload BYTES differ
    (0L until 200L).filter(_ % 5 == 1).foreach { id =>
      assert(got(id) == got(id % 40) || id == id % 40,
        s"noisy $id must cluster with class ${id % 40}")
    }
    // and the bumped payload really does differ byte-wise from its class
    val clean = Multimodal.buildPpm(1L)
    val noisy = clean.clone()
    val rasterOff = new String(clean, "ISO-8859-1").lastIndexOf("255\n") + 4
    noisy(rasterOff) = (((noisy(rasterOff) & 0xff) + 1) % 256).toByte
    assert(!java.util.Arrays.equals(clean, noisy),
      "a byte-exact fingerprint would split the bumped payload")
  }

  test("decodeImage dispatches on magic and rejects unknown formats") {
    assert(Multimodal.decodeImage(Multimodal.buildPpm(3L))
      == Multimodal.decodePpm(Multimodal.buildPpm(3L)))
    assert(Multimodal.decodeImage(Multimodal.buildBmp(3L))
      == Multimodal.decodeBmp(Multimodal.buildBmp(3L)))
    intercept[IllegalArgumentException] {
      Multimodal.decodeImage(Array[Byte](1, 2, 3))
    }
  }

  test("audio features: autocorrelation and zero crossings match an " +
      "independent recomputation, with both sign paths load-bearing") {
    val s2 = spark; import s2.implicits._
    // ids 40..100: the sample ladder (step 7 per frame, span < 483 of
    // the 4096 lattice) first straddles the zero boundary around id 60,
    // so this window covers all-negative, crossing, AND all-positive
    // channels
    val got = Multimodal.audioFeatureStats((40L until 100L).toDF("id"), 4)
      .collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("channel")) ->
        ((r.getAs[Long]("n_frames"), r.getAs[Long]("autocorr"),
          r.getAs[Long]("zero_cross")))).toMap
    (40L until 100L).foreach { id =>
      val nCh = (id % 2 + 1).toInt; val nF = (id % 50 + 20).toInt
      (0 until nCh).foreach { c =>
        val s = (0 until nF).map(f => Multimodal.wavSample(id, f, c).toInt)
        val ac = (0 until nF - 4).map(f => s(f).toLong * s(f + 4)).sum
        val zc = (1 until nF).count(f => (s(f) >= 0) != (s(f - 1) >= 0)).toLong
        assert(got((id, c.toLong)) == ((nF.toLong, ac, zc)),
          s"id $id ch $c: features diverged")
      }
    }
    // sign coverage is corpus-level: a channel's samples span < 4096/7
    // frames' worth of the lattice and can legitimately sit all-negative;
    // crossing channels (zc > 0) prove the sign handling is load-bearing.
    // (Total lag-4 autocorr is always positive here — the ladder is
    // smooth at lag 4 — so no both-signs claim is made for it.)
    assert(got.values.exists(_._3 > 0),
      "some channel must actually cross zero")
  }

  test("Y4M per-frame luma walk agrees with the full decode: frame " +
      "sums add up to the video's Y total, frame count matches") {
    (0L until 60L).foreach { id =>
      val full = Multimodal.decodeY4m(Multimodal.buildY4m(id))
      val (w, h, sums) = Multimodal.decodeY4mFrameYSums(Multimodal.buildY4m(id))
      assert(w == full.width && h == full.height)
      assert(sums.length == full.nFrames,
        s"id $id: ${sums.length} frame sums vs ${full.nFrames} frames")
      assert(sums.sum == full.ySum,
        s"id $id: per-frame luma must decompose the full decode's Y sum")
      // and an independent recomputation from the generation formula
      val expect = (0 until sums.length).map(f =>
        (0 until w * h).map(p =>
          Multimodal.y4mByte(id, f, p).toLong).sum)
      assert(sums.toSeq == expect, s"id $id: formula mismatch")
    }
  }

  test("patchify exact cover: patches tile the raster — per-image patch " +
      "sums equal the whole-image decode, widths/heights sum to w/h") {
    val s2 = spark; import s2.implicits._
    for (grid <- Seq(2, 3)) {
      val ids = (0L until 60L).toDF("doc_id")
      val patches = Multimodal.patchifyStats(ids, grid).collect()
        .groupBy(_.getAs[Long]("media_id"))
      (0L until 60L).foreach { id =>
        val d = Multimodal.decodePpm(Multimodal.buildPpm(id))
        val ps = patches(id)
        assert(ps.length == grid * grid, s"id $id: ${ps.length} patches")
        assert(ps.map(_.getAs[Long]("sum_r")).sum == d.sumR &&
          ps.map(_.getAs[Long]("sum_g")).sum == d.sumG &&
          ps.map(_.getAs[Long]("sum_b")).sum == d.sumB,
          s"id $id grid $grid: patch sums must cover the image exactly")
        // each grid row's widths sum to w; each column's heights to h
        ps.groupBy(_.getAs[Long]("py")).values.foreach(row =>
          assert(row.map(_.getAs[Long]("pw")).sum == d.width,
            s"id $id: row widths must sum to ${d.width}"))
        ps.groupBy(_.getAs[Long]("px")).values.foreach(colp =>
          assert(colp.map(_.getAs[Long]("ph")).sum == d.height,
            s"id $id: column heights must sum to ${d.height}"))
      }
    }
  }
}
