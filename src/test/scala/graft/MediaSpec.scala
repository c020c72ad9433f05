package graft

import graft.multimodal.Media
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing (north star): schema, per-partition batch shape,
  * determinism of the stubbed codec, frame sampling, and the
  * features→ANN handoff.
  */
class MediaSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("corpus is deterministic and schema'd: binary payload + typed metadata") {
    val a = Media.corpus(spark, sf)
    val df = a.toDF()
    assert(df.schema("content").dataType.typeName == "binary")
    assert(df.schema("meta").dataType.typeName == "struct")
    val r1 = a.filter(_.media_id == 0L).head()
    val r2 = Media.corpus(spark, sf).filter(_.media_id == 0L).head()
    assert(r1.content.toSeq == r2.content.toSeq, "stub payloads must be deterministic")
    assert(Set("image", "audio", "video")(r1.meta.kind))
  }

  test("decode parses the dims that were encoded (header roundtrip)") {
    val feats = Media.extractImageFeatures(Media.corpus(spark, sf))
    val metas = Media.corpus(spark, sf).collect().map(r => r.media_id -> r.meta).toMap
    feats.collect().foreach { f =>
      assert(f.width == metas(f.media_id).width, s"media ${f.media_id} width")
      assert(f.height == metas(f.media_id).height)
      assert(f.embedding.length == 64)
      assert(!f.brightness.isNaN && f.brightness >= 0 && f.brightness <= 255)
    }
  }

  test("feature extraction preserves partitioning (narrow map, no shuffle)") {
    val media = Media.corpus(spark, sf).repartition(5)
    val feats = Media.extractImageFeatures(media)
    assert(feats.rdd.getNumPartitions == 5)
    val plan = feats.queryExecution.executedPlan.toString
    // exactly one Exchange: the explicit repartition(5) above — the
    // decode/extract stage itself must add none
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"decode stage must not add a shuffle:\n$plan")
  }

  test("resize rewrites image/video dims and passes audio through intact") {
    val before = Media.corpus(spark, sf).collect().map(r => r.media_id -> r).toMap
    val resized = Media.resize(Media.corpus(spark, sf), 32, 24)
    resized.collect().foreach { r =>
      if (r.meta.kind == "audio") {
        // pixel dims don't apply to audio: payload AND metadata unchanged,
        // and the record must still be a decodable WAV (the old behavior
        // re-encoded it as stub bytes while meta claimed format="wav",
        // so resized audio vanished from every isWav-filtered extractor)
        assert(Media.WavCodec.isWav(r.content), s"media ${r.media_id}")
        assert(r.content.sameElements(before(r.media_id).content))
        assert(r.meta == before(r.media_id).meta)
      } else {
        assert(r.meta.width == 32 && r.meta.height == 24)
        assert(Media.decodeDims(r.content) == ((32, 24)), s"media ${r.media_id}")
      }
    }
    // audio features survive a resize pass end to end
    val audioN = Media.extractAudioFeatures(resized).count()
    assert(audioN == before.values.count(_.meta.kind == "audio"),
      "resized audio records must still reach the audio extractor")
  }

  test("PPM codec decodes a crafted real image to exact known pixel statistics") {
    // 2x2 P6: red, green, blue, white — brightness is the mean of all
    // 12 pixel bytes: (255*3 + 255*3) / 12 = 127.5 exactly
    val rgb = Array[Int](
      255, 0, 0, 0, 255, 0,
      0, 0, 255, 255, 255, 255).map(_.toByte)
    val ppm = Media.PpmCodec.encode(2, 2, rgb)
    val rec = Seq(Media.MediaRecord(99L,
      Media.MediaMeta("image", "ppm", 2, 2, 0L, 0), ppm)).toDS()
    val f = Media.extractImageFeatures(rec).head()
    assert(f.width == 2 && f.height == 2)
    assert(f.brightness == 127.5, s"got ${f.brightness}")
    // pooled embedding: byte k of the payload lands in slot k%64 scaled
    // by 1/255 — slot 0 holds pixel byte 0 (red = 255) → 1.0
    assert(math.abs(f.embedding(0) - 1.0f) < 1e-6)
    // header roundtrip incl. comment handling
    val commented = ("P6\n# a comment\n2 2\n255\n".getBytes("US-ASCII") ++ rgb)
    val (w, h, px) = Media.PpmCodec.decode(commented)
    assert(w == 2 && h == 2 && px.toSeq == rgb.toSeq)
  }

  test("PPM nearest-neighbor resize keeps exact pixel values on a 2x upscale") {
    val rgb = Array[Int](10, 20, 30, 40, 50, 60).map(_.toByte) // 2x1
    val up = Media.resize(Seq(Media.MediaRecord(1L,
      Media.MediaMeta("image", "ppm", 2, 1, 0L, 0),
      Media.PpmCodec.encode(2, 1, rgb))).toDS(), 4, 1).head()
    val (w, _, px) = Media.PpmCodec.decode(up.content)
    assert(w == 4)
    // nearest-neighbor: each source pixel doubled
    assert(px.toSeq == Array[Int](10, 20, 30, 10, 20, 30, 40, 50, 60, 40, 50, 60)
      .map(_.toByte).toSeq)
  }

  test("BMP RLE8 codec round-trips crafted pixels exactly and genuinely compresses") {
    // 4x2 grayscale: two bands per row — encode must emit runs, decode
    // must rebuild the exact top-down pixels through the palette
    val gray = Array[Int](100, 100, 200, 200, 0, 0, 0, 255).map(_.toByte)
    val bmp = Media.BmpCodec.encode(4, 2, gray)
    assert(Media.BmpCodec.isBmp(bmp))
    assert(Media.BmpCodec.dims(bmp) == ((4, 2)))
    val (w, h, px) = Media.BmpCodec.decode(bmp)
    assert(w == 4 && h == 2 && px.toSeq == gray.toSeq)
    // brightness through the shared feature kernel: mean of the 8 pixels
    val rec = Seq(Media.MediaRecord(42L,
      Media.MediaMeta("image", "bmp", 4, 2, 0L, 0), bmp)).toDS()
    val f = Media.extractImageFeatures(rec).head()
    assert(f.width == 4 && f.height == 2)
    assert(f.brightness == (100 + 100 + 200 + 200 + 0 + 0 + 0 + 255) / 8.0,
      s"got ${f.brightness}")
    // the banded synthetic fixture must actually compress: RLE payload
    // well under one byte per pixel (noise would EXPAND to 2 bytes/px —
    // that's what makes this the variable-WORK codec case)
    val syn = Media.BmpCodec.synthetic(64, 48, seed = 7L)
    val headerAndPalette = 14 + 40 + 1024
    assert(syn.length - headerAndPalette < 64 * 48 / 2,
      s"banded fixture should RLE-compress, got ${syn.length - headerAndPalette} bytes for ${64 * 48} px")
    val (sw, sh, spx) = Media.BmpCodec.decode(syn)
    assert(sw == 64 && sh == 48 && spx.length == 64 * 48)
  }

  test("BMP RLE8 decode handles absolute mode, delta skips, and EOL/EOF escapes") {
    // hand-crafted opcode stream the run-only encoder never emits:
    // bottom row: absolute[10,20,30,40] + run 2x50; top row: run 3x60,
    // delta (+2,0) leaving palette-0 holes, run 1x70
    val header = Media.BmpCodec.encode(6, 2, new Array[Byte](12)).take(14 + 40 + 1024)
    val stream = Array[Int](
      0, 4, 10, 20, 30, 40, // absolute mode, 4 indices (even: no pad)
      2, 50,                // encoded run
      0, 0,                 // end of line
      3, 60,                // encoded run
      0, 2, 2, 0,           // delta: dx=2, dy=0
      1, 70,                // encoded run
      0, 1                  // end of bitmap
    ).map(_.toByte)
    val (w, h, px) = Media.BmpCodec.decode(header ++ stream)
    assert(w == 6 && h == 2)
    // top-down: first output row is the LAST-encoded (top) row
    assert(px.toSeq == Array[Int](
      60, 60, 60, 0, 0, 70,   // delta holes default to palette entry 0
      10, 20, 30, 40, 50, 50).map(_.toByte).toSeq)
  }

  test("BMP RLE8 decode fails loudly on corrupt opcode streams (no overrun, no overread)") {
    val header = Media.BmpCodec.encode(6, 2, new Array[Byte](12)).take(14 + 40 + 1024)
    def bad(stream: Int*): Array[Byte] = header ++ stream.map(_.toByte).toArray
    // run crossing the row end would write past the canvas row
    intercept[IllegalArgumentException](Media.BmpCodec.decode(bad(7, 5, 0, 1)))
    // truncated: stream ends without an end-of-bitmap escape
    intercept[IllegalArgumentException](Media.BmpCodec.decode(bad(2, 5)))
    // absolute mode declaring more indices than the stream carries
    intercept[IllegalArgumentException](Media.BmpCodec.decode(bad(0, 5, 1, 2)))
    // delta landing off-canvas
    intercept[IllegalArgumentException](Media.BmpCodec.decode(bad(0, 2, 9, 9, 0, 1)))
    // header dims are untrusted too: a negative width must throw, not
    // size a negative-length buffer
    val negW = (header ++ Array[Int](1, 5, 0, 1).map(_.toByte)).clone()
    negW(18) = 0xff.toByte; negW(19) = 0xff.toByte
    negW(20) = 0xff.toByte; negW(21) = 0xff.toByte
    intercept[IllegalArgumentException](Media.BmpCodec.decode(negW))
  }

  test("image column is heterogeneous: PPM and RLE8-BMP payloads both decode corpus-wide") {
    val images = Media.corpus(spark, sf).filter(_.meta.kind == "image").collect()
    val (bmps, ppms) = images.partition(r => Media.BmpCodec.isBmp(r.content))
    assert(bmps.nonEmpty && ppms.nonEmpty, "fixture must carry BOTH image formats")
    // metadata format tag matches the payload magic, dims match the header
    bmps.foreach { r =>
      assert(r.meta.format == "bmp")
      assert(Media.BmpCodec.dims(r.content) == ((r.meta.width, r.meta.height)))
    }
    ppms.foreach(r => assert(r.meta.format == "ppm" &&
      Media.PpmCodec.isPpm(r.content)))
    // and a BMP record resizes like any image: dims change, payload
    // stays a decodable RLE8 BMP
    val one = Seq(bmps.head).toSeq.toDS()
    val rz = Media.resize(one, 16, 12).head()
    assert(Media.BmpCodec.isBmp(rz.content))
    assert(Media.BmpCodec.dims(rz.content) == ((16, 12)))
    assert(rz.meta.width == 16 && rz.meta.height == 12)
  }

  test("WAV decode fails loudly on corrupt declared chunk sizes (no hang, no overread)") {
    // declared sizes are untrusted: a u32 size read into Int can be
    // negative (stalling the walk — i stops advancing) or overshoot the
    // payload (reading past the array). Both must throw, not spin/crash.
    val good = Media.WavCodec.synthetic(16000, 16, seed = 1L)
    def withFmtSize(v: Int): Array[Byte] = {
      val b = good.clone() // "fmt " id at 12..15, its size field at 16..19
      b(16) = v.toByte; b(17) = (v >> 8).toByte
      b(18) = (v >> 16).toByte; b(19) = (v >> 24).toByte
      b
    }
    intercept[IllegalArgumentException](Media.WavCodec.decode(withFmtSize(-8)))
    intercept[IllegalArgumentException](Media.WavCodec.decode(withFmtSize(Int.MaxValue - 7)))
    intercept[IllegalArgumentException](Media.WavCodec.fmtInfo(withFmtSize(-8)))
    // and the fmt-only probe agrees with the full decode on good input
    val (rate, ch, _) = Media.WavCodec.decode(good)
    assert(Media.WavCodec.fmtInfo(good) == ((rate, ch)))
  }

  test("WAV codec decodes a crafted clip to exact samples, skipping unknown chunks") {
    // 4 known samples; an odd-sized LIST chunk sits between fmt and data,
    // so decode must walk chunks by declared size (+ pad byte), not assume
    // a fixed header stride
    val samples = Array[Short](0, 16384, -16384, -32768)
    val wav = Media.WavCodec.encode(8000, samples,
      extraChunk = Some("INFOxyz".getBytes("US-ASCII"))) // 7 bytes: odd → padded
    assert(Media.WavCodec.isWav(wav))
    val (rate, ch, got) = Media.WavCodec.decode(wav)
    assert(rate == 8000 && ch == 1)
    assert(got.toSeq == samples.toSeq, "PCM samples must round-trip exactly")
    // RMS of (0, ±0.5, -1.0): sqrt((0 + .25 + .25 + 1)/4) = sqrt(0.375)
    val rec = Seq(Media.MediaRecord(7L,
      Media.MediaMeta("audio", "wav", 1, 16, 0L, 8000), wav)).toDS()
    val f = Media.extractAudioFeatures(rec).head()
    assert(f.n_samples == 4 && f.sample_rate == 8000 && f.channels == 1)
    assert(math.abs(f.rms - math.sqrt(0.375)) < 1e-9, s"got ${f.rms}")
  }

  test("corpus audio records are real RIFF/WAVE payloads with consistent metadata") {
    val audio = Media.corpus(spark, sf).filter(_.meta.kind == "audio").collect()
    assert(audio.nonEmpty)
    audio.foreach { r =>
      assert(Media.WavCodec.isWav(r.content), s"media ${r.media_id} must be WAV")
      val (rate, ch, samples) = Media.WavCodec.decode(r.content)
      assert(rate == r.meta.sampleRate && ch == 1)
      assert(r.meta.durationMs == samples.length.toLong * 1000 / rate,
        s"media ${r.media_id} duration metadata must match the payload")
    }
  }

  test("q_media_audio decodes every audio record (both real formats covered)") {
    val out = SparkEntry.queries("q_media_audio")(spark, sf).collect()
    val audioN = Media.corpus(spark, sf).filter(_.meta.kind == "audio").count()
    assert(out.length.toLong == audioN && audioN > 0)
    out.foreach { r =>
      assert(r.getInt(1) == 16000)                  // sample_rate from fmt chunk
      assert(r.getInt(2) >= 800)                    // n_samples
      assert(r.getDouble(4) > 0 && r.getDouble(4) < 1) // rms of random PCM
    }
    // and the image path still covers PPM: q_media_features dims ==
    // (channels, bits) for audio rows, pixel dims for image rows
    val feats = SparkEntry.queries("q_media_features")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    Media.corpus(spark, sf).collect().foreach { r =>
      if (r.meta.kind == "audio")
        assert(feats(r.media_id) == ((1, 16)), s"audio ${r.media_id}")
      else if (r.meta.kind == "image")
        assert(feats(r.media_id) == ((r.meta.width, r.meta.height)))
    }
  }

  test("AVI codec round-trips crafted frames exactly (BGR/bottom-up/stride handled)") {
    // 2x2, 3 frames of known RGB — w*3 = 6 bytes/row forces a 2-byte DIB
    // stride pad, so the pad/flip/channel-swap paths all run
    val frames = (0 until 3).map(f => Array[Int](
      10 + f, 20, 30, 40, 50, 60,
      70, 80, 90, 100, 110, 120 + f).map(_.toByte).toArray)
    val avi = Media.AviCodec.encode(2, 2, usPerFrame = 33000, frames)
    assert(Media.AviCodec.isAvi(avi))
    assert(Media.AviCodec.header(avi) == ((2, 2, 3, 33000)))
    val (w, h, usPf, back) = Media.AviCodec.decode(avi)
    assert(w == 2 && h == 2 && usPf == 33000)
    assert(back.length == 3)
    back.zip(frames).foreach { case (b, f) =>
      assert(b.toSeq == f.toSeq, "frame pixels must round-trip exactly")
    }
  }

  test("JPEG codec: flat images round-trip EXACTLY; gradients within the quantizer bound") {
    // constant blocks have AC = 0 and a DC quantizer of 8 → spatial
    // error < 0.5 rounds away: byte-exact despite lossy coding
    // big enough that the ~330 bytes of emitted tables (DQT + the two
    // DHT tables the decoder builds from) amortize away
    val flat = Array.fill(64 * 48)(77.toByte)
    val jpg = Media.JpegCodec.encode(64, 48, flat)
    assert(Media.JpegCodec.isJpeg(jpg))
    assert(jpg.length < flat.length / 4,
      s"flat image must compress: ${jpg.length} vs ${flat.length}")
    val (w, h, back) = Media.JpegCodec.decode(jpg)
    assert(w == 64 && h == 48)
    assert(back.toSeq == flat.toSeq, "flat image must round-trip exactly")
    // smooth gradient (incl. non-multiple-of-8 dims → edge-replicated
    // partial blocks): deterministic, bounded loss
    val grad = Array.tabulate(21 * 13)(i => ((i % 21) * 5 + (i / 21) * 3 + 40).toByte)
    val gj = Media.JpegCodec.encode(21, 13, grad)
    val (gw, gh, gback) = Media.JpegCodec.decode(gj)
    assert(gw == 21 && gh == 13)
    val maxErr = grad.indices.map(i => math.abs((grad(i) & 0xff) - (gback(i) & 0xff))).max
    assert(maxErr <= 8, s"gradient max error $maxErr exceeds the quantizer bound")
    assert(Media.JpegCodec.encode(21, 13, grad).toSeq == gj.toSeq,
      "encoding must be deterministic")
  }

  test("JPEG decode fails loudly on truncated or corrupt streams") {
    val jpg = Media.JpegCodec.synthetic(16, 16, seed = 5L)
    intercept[IllegalArgumentException](
      Media.JpegCodec.decode(jpg.take(20))) // truncated before SOS
    val notJpeg = Array[Byte](1, 2, 3)
    intercept[IllegalArgumentException](Media.JpegCodec.decode(notJpeg))
    // segment length lying past the payload
    val corrupt = jpg.clone()
    corrupt(4) = 0x7f.toByte // APP0 declared length huge
    intercept[IllegalArgumentException](Media.JpegCodec.decode(corrupt))
  }

  test("MJPEG AVI: 00dc JPEG frames decode through the shared container walk") {
    // crafted grayscale frames: frame f is constant (60 + 10f) — flat
    // blocks are exact through JPEG, so the decoded RGB is EXACTLY the
    // replicated gray value (the 'exact statistics on a crafted MJPEG
    // fixture' check)
    val frames = (0 until 3).map(f => Array.fill(8 * 8)((60 + 10 * f).toByte))
    val avi = Media.AviCodec.encodeMjpeg(8, 8, usPerFrame = 40000, frames)
    assert(Media.AviCodec.isAvi(avi))
    assert(Media.AviCodec.header(avi) == ((8, 8, 3, 40000)))
    val (w, h, usPf, back) = Media.AviCodec.decode(avi)
    assert(w == 8 && h == 8 && usPf == 40000 && back.length == 3)
    back.zipWithIndex.foreach { case (rgb, f) =>
      val want = (60 + 10 * f).toByte
      assert(rgb.forall(_ == want), s"frame $f must decode to constant $want in all channels")
    }
    // a DIB clip and an MJPEG clip of the same size: the MJPEG one is
    // smaller (the frames are genuinely compressed)
    val dib = Media.AviCodec.synthetic(32, 24, nFrames = 4, seed = 9L)
    val mjpg = Media.AviCodec.syntheticMjpeg(32, 24, nFrames = 4, seed = 9L)
    assert(mjpg.length < dib.length,
      s"MJPEG must beat uncompressed DIB: ${mjpg.length} vs ${dib.length}")
    // stream-kind probe + resize consistency: resizing an MJPEG record
    // must re-encode MJPEG (meta.format and payload stay in agreement —
    // the audio-resize lesson), a DIB record must stay DIB
    assert(Media.AviCodec.isMjpeg(mjpg) && !Media.AviCodec.isMjpeg(dib))
    import spark.implicits._
    val recs = Seq(
      Media.MediaRecord(1L,
        Media.MediaMeta("video", "mjpeg", 32, 24, 160, 16000), mjpg),
      Media.MediaRecord(2L,
        Media.MediaMeta("video", "avi", 32, 24, 160, 16000), dib)).toDS()
    val resized = Media.resize(recs, 16, 12).collect().map(r => r.media_id -> r).toMap
    assert(Media.AviCodec.isMjpeg(resized(1L).content),
      "resized MJPEG clip must still carry 00dc JPEG frames")
    assert(!Media.AviCodec.isMjpeg(resized(2L).content),
      "resized DIB clip must stay uncompressed")
    val (rw, rh, _, rframes) = Media.AviCodec.decode(resized(1L).content)
    assert(rw == 16 && rh == 12 && rframes.length == 4)
  }

  test("corpus video is heterogeneous: DIB and MJPEG clips both decode with frames intact") {
    val vids = Media.corpus(spark, sf).filter(_.meta.kind == "video").collect()
    val fmts = vids.map(_.meta.format).toSet
    assert(fmts == Set("avi", "mjpeg"), s"expected both video formats, got $fmts")
    vids.take(8).foreach { r =>
      val (w, h, _, frames) = Media.AviCodec.decode(r.content)
      assert(w == r.meta.width && h == r.meta.height)
      assert(frames.length == 6 && frames.forall(_.length == w * h * 3),
        s"media ${r.media_id} (${r.meta.format}) frames must decode fully")
    }
  }

  test("AVI decode fails loudly on corrupt chunk sizes and frame-count lies") {
    val good = Media.AviCodec.synthetic(4, 4, nFrames = 2, seed = 3L)
    // declared chunk size past the payload
    val overLong = good.clone()
    overLong(16) = 0xff.toByte; overLong(17) = 0xff.toByte // hdrl LIST size field
    intercept[IllegalArgumentException](Media.AviCodec.decode(overLong))
    // avih frame count disagreeing with the movi chunks it promises
    val lying = good.clone()
    // avih payload starts after RIFF(12) + LIST hdr(8) + 'hdrl'(4) + avih hdr(8);
    // totalFrames is u32 at payload offset 16
    lying(12 + 8 + 4 + 8 + 16) = 5.toByte
    intercept[IllegalArgumentException](Media.AviCodec.decode(lying))
    // truncation mid-stream
    intercept[IllegalArgumentException](
      Media.AviCodec.decode(good.take(good.length - 10)))
  }

  test("sampled video frames are real decodable images that reach the feature extractor") {
    val vids = Media.corpus(spark, sf).filter(_.meta.kind == "video")
    val frames = Media.sampleFrames(vids, 4).collect()
    assert(frames.nonEmpty)
    val metas = vids.collect().map(r => r.media_id -> r.meta).toMap
    frames.foreach { f =>
      // each sampled frame is a standalone PPM with the clip's dims and a
      // true frame-period timestamp (25 fps → multiples of 40 ms)
      assert(Media.PpmCodec.isPpm(f.content), s"frame ${f.media_id}/${f.frame_no}")
      val (fw, fh, _) = Media.PpmCodec.decode(f.content)
      assert(fw == metas(f.media_id).width && fh == metas(f.media_id).height)
      assert(f.offsetMs % 40 == 0, s"offset ${f.offsetMs} not on the frame grid")
    }
    // video → frames → image features: the multimodal handoff end to end
    val asRecords = frames.toSeq.map(f => Media.MediaRecord(
      f.media_id * 100 + f.frame_no,
      Media.MediaMeta("image", "ppm", 0, 0, 0L, 0), f.content)).toDS()
    val feats = Media.extractImageFeatures(asRecords).collect()
    assert(feats.length == frames.length)
    assert(feats.forall(f => f.brightness > 0 && f.brightness <= 255))
  }

  test("resize preserves AVI frame count and period while resampling every frame") {
    val one = Media.corpus(spark, sf)
      .filter(r => r.meta.kind == "video").limit(1)
    val before = one.head()
    val (_, _, usPf0, frames0) = Media.AviCodec.decode(before.content)
    val rz = Media.resize(one, 8, 6).head()
    assert(Media.AviCodec.isAvi(rz.content))
    val (w, h, usPf, frames) = Media.AviCodec.decode(rz.content)
    assert(w == 8 && h == 6)
    assert(usPf == usPf0 && frames.length == frames0.length,
      "resample must not change frame count or period")
    assert(rz.meta.width == 8 && rz.meta.height == 6)
  }

  test("frame sampling emits n frames per video with monotonic offsets") {
    val frames = Media.sampleFrames(Media.corpus(spark, sf), 4)
    val byId = frames.collect().groupBy(_.media_id)
    assert(byId.nonEmpty)
    byId.foreach { case (_, fs) =>
      assert(fs.length == 4)
      assert(fs.sortBy(_.frame_no).map(_.offsetMs).toSeq ==
        fs.map(_.offsetMs).sorted.toSeq)
    }
    val vids = Media.corpus(spark, sf).filter(_.meta.kind == "video").count()
    assert(byId.size.toLong == vids)
  }

  test("content dedup groups identical payloads only") {
    val d = Media.dedupByContent(Media.corpus(spark, sf))
    // payloads are seeded per media_id → all distinct in the fixture
    assert(d.filter(col("n_dups") > 1).count() == 0)
    assert(d.count() == Media.corpus(spark, sf).count())
  }

  test("media features flow into the ANN operator (q_media_sim)") {
    val out = SparkEntry.queries("q_media_sim")(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => !r.getDouble(3).isNaN))
  }

  test("perceptual hash is brightness-invariant and content-sensitive") {
    // base PPM with pixel values bounded so a +10 shift never clips
    val w = 32; val h = 24
    val rnd = new scala.util.Random(7)
    val rgb = Array.fill(w * h * 3)((20 + rnd.nextInt(200)).toByte)
    val shifted = rgb.map(b => (b + 10).toByte)
    val base = Media.PpmCodec.encode(w, h, rgb)
    val bright = Media.PpmCodec.encode(w, h, shifted)
    def hash(p: Array[Byte]): Long = {
      val Some((pw, ph, g)) = Media.grayscaleOf(p)
      Media.aHash64(pw, ph, g)
    }
    assert(hash(base) == hash(bright),
      "constant brightness shift must not change the aHash")
    // a different random image almost surely lands far away
    val other = Media.PpmCodec.synthetic(w, h, seed = 99L)
    assert(java.lang.Long.bitCount(hash(base) ^ hash(other)) > 10)
    // sha2-exact dedup CANNOT see the brightness pair (distinct bytes)
    assert(!java.util.Arrays.equals(base, bright))
  }

  test("phash banded join finds exactly the brute-force radius-3 pairs (pigeonhole recall)") {
    // planted corpus: 2000/2001 brightness pair (hamming 0), 2002/2003
    // pixel-perturbed pair (small hamming), plus honest-distinct noise
    val w = 32; val h = 24
    val rnd = new scala.util.Random(11)
    val rgb = Array.fill(w * h * 3)((20 + rnd.nextInt(200)).toByte)
    val perturbed = rgb.clone()
    var i = 0
    while (i < 30) { perturbed(rnd.nextInt(w * h * 3)) = rnd.nextInt(256).toByte; i += 1 }
    val planted = Seq(
      Media.MediaRecord(2000L, Media.MediaMeta("image", "ppm", w, h, 0L, 0),
        Media.PpmCodec.encode(w, h, rgb)),
      Media.MediaRecord(2001L, Media.MediaMeta("image", "ppm", w, h, 0L, 0),
        Media.PpmCodec.encode(w, h, rgb.map(b => (b + 10).toByte))),
      Media.MediaRecord(2002L, Media.MediaMeta("image", "ppm", w, h, 0L, 0),
        Media.PpmCodec.encode(w, h, rgb.map(b => (b + 5).toByte))),
      Media.MediaRecord(2003L, Media.MediaMeta("image", "ppm", w, h, 0L, 0),
        Media.PpmCodec.encode(w, h, perturbed)))
    val corpus = Media.corpus(spark, sf).union(spark.createDataset(planted))
    val hashes = Media.perceptualHashes(corpus)
    val got = Media.phashNearDupPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force ground truth over all hash pairs
    val hs = hashes.collect().map(r => r.getLong(0) -> r.getLong(3))
    val brute = (for {
      (a, ha) <- hs; (b, hb) <- hs
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    assert(got == brute, s"banded=${got.size} brute=${brute.size}")
    // the planted brightness triple must be in there; 2003 only if its
    // perturbation stayed within radius 3 (either way brute agrees)
    assert(got.contains((2000L, 2001L)) && got.contains((2000L, 2002L)))
  }

  test("q_media_phash covers every visual record incl. video keyframes, never audio") {
    val rows = SparkEntry.queries("q_media_phash")(spark, sf).collect()
    val kinds = Media.corpus(spark, sf).collect().map(r => r.media_id -> r.meta.kind).toMap
    val ids = rows.map(_.getLong(0)).toSet
    assert(ids == kinds.filter(_._2 != "audio").keySet)
    assert(rows.forall(_.getString(3).length == 16), "16 hex chars")
  }

  test("scene detection: a planted hard cut is found with the exact delta; gradual motion is not a cut") {
    import spark.implicits._
    val w = 16; val h = 12
    // 4 frames: three identical mid-gray, then a hard cut to white
    val gray = Array.fill(w * h * 3)(100.toByte)
    val white = Array.fill(w * h * 3)(228.toByte)
    val cutClip = Media.AviCodec.encode(w, h, 40000, Seq(gray, gray, gray, white))
    val planted = Seq(
      Media.MediaRecord(5000L, Media.MediaMeta("video", "avi", w, h, 160L, 0), cutClip))
    val out = Media.sceneStats(spark.createDataset(planted)).collect().head
    assert(out.getInt(1) == 4)
    assert(out.getInt(2) == 1, s"exactly the planted cut: $out")
    assert(math.abs(out.getDouble(3) - 128.0) < 1e-9, s"delta 228-100: $out")
    // fixture clips: gradual two-band gradient motion, never a cut
    val fixture = Media.sceneStats(Media.corpus(spark, sf)).collect()
    assert(fixture.nonEmpty && fixture.forall(_.getInt(2) == 0),
      "gradual synthetic motion must not read as shot cuts")
    assert(fixture.exists(_.getDouble(3) > 0), "motion is visible as nonzero delta")
  }

  test("vad: a half-silence half-tone clip splits into the exact active windows") {
    import spark.implicits._
    val rate = 16000; val win = 320
    // 10 windows silence, 10 windows loud square wave
    val silence = Array.fill(10 * win)(0.toShort)
    val tone = Array.tabulate(10 * win)(i => (if (i % 2 == 0) 8000 else -8000).toShort)
    val clip = Media.WavCodec.encode(rate, silence ++ tone)
    val rec = Seq(Media.MediaRecord(6000L,
      Media.MediaMeta("audio", "wav", 1, 16, 400L, rate), clip))
    val out = Media.vadStats(spark.createDataset(rec)).collect().head
    assert(out.getInt(1) == 20 && out.getInt(2) == 10, s"window split: $out")
    assert(math.abs(out.getDouble(3) - 0.5) < 1e-9)
    // every fixture clip is a deterministic nonzero waveform: all decode
    val fixture = Media.vadStats(Media.corpus(spark, sf)).collect()
    assert(fixture.nonEmpty && fixture.forall(_.getInt(1) > 0))
  }
}
