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
}
