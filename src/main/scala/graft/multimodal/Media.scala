package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north star): image/audio/video as opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches.
  *
  * IMAGES and AUDIO are real: the fixture's image column is
  * deliberately HETEROGENEOUS — alternating records carry binary PPM
  * (P6) and RLE8-compressed BMP — and every audio record is RIFF/WAVE
  * 16-bit PCM; [[PpmCodec]], [[BmpCodec]] and [[WavCodec]] are
  * complete, dependency-free parsers — dimensions, pixel statistics,
  * PCM samples, and the pooled embeddings are computed from actual
  * decoded bytes (MediaSpec asserts known statistics on crafted
  * fixtures of all three). VIDEO is real too as of round 9: RIFF/AVI
  * containers with uncompressed 24-bit DIB frames ([[AviCodec]]) —
  * frame sampling decodes true frames and re-emits them as standalone
  * PPM images that flow into the image feature extractor. COMPRESSED
  * video is real as of round 10: the video column alternates
  * uncompressed-DIB AVI with MJPEG AVI whose `00dc` chunks each carry a
  * baseline JPEG ([[JpegCodec]] — 8×8 DCT + quantization + canonical
  * Huffman entropy coding, tables read from the stream's own DHT). The
  * codecs cover the cost spectrum: PPM/DIB are fixed-stride, WAV and
  * AVI are variable-length chunk walks by declared (untrusted, guarded)
  * sizes, BMP RLE8 is run-length compressed, and JPEG/MJPEG is
  * transform-coded (content-dependent entropy decode per block).
  * Inter-frame-predicted codecs (H.26x motion compensation) remain the
  * external-library boundary; swapping the frame payload format changes
  * no plan shape (`FakeCodec` stays only as the unknown-container
  * fallback). Everything around the codecs — the schema,
  * the `Dataset[MediaRecord]` encoder surface, the per-partition batch
  * processing (`mapPartitions`, the Scala analogue of Python's
  * `mapInPandas` batch shape), partitioning, and the handoff of
  * extracted features into the similarity/ANN operators — is real and
  * tested.
  *
  * 100 TB design: media blobs stay columnar in parquet; decode/resize/
  * feature-extract are narrow map stages (no shuffle); only the
  * downstream analytics (dedup by content hash, ANN) shuffle, and they
  * shuffle the small derived columns — never the blobs.
  */
object Media {

  /** Typed metadata carried next to the opaque payload. */
  final case class MediaMeta(
      kind: String,          // image | audio | video
      format: String,        // fake container tag
      width: Int, height: Int,
      durationMs: Long, sampleRate: Int)

  final case class MediaRecord(media_id: Long, meta: MediaMeta, content: Array[Byte])

  final case class ImageFeatures(media_id: Long, width: Int, height: Int,
      brightness: Double, embedding: Array[Float])

  final case class AudioFeatures(media_id: Long, sample_rate: Int, channels: Int,
      n_samples: Int, duration_ms: Long, rms: Double, embedding: Array[Float])

  final case class Frame(media_id: Long, frame_no: Int, offsetMs: Long,
      content: Array[Byte])

  /** ----- REAL codec: binary PPM (P6) -----
    * The netpbm P6 format: ASCII header `P6\n<w> <h>\n<maxval>\n`
    * (with `#` comments allowed between tokens), then w·h RGB triplets
    * of raw bytes. Complete parser + encoder, no dependencies.
    */
  object PpmCodec {
    def encode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == w * h * 3, s"P6 payload must be w*h*3 bytes, got ${rgb.length}")
      s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ rgb
    }

    def isPpm(content: Array[Byte]): Boolean =
      content.length >= 2 && content(0) == 'P'.toByte && content(1) == '6'.toByte

    /** (width, height, pixel bytes) of a P6 image (8-bit maxval). */
    def decode(content: Array[Byte]): (Int, Int, Array[Byte]) = {
      var i = 2
      def skipWs(): Unit = {
        var done = false
        while (!done && i < content.length) {
          if (content(i) == '#'.toByte) {
            while (i < content.length && content(i) != '\n'.toByte) i += 1
          } else if (content(i).toChar.isWhitespace) i += 1
          else done = true
        }
      }
      def int(): Int = {
        skipWs()
        var v = 0
        while (i < content.length && content(i).toChar.isDigit) {
          v = v * 10 + (content(i) - '0'.toByte); i += 1
        }
        v
      }
      val w = int(); val h = int(); val maxv = int()
      require(maxv == 255, s"only 8-bit PPM supported, maxval=$maxv")
      i += 1 // exactly one whitespace byte separates maxval from pixels
      val px = content.slice(i, i + w * h * 3)
      require(px.length == w * h * 3, s"truncated P6: ${px.length} of ${w * h * 3} bytes")
      (w, h, px)
    }

    /** Deterministic synthetic image for the fixture corpus. */
    def synthetic(w: Int, h: Int, seed: Long): Array[Byte] = {
      val rnd = new scala.util.Random(seed)
      encode(w, h, Array.fill(w * h * 3)(rnd.nextInt(256).toByte))
    }
  }

  /** ----- REAL codec 2: RIFF/WAVE 16-bit PCM -----
    * Unlike PPM's fixed-stride layout this is a variable-length CHUNKED
    * container: `RIFF <size> WAVE`, then a chunk walk — `fmt ` (PCM tag
    * 1, channels, sample rate, bits) and `data` (little-endian 16-bit
    * samples), with unknown chunks (`LIST`, …) skipped by their declared
    * size including the odd-size pad byte the RIFF spec requires.
    * Complete parser + encoder, no dependencies; the synthetic fixture
    * embeds a LIST chunk so the skip path runs corpus-wide.
    */
  object WavCodec {
    private def le32(v: Int): Array[Byte] =
      Array(v, v >> 8, v >> 16, v >> 24).map(_.toByte)
    private def le16(v: Int): Array[Byte] = Array(v, v >> 8).map(_.toByte)

    def encode(sampleRate: Int, samples: Array[Short], channels: Int = 1,
        extraChunk: Option[Array[Byte]] = None): Array[Byte] = {
      val data = dataBytes(samples)
      val blockAlign = channels * 2
      val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++
        le16(channels) ++ le32(sampleRate) ++ le32(sampleRate * blockAlign) ++
        le16(blockAlign) ++ le16(16)
      val extra = extraChunk.map { b =>
        "LIST".getBytes("US-ASCII") ++ le32(b.length) ++ b ++
          (if (b.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
      }.getOrElse(Array.empty[Byte])
      val body = "WAVE".getBytes("US-ASCII") ++ fmt ++ extra ++
        "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
      "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    }

    def isWav(content: Array[Byte]): Boolean =
      content.length >= 12 &&
        content.slice(0, 4).sameElements("RIFF".getBytes("US-ASCII")) &&
        content.slice(8, 12).sameElements("WAVE".getBytes("US-ASCII"))

    /** (sampleRate, channels, samples) — chunk walk, 16-bit PCM only. */
    def decode(content: Array[Byte]): (Int, Int, Array[Short]) = {
      require(isWav(content), "not a RIFF/WAVE payload")
      def u16(i: Int): Int = (content(i) & 0xff) | ((content(i + 1) & 0xff) << 8)
      def u32(i: Int): Int = u16(i) | (u16(i + 2) << 16)
      var i = 12
      var rate = -1; var ch = -1
      var samples: Array[Short] = null
      while (i + 8 <= content.length) {
        val id = new String(content, i, 4, "US-ASCII")
        val sz = u32(i + 4)
        val at = i + 8
        // declared sizes are untrusted input: a negative size (u32 read
        // into Int) would stall the walk forever (i stops advancing) and
        // an oversized one would read past the payload — fail loudly
        require(sz >= 0 && at.toLong + sz <= content.length, // Long: at+sz must not wrap
          s"corrupt RIFF chunk '$id': declared $sz bytes at $at of ${content.length}")
        id match {
          case "fmt " =>
            require(u16(at) == 1, s"PCM only, format tag ${u16(at)}")
            ch = u16(at + 2); rate = u32(at + 4)
            require(u16(at + 14) == 16, s"16-bit PCM only, got ${u16(at + 14)}")
          case "data" =>
            samples = new Array[Short](sz / 2)
            var k = 0
            while (k < samples.length) {
              samples(k) = ((content(at + 2 * k) & 0xff) |
                (content(at + 2 * k + 1) << 8)).toShort
              k += 1
            }
          case _ => () // LIST/fact/…: skipped by declared size below
        }
        i = at + sz + (sz & 1) // chunks are word-aligned: odd sizes pad 1 byte
      }
      require(rate > 0 && samples != null, "missing fmt /data chunk")
      (rate, ch, samples)
    }

    /** (sampleRate, channels) from the fmt chunk ALONE — the header-only
      * probe for dims/metadata paths, which previously paid a full PCM
      * decode (materializing every sample) just to read two u16s that
      * live in the 16-byte fmt chunk.
      */
    def fmtInfo(content: Array[Byte]): (Int, Int) = {
      require(isWav(content), "not a RIFF/WAVE payload")
      def u16(i: Int): Int = (content(i) & 0xff) | ((content(i + 1) & 0xff) << 8)
      def u32(i: Int): Int = u16(i) | (u16(i + 2) << 16)
      var i = 12
      while (i + 8 <= content.length) {
        val id = new String(content, i, 4, "US-ASCII")
        val sz = u32(i + 4)
        val at = i + 8
        require(sz >= 0 && at.toLong + sz <= content.length,
          s"corrupt RIFF chunk '$id': declared $sz bytes at $at of ${content.length}")
        if (id == "fmt ") return (u32(at + 4), u16(at + 2))
        i = at + sz + (sz & 1)
      }
      throw new IllegalArgumentException("missing fmt chunk")
    }

    /** Deterministic synthetic clip for the fixture corpus — always
      * carries a LIST metadata chunk (odd-sized, so the pad-byte path is
      * exercised on every record).
      */
    def synthetic(sampleRate: Int, n: Int, seed: Long): Array[Byte] = {
      val rnd = new scala.util.Random(seed)
      encode(sampleRate, Array.fill(n)((rnd.nextInt(65536) - 32768).toShort),
        channels = 1, extraChunk = Some(s"INFOgraft".getBytes("US-ASCII")))
    }

    /** The raw little-endian PCM byte stream (the decoded payload the
      * shared byte-pooling feature kernel consumes).
      */
    def dataBytes(samples: Array[Short]): Array[Byte] = {
      val out = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        out(2 * i) = samples(i).toByte
        out(2 * i + 1) = (samples(i) >> 8).toByte
        i += 1
      }
      out
    }
  }

  /** ----- REAL codec 3: BMP 8-bit RLE (BI_RLE8) -----
    * The genuinely COMPRESSED case: where PPM is fixed-stride and WAV is
    * variable-length-but-uncompressed, RLE8 pixel data is an opcode
    * stream whose length depends on image content — encoded runs
    * `(count, index)`, escape `0x00` + {0x00 end-of-line, 0x01
    * end-of-bitmap, 0x02 delta (dx, dy), n≥3 absolute mode: n raw
    * indices padded to a word boundary}. 8-bit indexed pixels through a
    * 256-entry grayscale palette, rows stored bottom-up per the format.
    * Complete parser + encoder, no dependencies; decode output is
    * top-down grayscale bytes.
    */
  object BmpCodec {
    private val DataOffset = 14 + 40 + 256 * 4 // file hdr + info hdr + palette

    private def le32(v: Int): Array[Byte] =
      Array(v, v >> 8, v >> 16, v >> 24).map(_.toByte)
    private def le16(v: Int): Array[Byte] = Array(v, v >> 8).map(_.toByte)

    def isBmp(content: Array[Byte]): Boolean =
      content.length >= 2 && content(0) == 'B'.toByte && content(1) == 'M'.toByte

    /** Run-length encode a grayscale image (top-down `w*h` bytes in,
      * bottom-up RLE8 rows out): maximal ≤255-pixel runs, end-of-line
      * after every row, end-of-bitmap for the last. Banded content
      * compresses; noise expands (2 bytes/pixel) — both are valid RLE8.
      */
    def encode(w: Int, h: Int, gray: Array[Byte]): Array[Byte] = {
      require(gray.length == w * h, s"RLE8 payload must be w*h bytes, got ${gray.length}")
      val rle = scala.collection.mutable.ArrayBuffer[Byte]()
      var y = h - 1
      while (y >= 0) { // bottom-up row order
        var x = 0
        while (x < w) {
          var run = 1
          while (x + run < w && gray(y * w + x + run) == gray(y * w + x) && run < 255) run += 1
          rle += run.toByte += gray(y * w + x)
          x += run
        }
        rle += 0.toByte += (if (y == 0) 1 else 0).toByte // EOL, EOF on last row
        y -= 1
      }
      val palette = Array.tabulate(256 * 4) { i =>
        if (i % 4 == 3) 0.toByte else (i / 4).toByte // (B,G,R,0) = gray
      }
      "BM".getBytes("US-ASCII") ++ le32(DataOffset + rle.length) ++ le16(0) ++
        le16(0) ++ le32(DataOffset) ++
        le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(8) ++ le32(1) ++
        le32(rle.length) ++ le32(2835) ++ le32(2835) ++ le32(256) ++ le32(0) ++
        palette ++ rle.toArray
    }

    /** (width, height) from the info header ALONE — no pixel decode. */
    def dims(content: Array[Byte]): (Int, Int) = {
      require(isBmp(content) && content.length >= 54, "not a BMP payload")
      def i32(i: Int): Int = (content(i) & 0xff) | ((content(i + 1) & 0xff) << 8) |
        ((content(i + 2) & 0xff) << 16) | (content(i + 3) << 24)
      val (w, h) = (i32(18), i32(22))
      require(w > 0 && h > 0 && w.toLong * h <= (1L << 28),
        s"unsupported BMP dims ${w}x$h") // h<0 (top-down variant) excluded
      (w, h)
    }

    /** (width, height, top-down grayscale bytes). Every opcode is
      * untrusted input: runs/absolute segments must not cross the row
      * end, deltas must stay on the canvas, reads must not pass the
      * payload — each violation throws (same contract as the WAV walk).
      */
    def decode(content: Array[Byte]): (Int, Int, Array[Byte]) = {
      val (w, h) = dims(content)
      def u16(i: Int): Int = (content(i) & 0xff) | ((content(i + 1) & 0xff) << 8)
      def u32(i: Int): Int = u16(i) | (u16(i + 2) << 16)
      require(u16(26) == 1 && u16(28) == 8, s"8-bit single-plane only")
      require(u32(30) == 1, s"BI_RLE8 only, compression tag ${u32(30)}")
      val dataOffset = u32(10)
      require(dataOffset >= DataOffset && dataOffset <= content.length,
        s"corrupt pixel-data offset $dataOffset of ${content.length}")
      def gray(idx: Int): Byte = content(14 + 40 + idx * 4) // palette blue channel
      val out = new Array[Byte](w * h)
      var i = dataOffset
      var x = 0
      var y = 0 // row counted from the BOTTOM (storage order)
      var done = false
      while (!done) {
        require(i + 2 <= content.length, s"truncated RLE stream at $i (no end-of-bitmap)")
        val n = content(i) & 0xff
        val v = content(i + 1) & 0xff
        i += 2
        if (n > 0) { // encoded run
          require(y < h && x + n <= w, s"run of $n at ($x,$y) crosses the ${w}x$h canvas")
          val row = (h - 1 - y) * w
          var k = 0
          while (k < n) { out(row + x + k) = gray(v); k += 1 }
          x += n
        } else v match {
          case 0 => x = 0; y += 1 // end of line
          case 1 => done = true // end of bitmap
          case 2 => // delta: skipped pixels stay 0 (palette entry 0)
            require(i + 2 <= content.length, s"truncated delta at $i")
            val dx = content(i) & 0xff; val dy = content(i + 1) & 0xff
            i += 2
            x += dx; y += dy
            require(x <= w && y <= h, s"delta lands off-canvas at ($x,$y)")
          case k => // absolute mode: k raw indices, word-aligned
            val pad = k & 1
            require(i + k + pad <= content.length, s"truncated absolute run of $k at $i")
            require(y < h && x + k <= w, s"absolute run of $k at ($x,$y) crosses the ${w}x$h canvas")
            val row = (h - 1 - y) * w
            var j = 0
            while (j < k) { out(row + x + j) = gray(content(i + j) & 0xff); j += 1 }
            x += k
            i += k + pad
        }
      }
      (w, h, out)
    }

    /** Deterministic synthetic image: random-width constant bands per
      * row, so the RLE stream genuinely compresses (variable-length
      * output a noise fixture would not produce).
      */
    def synthetic(w: Int, h: Int, seed: Long): Array[Byte] = {
      val rnd = new scala.util.Random(seed)
      val gray = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val band = math.min(w - x, 1 + rnd.nextInt(48))
          val v = rnd.nextInt(256).toByte
          var k = 0
          while (k < band) { gray(y * w + x + k) = v; k += 1 }
          x += band
        }
        y += 1
      }
      encode(w, h, gray)
    }
  }

  /** ----- REAL codec 4: RIFF/AVI with uncompressed DIB frames -----
    * The video container: `RIFF <size> AVI `, a `LIST hdrl` carrying the
    * 56-byte `avih` main header (frame period, frame count, dims), and a
    * `LIST movi` whose `00db` chunks each hold one uncompressed 24-bit
    * DIB frame (BGR, bottom-up rows, row stride padded to 4 bytes — the
    * classic device-independent-bitmap layout). Nested RIFF walking with
    * the same untrusted-size guards as [[WavCodec]]; no codec libraries
    * needed because the frames are uncompressed. Encoder+parser
    * complete; frames round-trip as top-down RGB. (Minimal writer: no
    * `strl` stream-definition list — the parser needs `avih`+`movi`.)
    */
  object AviCodec {
    private def le32(v: Int): Array[Byte] =
      Array(v, v >> 8, v >> 16, v >> 24).map(_.toByte)

    def isAvi(content: Array[Byte]): Boolean =
      content.length >= 12 &&
        content.slice(0, 4).sameElements("RIFF".getBytes("US-ASCII")) &&
        content.slice(8, 12).sameElements("AVI ".getBytes("US-ASCII"))

    /** True when the clip's frame stream is compressed (`00dc` MJPEG
      * chunks) rather than uncompressed DIB — the stream-kind probe the
      * resize path uses to re-encode like-for-like.
      */
    def isMjpeg(content: Array[Byte]): Boolean =
      isAvi(content) && walk(content)._2.exists(_._1 == "00dc")

    private def rowStride(w: Int): Int = (w * 3 + 3) & ~3 // DIB rows pad to 4 bytes

    /** Encode top-down RGB frames (each `w*h*3` bytes) at `usPerFrame`
      * microseconds per frame.
      */
    def encode(w: Int, h: Int, usPerFrame: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
      require(frames.nonEmpty && frames.forall(_.length == w * h * 3),
        s"each frame must be w*h*3 bytes")
      val avih = le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(0) ++
        le32(w) ++ le32(h) ++ Array.fill(16)(0.toByte)
      val hdrl = "hdrl".getBytes("US-ASCII") ++
        "avih".getBytes("US-ASCII") ++ le32(avih.length) ++ avih
      val stride = rowStride(w)
      val dibs = frames.map { rgb =>
        val dib = new Array[Byte](stride * h) // padding bytes stay 0
        var y = 0
        while (y < h) {
          val src = (h - 1 - y) * w * 3 // bottom-up storage reads top-down input reversed
          var x = 0
          while (x < w) { // RGB → BGR
            dib(y * stride + x * 3) = rgb(src + x * 3 + 2)
            dib(y * stride + x * 3 + 1) = rgb(src + x * 3 + 1)
            dib(y * stride + x * 3 + 2) = rgb(src + x * 3)
            x += 1
          }
          y += 1
        }
        "00db".getBytes("US-ASCII") ++ le32(dib.length) ++ dib
      }
      val movi = "movi".getBytes("US-ASCII") ++ dibs.reduce(_ ++ _)
      val body = "AVI ".getBytes("US-ASCII") ++
        "LIST".getBytes("US-ASCII") ++ le32(hdrl.length) ++ hdrl ++
        "LIST".getBytes("US-ASCII") ++ le32(movi.length) ++ movi
      "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    }

    /** (width, height, frameCount, usPerFrame) from `avih` ALONE — the
      * header-only probe (no frame bytes touched).
      */
    def header(content: Array[Byte]): (Int, Int, Int, Int) = {
      val (avih, _) = walk(content)
      avih.getOrElse(throw new IllegalArgumentException("missing avih header"))
    }

    /** (width, height, usPerFrame, top-down RGB frames). Handles BOTH
      * stream kinds: `00db` uncompressed DIB frames and `00dc`
      * COMPRESSED frames carrying baseline-JPEG payloads (MJPEG — each
      * frame its own [[JpegCodec]] grayscale image, expanded to RGB).
      */
    def decode(content: Array[Byte]): (Int, Int, Int, Seq[Array[Byte]]) = {
      val (avihOpt, chunks) = walk(content)
      val (w, h, nFrames, usPf) = avihOpt
        .getOrElse(throw new IllegalArgumentException("missing avih header"))
      require(chunks.length == nFrames,
        s"avih declares $nFrames frames, movi carries ${chunks.length}")
      val stride = rowStride(w)
      val frames = chunks.map {
        case ("00dc", at, sz) => // MJPEG frame
          val (jw, jh, gray) = JpegCodec.decode(
            java.util.Arrays.copyOfRange(content, at, at + sz))
          require(jw == w && jh == h,
            s"MJPEG frame is ${jw}x$jh, avih declares ${w}x$h")
          val rgb = new Array[Byte](w * h * 3)
          var i = 0
          while (i < w * h) { // grayscale → replicated RGB
            rgb(i * 3) = gray(i); rgb(i * 3 + 1) = gray(i); rgb(i * 3 + 2) = gray(i)
            i += 1
          }
          rgb
        case (_, at, sz) => // uncompressed DIB frame
          require(sz == stride * h, s"frame chunk of $sz bytes, expected ${stride * h}")
          val rgb = new Array[Byte](w * h * 3)
          var y = 0
          while (y < h) {
            val src = at + (h - 1 - y) * stride
            var x = 0
            while (x < w) { // BGR → RGB
              rgb((y * w + x) * 3) = content(src + x * 3 + 2)
              rgb((y * w + x) * 3 + 1) = content(src + x * 3 + 1)
              rgb((y * w + x) * 3 + 2) = content(src + x * 3)
              x += 1
            }
            y += 1
          }
          rgb
      }
      (w, h, usPf, frames)
    }

    /** MJPEG encode: each grayscale frame (`w*h` bytes) becomes its own
      * baseline-JPEG payload in a `00dc` (compressed) chunk — the real
      * compressed-video shape, same container walk.
      */
    def encodeMjpeg(w: Int, h: Int, usPerFrame: Int,
        grayFrames: Seq[Array[Byte]]): Array[Byte] = {
      require(grayFrames.nonEmpty && grayFrames.forall(_.length == w * h),
        "each grayscale frame must be w*h bytes")
      val avih = le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(grayFrames.length) ++ le32(0) ++ le32(1) ++ le32(0) ++
        le32(w) ++ le32(h) ++ Array.fill(16)(0.toByte)
      val hdrl = "hdrl".getBytes("US-ASCII") ++
        "avih".getBytes("US-ASCII") ++ le32(avih.length) ++ avih
      val jpgs = grayFrames.map { g =>
        val jpg = JpegCodec.encode(w, h, g)
        "00dc".getBytes("US-ASCII") ++ le32(jpg.length) ++ jpg ++
          (if (jpg.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
      }
      val movi = "movi".getBytes("US-ASCII") ++ jpgs.reduce(_ ++ _)
      val body = "AVI ".getBytes("US-ASCII") ++
        "LIST".getBytes("US-ASCII") ++ le32(hdrl.length) ++ hdrl ++
        "LIST".getBytes("US-ASCII") ++ le32(movi.length) ++ movi
      "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    }

    /** Deterministic synthetic MJPEG clip — the smooth moving gradient
      * of [[synthetic]] as grayscale JPEG frames.
      */
    def syntheticMjpeg(w: Int, h: Int, nFrames: Int, seed: Long): Array[Byte] = {
      val rnd = new scala.util.Random(seed)
      val base = rnd.nextInt(256)
      val frames = (0 until nFrames).map { f =>
        val g = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            g(y * w + x) = ((base + x * 7 + y * 3 + f * 31) % 256).toByte
            x += 1
          }
          y += 1
        }
        g
      }
      encodeMjpeg(w, h, usPerFrame = 40000, frames)
    }

    /** Shared nested-RIFF walk: returns the parsed avih (if any) and the
      * (chunkId, offset, size) of every frame chunk — `00db`
      * (uncompressed DIB) or `00dc` (compressed / MJPEG). All declared
      * sizes are untrusted — negative or past-the-payload sizes throw
      * (same contract as the WAV walk and the BMP opcode stream).
      */
    private def walk(content: Array[Byte])
        : (Option[(Int, Int, Int, Int)], Seq[(String, Int, Int)]) = {
      require(isAvi(content), "not a RIFF/AVI payload")
      def u16(i: Int): Int = (content(i) & 0xff) | ((content(i + 1) & 0xff) << 8)
      def u32(i: Int): Int = u16(i) | (u16(i + 2) << 16)
      var avih: Option[(Int, Int, Int, Int)] = None
      val frames = scala.collection.mutable.ArrayBuffer[(String, Int, Int)]()
      def chunks(from: Int, until: Int): Unit = {
        var i = from
        while (i + 8 <= until) {
          val id = new String(content, i, 4, "US-ASCII")
          val sz = u32(i + 4)
          val at = i + 8
          require(sz >= 0 && at.toLong + sz <= until,
            s"corrupt RIFF chunk '$id': declared $sz bytes at $at of $until")
          id match {
            case "LIST" =>
              require(sz >= 4, s"LIST chunk of $sz bytes has no subtype")
              chunks(at + 4, at + sz) // recurse past the 4-byte subtype
            case "avih" =>
              require(sz >= 40, s"avih of $sz bytes, need 40")
              avih = Some((u32(at + 32), u32(at + 36), u32(at + 16), u32(at)))
            case "00db" | "00dc" => frames += ((id, at, sz))
            case _ => () // index/junk chunks: skipped by declared size
          }
          i = at + sz + (sz & 1) // word alignment, as everywhere in RIFF
        }
      }
      chunks(12, content.length)
      (avih, frames.toSeq)
    }

    /** Deterministic synthetic clip: n frames of a moving two-band
      * gradient (frame index shifts the pattern, so frames differ and
      * motion is visible to any downstream frame-diff logic).
      */
    def synthetic(w: Int, h: Int, nFrames: Int, seed: Long): Array[Byte] = {
      val rnd = new scala.util.Random(seed)
      val base = rnd.nextInt(256)
      val frames = (0 until nFrames).map { f =>
        val rgb = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = ((base + x * 7 + y * 3 + f * 31) % 256).toByte
            rgb((y * w + x) * 3) = v
            rgb((y * w + x) * 3 + 1) = ((v & 0xff) / 2).toByte
            rgb((y * w + x) * 3 + 2) = (255 - (v & 0xff)).toByte
            x += 1
          }
          y += 1
        }
        rgb
      }
      encode(w, h, usPerFrame = 40000, frames) // 25 fps
    }
  }

  /** ----- REAL codec 5: baseline JPEG (JFIF, grayscale) -----
    * The TRANSFORM-coded member of the codec family — DCT + quantization
    * + Huffman entropy coding, i.e. the real compressed-frame work that
    * BI_RLE8 (run-length) only gestures at. Single 8-bit grayscale
    * component, baseline sequential (SOI/APP0/DQT/SOF0/DHT/SOS/EOI):
    * 8×8 blocks are level-shifted, forward-DCT'd, quantized by the DQT
    * table, and entropy-coded with DC prediction + AC zigzag
    * run-length over CANONICAL Huffman tables that are EMITTED in the
    * stream's own DHT segment — the decoder builds its tables from the
    * bitstream (any spec-valid tables work), never from constants
    * shared with the encoder. Flat tables (all-4-bit DC, all-8-bit AC
    * codes) keep the table code honest and small; they satisfy Kraft
    * and reserve the all-ones code as the standard requires. Lossy BY
    * DESIGN like any JPEG, but deterministic, and the DC quantizer of 8
    * keeps constant blocks EXACT (spatial error q/16 < 0.5 rounds
    * away) — MediaSpec pins exact flat-image round-trips and a bounded
    * gradient error. Used standalone and as the MJPEG frame payload in
    * [[AviCodec]] `00dc` chunks.
    */
  object JpegCodec {

    def isJpeg(content: Array[Byte]): Boolean =
      content.length >= 3 && (content(0) & 0xff) == 0xFF &&
        (content(1) & 0xff) == 0xD8 && (content(2) & 0xff) == 0xFF

    /** Zigzag scan order: position i in the scan reads natural index
      * Zigzag(i) of the 8×8 block (the T.81 scan pattern).
      */
    private val Zigzag: Array[Int] = Array(
      0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
      12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
      35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
      58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

    /** Quantization table in zigzag order: DC 8 (constant blocks stay
      * exact — see object doc), AC ramping 9..71 with frequency (mild,
      * deterministic loss).
      */
    private val QuantZz: Array[Int] =
      Array.tabulate(64)(i => if (i == 0) 8 else math.min(255, 8 + i))
    private val QuantNat: Array[Int] = {
      val q = new Array[Int](64)
      var i = 0
      while (i < 64) { q(Zigzag(i)) = QuantZz(i); i += 1 }
      q
    }

    // Flat canonical Huffman tables. DC: 12 category symbols, all 4-bit
    // codes (12/16 slots; 1111 unused). AC: EOB + 160 run/size symbols +
    // ZRL, all 8-bit codes (162/256; 0xFF... all-ones unused).
    private val DcBits: Array[Int] = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    private val DcVals: Array[Int] = (0 to 11).toArray
    private val AcBits: Array[Int] = Array(0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0)
    private val AcVals: Array[Int] =
      0x00 +: (for (run <- 0 to 15; size <- 1 to 10) yield (run << 4) | size).toArray :+ 0xF0

    /** Canonical code assignment (T.81 Annex C): symbols in `vals`
      * order get increasing codes within increasing lengths. Returns
      * symbol → (code, length).
      */
    private def canonical(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
      var code = 0
      var k = 0
      val out = scala.collection.mutable.Map.empty[Int, (Int, Int)]
      var len = 1
      while (len <= 16) {
        var i = 0
        while (i < bits(len - 1)) {
          out(vals(k)) = (code, len); code += 1; k += 1; i += 1
        }
        code <<= 1
        len += 1
      }
      out.toMap
    }
    private val DcEnc = canonical(DcBits, DcVals)
    private val AcEnc = canonical(AcBits, AcVals)

    private val CosT: Array[Array[Double]] =
      Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
    private def alpha(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

    /** Bit count of |v| (the JPEG "category"/"size"). */
    private def bitSize(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

    private final class BitWriter(out: java.io.ByteArrayOutputStream) {
      private var acc = 0
      private var nBits = 0
      def put(code: Int, len: Int): Unit = {
        var i = len - 1
        while (i >= 0) {
          acc = (acc << 1) | ((code >> i) & 1)
          nBits += 1
          if (nBits == 8) {
            out.write(acc)
            if (acc == 0xFF) out.write(0x00) // byte stuffing
            acc = 0; nBits = 0
          }
          i -= 1
        }
      }
      def flushOnes(): Unit = if (nBits > 0) put(0xFF, 8 - nBits)
    }

    def encode(w: Int, h: Int, gray: Array[Byte]): Array[Byte] = {
      require(w > 0 && h > 0 && gray.length == w * h,
        s"gray payload must be w*h bytes, got ${gray.length} for ${w}x$h")
      val out = new java.io.ByteArrayOutputStream()
      def seg(m: Int, payload: Array[Byte]): Unit = {
        out.write(0xFF); out.write(m)
        out.write((payload.length + 2) >> 8); out.write((payload.length + 2) & 0xff)
        out.write(payload, 0, payload.length)
      }
      out.write(0xFF); out.write(0xD8) // SOI
      seg(0xE0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
      seg(0xDB, 0.toByte +: QuantZz.map(_.toByte)) // Pq=0 Tq=0, zigzag order
      seg(0xC0, Array[Byte](8, (h >> 8).toByte, (h & 0xff).toByte,
        (w >> 8).toByte, (w & 0xff).toByte, 1, 1, 0x11, 0))
      def dht(classId: Int, bits: Array[Int], vals: Array[Int]): Array[Byte] =
        classId.toByte +: (bits.map(_.toByte) ++ vals.map(_.toByte))
      seg(0xC4, dht(0x00, DcBits, DcVals) ++ dht(0x10, AcBits, AcVals))
      seg(0xDA, Array[Byte](1, 1, 0x00, 0, 63, 0))
      val bw = new BitWriter(out)
      val coef = new Array[Int](64)
      val block = new Array[Double](64)
      var prevDc = 0
      var by = 0
      while (by < (h + 7) / 8) {
        var bx = 0
        while (bx < (w + 7) / 8) {
          // load with edge replication + level shift
          var y = 0
          while (y < 8) {
            val sy = math.min(h - 1, by * 8 + y)
            var x = 0
            while (x < 8) {
              val sx = math.min(w - 1, bx * 8 + x)
              block(y * 8 + x) = (gray(sy * w + sx) & 0xff) - 128.0
              x += 1
            }
            y += 1
          }
          // FDCT + quantize (natural order)
          var v = 0
          while (v < 8) {
            var u = 0
            while (u < 8) {
              var s = 0.0
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  s += block(yy * 8 + xx) * CosT(yy)(v) * CosT(xx)(u)
                  xx += 1
                }
                yy += 1
              }
              val f = 0.25 * alpha(u) * alpha(v) * s
              coef(v * 8 + u) = math.round(f / QuantNat(v * 8 + u)).toInt
              u += 1
            }
            v += 1
          }
          // DC: predicted diff, category + magnitude bits
          val diff = coef(0) - prevDc
          prevDc = coef(0)
          val dsz = bitSize(diff)
          val (dc, dl) = DcEnc(dsz)
          bw.put(dc, dl)
          if (dsz > 0) bw.put(if (diff >= 0) diff else diff + (1 << dsz) - 1, dsz)
          // AC: zigzag run-length with ZRL/EOB
          var run = 0
          var i = 1
          while (i < 64) {
            val ac = coef(Zigzag(i))
            if (ac == 0) run += 1
            else {
              while (run > 15) { val (c, l) = AcEnc(0xF0); bw.put(c, l); run -= 16 }
              val asz = bitSize(ac)
              val (c, l) = AcEnc((run << 4) | asz)
              bw.put(c, l)
              bw.put(if (ac >= 0) ac else ac + (1 << asz) - 1, asz)
              run = 0
            }
            i += 1
          }
          if (run > 0) { val (c, l) = AcEnc(0x00); bw.put(c, l) } // EOB
          bx += 1
        }
        by += 1
      }
      bw.flushOnes()
      out.write(0xFF); out.write(0xD9) // EOI
      out.toByteArray
    }

    /** (width, height, grayscale bytes). Tables come from the stream's
      * own DQT/DHT segments; all declared lengths are untrusted (same
      * guard contract as the RIFF walks).
      */
    def decode(content: Array[Byte]): (Int, Int, Array[Byte]) = {
      require(isJpeg(content), "not a JPEG payload")
      def u8(i: Int): Int = content(i) & 0xff
      def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
      var w = 0; var h = 0
      var quant: Array[Int] = null
      // (class, id) → (bits, vals)
      val tables = scala.collection.mutable.Map.empty[Int, (Array[Int], Array[Int])]
      var pos = 2
      var sosAt = -1
      while (sosAt < 0) {
        require(pos + 4 <= content.length, "truncated JPEG: no SOS")
        require(u8(pos) == 0xFF, s"expected marker at $pos")
        val m = u8(pos + 1)
        val len = u16(pos + 2)
        require(len >= 2 && pos + 2 + len <= content.length,
          s"corrupt segment 0x${m.toHexString}: declared $len bytes")
        val at = pos + 4
        m match {
          case 0xDB =>
            require(len >= 67 && (u8(at) >> 4) == 0, "DQT: need one 8-bit table")
            quant = Array.tabulate(64)(i => u8(at + 1 + i))
          case 0xC0 =>
            require(u8(at) == 8 && u8(at + 5) == 1,
              "SOF0: 8-bit single-component baseline only")
            h = u16(at + 1); w = u16(at + 3)
          case 0xC4 =>
            var p = at
            while (p < pos + 2 + len) {
              val tc = u8(p)
              val bits = Array.tabulate(16)(i => u8(p + 1 + i))
              val n = bits.sum
              require(p + 17 + n <= pos + 2 + len, "DHT overruns its segment")
              tables(tc) = (bits, Array.tabulate(n)(i => u8(p + 17 + i)))
              p += 17 + n
            }
          case 0xDA => sosAt = pos + 2 + len
          case _ => () // APPn/COM/others: skip by declared length
        }
        pos += 2 + len
      }
      require(w > 0 && h > 0, "missing SOF0")
      require(quant != null, "missing DQT")
      val (dcBits, dcVals) = tables.getOrElse(0x00,
        throw new IllegalArgumentException("missing DC Huffman table"))
      val (acBits, acVals) = tables.getOrElse(0x10,
        throw new IllegalArgumentException("missing AC Huffman table"))
      val qNat = new Array[Int](64)
      var zi = 0
      while (zi < 64) { qNat(Zigzag(zi)) = quant(zi); zi += 1 }
      // canonical decode tables: per length, [minCode, maxCode] + first
      // symbol index (the T.81 Annex F DECODE procedure)
      def decTables(bits: Array[Int], vals: Array[Int]) = {
        val minC = new Array[Int](17); val maxC = new Array[Int](17)
        val valP = new Array[Int](17)
        var code = 0; var k = 0; var len = 1
        while (len <= 16) {
          if (bits(len - 1) == 0) { minC(len) = 0; maxC(len) = -1 }
          else { valP(len) = k; minC(len) = code; code += bits(len - 1); k += bits(len - 1); maxC(len) = code - 1 }
          code <<= 1
          len += 1
        }
        (minC, maxC, valP, vals)
      }
      val dcT = decTables(dcBits, dcVals)
      val acT = decTables(acBits, acVals)
      // bit reader over the entropy stream (0xFF00 unstuffed; any other
      // marker ends the scan)
      var bp = sosAt
      var bacc = 0; var bn = 0
      def nextBit(): Int = {
        if (bn == 0) {
          require(bp < content.length, "entropy stream truncated")
          var b = u8(bp); bp += 1
          if (b == 0xFF) {
            require(bp < content.length, "entropy stream truncated at 0xFF")
            if (u8(bp) == 0x00) bp += 1 // stuffed data byte
            else { bp -= 1; b = 0 } // marker: stay pinned on it; pad reads as zeros
          }
          bacc = b; bn = 8
        }
        bn -= 1
        (bacc >> bn) & 1
      }
      def decodeSym(t: (Array[Int], Array[Int], Array[Int], Array[Int])): Int = {
        val (minC, maxC, valP, vals) = t
        var code = nextBit()
        var len = 1
        while (!(maxC(len) >= 0 && code <= maxC(len))) {
          code = (code << 1) | nextBit()
          len += 1
          require(len <= 16, "invalid Huffman code in entropy stream")
        }
        vals(valP(len) + code - minC(len))
      }
      def receive(sz: Int): Int = {
        var v = 0; var i = 0
        while (i < sz) { v = (v << 1) | nextBit(); i += 1 }
        if (sz > 0 && v < (1 << (sz - 1))) v - (1 << sz) + 1 else v
      }
      val gray = new Array[Byte](w * h)
      val coef = new Array[Int](64)
      var prevDc = 0
      var by = 0
      while (by < (h + 7) / 8) {
        var bx = 0
        while (bx < (w + 7) / 8) {
          java.util.Arrays.fill(coef, 0)
          prevDc += receive(decodeSym(dcT))
          coef(0) = prevDc
          var i = 1
          while (i < 64) {
            val rs = decodeSym(acT)
            if (rs == 0x00) i = 64 // EOB
            else if (rs == 0xF0) i += 16 // ZRL
            else {
              i += rs >> 4
              require(i < 64, "AC run past block end")
              coef(Zigzag(i)) = receive(rs & 0x0F)
              i += 1
            }
          }
          // dequant + IDCT + level shift, cropped to the true dims
          var y = 0
          while (y < 8) {
            val py = by * 8 + y
            var x = 0
            while (x < 8) {
              val px = bx * 8 + x
              if (py < h && px < w) {
                var s = 0.0
                var v = 0
                while (v < 8) {
                  var u = 0
                  while (u < 8) {
                    val c = coef(v * 8 + u)
                    if (c != 0)
                      s += alpha(u) * alpha(v) * c * qNat(v * 8 + u) *
                        CosT(y)(v) * CosT(x)(u)
                    u += 1
                  }
                  v += 1
                }
                val pix = math.round(0.25 * s + 128.0).toInt
                gray(py * w + px) = math.max(0, math.min(255, pix)).toByte
              }
              x += 1
            }
            y += 1
          }
          bx += 1
        }
        by += 1
      }
      (w, h, gray)
    }

    /** Deterministic synthetic grayscale image (smooth two-gradient
      * pattern — compresses well under the DCT, unlike noise).
      */
    def synthetic(w: Int, h: Int, seed: Long): Array[Byte] = {
      val rnd = new scala.util.Random(seed)
      val base = rnd.nextInt(256)
      val gray = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          gray(y * w + x) = ((base + x * 5 + y * 2) % 256).toByte
          x += 1
        }
        y += 1
      }
      encode(w, h, gray)
    }
  }

  /** ----- STUB codec (deterministic fake; see object scaladoc) -----
    * Fake container layout: byte 0 = kind tag, bytes 1-4 = width,
    * bytes 5-8 = height, rest = "pixels" (hash-expanded).
    */
  object FakeCodec {
    def encode(kind: String, w: Int, h: Int, seed: Long): Array[Byte] = {
      val header = Array[Byte](kindTag(kind),
        (w >> 8).toByte, w.toByte, (h >> 8).toByte, h.toByte)
      val rnd = new scala.util.Random(seed)
      val body = Array.fill(math.min(w * h, 4096))(rnd.nextInt(256).toByte)
      header ++ body
    }
    def kindTag(kind: String): Byte = kind match {
      case "image" => 1; case "audio" => 2; case "video" => 3; case _ => 0
    }
    /** Decode = parse the fake header. A real codec goes here. */
    def decodeDims(content: Array[Byte]): (Int, Int) =
      (((content(1) & 0xff) << 8) | (content(2) & 0xff),
        ((content(3) & 0xff) << 8) | (content(4) & 0xff))
    def body(content: Array[Byte]): Array[Byte] = content.drop(5)
  }

  /** Deterministic synthetic media corpus derived from the documents
    * table (the driver fixtures carry no binary columns; blobs are
    * fabricated per doc_id — STUB input, real schema). Pass `onlyIds` to
    * restrict BEFORE the fabricating map — the doc_id filter then pushes
    * into the parquet scan, so probe-sized reads don't encode the whole
    * corpus.
    */
  def corpus(spark: SparkSession, sfDir: String,
      onlyIds: Option[Set[Long]] = None): Dataset[MediaRecord] = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val restricted = onlyIds match {
      case Some(ids) => docs.filter(col("doc_id").isin(ids.toSeq: _*))
      case None => docs
    }
    restricted
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .map { case (id, n) =>
        val kind = (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
        // image payloads are REAL w*h*3-byte PPMs, audio payloads REAL
        // RIFF/WAVE PCM clips — dims/lengths sized so the fixture's
        // per-record payload (~2-15 KB) stays comparable to the capped
        // stub bodies rather than dominating the bench. For audio the
        // (width, height) metadata slots carry (channels, bits) — WAV
        // has no pixel dims, and the feature extractor re-parses both
        // from the fmt chunk.
        // video dims are small because frames are REAL uncompressed DIBs
        // now: 6 frames × w×h×3 bytes must stay inside the fixture's
        // ~2-30 KB per-record payload budget
        val (w, h) =
          if (kind == "image") (32 + (id % 8).toInt * 8, 24 + (id % 5).toInt * 8)
          else if (kind == "audio") (1, 16)
          else (16 + (id % 8).toInt * 4, 12 + (id % 5).toInt * 4)
        val nSamples = 800 + (id % 64).toInt * 16
        val nFrames = 6
        // the image column is HETEROGENEOUS by design: alternating
        // records carry uncompressed RGB PPM and RLE8-compressed BMP —
        // a real mixed-crawl corpus never arrives in one format, and the
        // per-payload magic-number dispatch (not the metadata) is what
        // every decode path must exercise
        // the VIDEO column alternates too: uncompressed-DIB AVI and
        // MJPEG AVI (baseline-JPEG 00dc frames — transform-coded, the
        // real compressed-video shape) under one container walk
        val altFormat = (id / 3) % 2 == 1
        val content = kind match {
          case "image" =>
            if (altFormat) BmpCodec.synthetic(w, h, seed = id) // real, compressed
            else PpmCodec.synthetic(w, h, seed = id) // real format
          case "audio" => WavCodec.synthetic(16000, nSamples, seed = id) // real format
          case _ =>
            if (altFormat) AviCodec.syntheticMjpeg(w, h, nFrames, seed = id)
            else AviCodec.synthetic(w, h, nFrames, seed = id) // real container
        }
        val fmt = kind match {
          case "image" => if (altFormat) "bmp" else "ppm"
          case "audio" => "wav"
          case _ => if (altFormat) "mjpeg" else "avi"
        }
        MediaRecord(id,
          MediaMeta(kind, fmt, w, h,
            durationMs =
              if (kind == "audio") nSamples.toLong * 1000 / 16000
              else nFrames.toLong * 40000 / 1000, // frames × 40 ms (25 fps)
            sampleRate = 16000),
          content)
      }
  }

  /** Container-dispatching header parse: real PPM images and WAV clips
    * by magic number (WAV "dims" are (channels, bits) — see [[corpus]]),
    * the stub layout otherwise.
    */
  def decodeDims(content: Array[Byte]): (Int, Int) =
    if (PpmCodec.isPpm(content)) { val (w, h, _) = PpmCodec.decode(content); (w, h) }
    else if (BmpCodec.isBmp(content)) BmpCodec.dims(content) // header-only, no RLE decode
    else if (AviCodec.isAvi(content)) {
      val (w, h, _, _) = AviCodec.header(content); (w, h) // header-only, no frame decode
    } else if (WavCodec.isWav(content)) {
      val (_, ch) = WavCodec.fmtInfo(content); (ch, 16) // header-only, no PCM decode
    } else FakeCodec.decodeDims(content)

  /** Mean byte brightness + 64-d pooled embedding over decoded payload
    * bytes — the shared feature kernel for both codecs.
    */
  private def poolBytes(body: Array[Byte]): (Double, Array[Float]) = {
    val bright =
      if (body.isEmpty) 0.0 else body.map(b => (b & 0xff).toDouble).sum / body.length
    val emb = new Array[Float](64)
    var i = 0
    while (i < body.length) { emb(i % 64) += (body(i) & 0xff) / 255.0f; i += 1 }
    (bright, emb)
  }

  /** Decode + feature-extract, batched per partition (mapPartitions —
    * one iterator pass per partition, the batch shape a vectorized
    * decoder wants). Features: true dims re-parsed from the payload,
    * mean byte brightness, and a 64-d embedding pooled from the decoded
    * bytes — actual pixel values for PPM images, stub body bytes for
    * the faked audio/video containers.
    */
  def extractImageFeatures(media: Dataset[MediaRecord]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val (w, h, body) =
          if (PpmCodec.isPpm(r.content)) PpmCodec.decode(r.content)
          else if (BmpCodec.isBmp(r.content)) BmpCodec.decode(r.content) // RLE8 → gray pixels
          else if (AviCodec.isAvi(r.content)) {
            val (vw, vh, _, frames) = AviCodec.decode(r.content)
            (vw, vh, frames.head) // keyframe pixels represent the clip
          } else if (WavCodec.isWav(r.content)) {
            val (_, ch, samples) = WavCodec.decode(r.content)
            (ch, 16, WavCodec.dataBytes(samples)) // decoded PCM byte stream
          } else {
            val (fw, fh) = FakeCodec.decodeDims(r.content)
            (fw, fh, FakeCodec.body(r.content))
          }
        val (bright, emb) = poolBytes(body)
        ImageFeatures(r.media_id, w, h, bright, emb)
      }
    }
  }

  /** Audio features from decoded WAV samples (not container bytes):
    * sample-rate/channel metadata re-parsed from the fmt chunk, RMS
    * amplitude in [0,1], and a 64-d |sample| pooled embedding — the
    * audio analog of [[extractImageFeatures]], same narrow
    * per-partition batch shape.
    */
  def extractAudioFeatures(media: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.filter(r => WavCodec.isWav(r.content)).mapPartitions(_.map { r =>
      val (rate, ch, samples) = WavCodec.decode(r.content)
      val emb = new Array[Float](64)
      var acc = 0.0
      var i = 0
      while (i < samples.length) {
        val s = samples(i) / 32768.0
        acc += s * s
        emb(i % 64) += math.abs(s).toFloat
        i += 1
      }
      AudioFeatures(r.media_id, rate, ch, samples.length,
        samples.length.toLong * 1000 / math.max(1, rate * ch),
        if (samples.isEmpty) 0.0 else math.sqrt(acc / samples.length), emb)
    })
  }

  /** Resize: recompute metadata + deterministically re-encode the
    * payload at the new dimensions. Narrow map stage; no shuffle.
    * Resizing is a PIXEL operation: real images resample, the video
    * stub re-encodes its fake dims, and AUDIO records pass through
    * unchanged — the old behavior re-encoded WAV payloads as stub
    * bytes while meta kept format="wav", so every resized audio record
    * silently vanished from the downstream isWav-filtered extractors.
    */
  def resize(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      if (PpmCodec.isPpm(r.content))
        r.copy(meta = r.meta.copy(width = w, height = h),
          content = resizePpm(r.content, w, h))
      else if (BmpCodec.isBmp(r.content))
        r.copy(meta = r.meta.copy(width = w, height = h),
          content = resizeBmp(r.content, w, h))
      else if (AviCodec.isAvi(r.content))
        r.copy(meta = r.meta.copy(width = w, height = h),
          content = resizeAvi(r.content, w, h))
      else if (WavCodec.isWav(r.content)) r // pixel dims don't apply to audio
      else r.copy(meta = r.meta.copy(width = w, height = h),
        content = FakeCodec.encode(r.meta.kind, w, h, seed = r.media_id))
    })
  }

  /** Nearest-neighbor resample of a P6 image to (w, h) — a real resize
    * over real pixels, still a narrow per-record computation.
    */
  private def resizePpm(content: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val (sw, sh, px) = PpmCodec.decode(content)
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val sy = math.min(sh - 1, y * sh / h)
      var x = 0
      while (x < w) {
        val sx = math.min(sw - 1, x * sw / w)
        var c = 0
        while (c < 3) {
          out((y * w + x) * 3 + c) = px((sy * sw + sx) * 3 + c); c += 1
        }
        x += 1
      }
      y += 1
    }
    PpmCodec.encode(w, h, out)
  }

  /** Nearest-neighbor resample of an RLE8 BMP to (w, h): decode to
    * grayscale, resample, re-encode (re-compressing the result — band
    * structure survives a resample, so the output stays compressed).
    */
  private def resizeBmp(content: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val (sw, sh, px) = BmpCodec.decode(content)
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      val sy = math.min(sh - 1, y * sh / h)
      var x = 0
      while (x < w) {
        out(y * w + x) = px(sy * sw + math.min(sw - 1, x * sw / w))
        x += 1
      }
      y += 1
    }
    BmpCodec.encode(w, h, out)
  }

  /** Nearest-neighbor resample of every frame in an AVI clip to (w, h),
    * preserving frame count, frame period, AND the stream kind: an
    * MJPEG clip re-encodes as MJPEG (luma of the resampled RGB), a DIB
    * clip as DIB — the metadata/payload consistency rule the audio
    * resize bug taught (a record whose meta says one format while the
    * bytes say another silently vanishes from format-dispatched paths).
    */
  private def resizeAvi(content: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val (sw, sh, usPf, frames) = AviCodec.decode(content)
    val resized = frames.map { px =>
      val out = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        val sy = math.min(sh - 1, y * sh / h)
        var x = 0
        while (x < w) {
          val sx = math.min(sw - 1, x * sw / w)
          var c = 0
          while (c < 3) {
            out((y * w + x) * 3 + c) = px((sy * sw + sx) * 3 + c); c += 1
          }
          x += 1
        }
        y += 1
      }
      out
    }
    if (AviCodec.isMjpeg(content))
      AviCodec.encodeMjpeg(w, h, usPf, resized.map { rgb =>
        // ITU-R BT.601 integer luma; our MJPEG frames are gray-replicated
        // RGB, for which this is exact (r = g = b → luma = that value)
        val g = new Array[Byte](w * h)
        var i = 0
        while (i < w * h) {
          g(i) = ((77 * (rgb(i * 3) & 0xff) + 150 * (rgb(i * 3 + 1) & 0xff) +
            29 * (rgb(i * 3 + 2) & 0xff)) >> 8).toByte
          i += 1
        }
        g
      })
    else AviCodec.encode(w, h, usPf, resized)
  }

  /** Frame sampling for video records: n evenly-spaced REAL frames from
    * the AVI container, each re-encoded as a standalone PPM image with
    * its true timestamp (frame index × frame period) — one output row
    * per frame (generator shape). Sampled frames are full-fledged image
    * payloads: they flow straight into [[extractImageFeatures]], which
    * is the video→image feature handoff a training pipeline needs.
    * Unknown containers keep the stub slicing fallback.
    */
  def sampleFrames(media: Dataset[MediaRecord], n: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.meta.kind == "video").flatMap { r =>
      if (AviCodec.isAvi(r.content)) {
        val (w, h, usPf, frames) = AviCodec.decode(r.content)
        val picks =
          if (frames.length <= n) frames.indices
          else (0 until n).map(i => i * frames.length / n)
        picks.zipWithIndex.map { case (fi, i) =>
          Frame(r.media_id, i, fi.toLong * usPf / 1000,
            PpmCodec.encode(w, h, frames(fi)))
        }
      } else {
        val body = FakeCodec.body(r.content)
        val step = math.max(1, body.length / n)
        (0 until n).map { i =>
          Frame(r.media_id, i, i * (r.meta.durationMs / math.max(1, n)),
            body.slice(i * step, math.min(body.length, (i + 1) * step)))
        }
      }
    }
  }

  /** Exact dedup by content hash — blobs are hashed where they live
    * (map-side sha2 over the binary column); only the 64-char digest
    * shuffles, never the payload.
    */
  def dedupByContent(media: Dataset[MediaRecord]): DataFrame =
    media.toDF()
      .withColumn("content_sha", sha2(col("content"), 256))
      .groupBy("content_sha")
      .agg(min("media_id").as("keep_id"), count(lit(1)).as("n_dups"))

  /** Scene-change (shot-cut) detection over decoded video frames:
    * per-video frame count, number of cuts, and the largest
    * frame-to-frame mean |pixel delta| (0–255 scale). A cut = the mean
    * absolute per-byte delta between consecutive frames exceeding
    * `threshold` — gradual motion moves a few units per frame, a hard
    * cut jumps tens. Same narrow mapPartitions contract as every other
    * codec pass: whole payloads decode where they live, only the
    * 4-field summary row leaves the stage.
    */
  def sceneStats(media: Dataset[MediaRecord],
      threshold: Double = 100.0): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(r => AviCodec.isAvi(r.content)).mapPartitions(_.map { r =>
      val (_, _, _, frames) = AviCodec.decode(r.content)
      var maxDiff = 0.0
      var cuts = 0
      var i = 1
      while (i < frames.length) {
        val a = frames(i - 1); val b = frames(i)
        var s = 0L
        var j = 0
        while (j < a.length) {
          s += math.abs((a(j) & 0xff) - (b(j) & 0xff)); j += 1
        }
        val d = if (a.length == 0) 0.0 else s.toDouble / a.length
        if (d > maxDiff) maxDiff = d
        if (d > threshold) cuts += 1
        i += 1
      }
      (r.media_id, frames.length, cuts,
        math.rint(maxDiff * 10000) / 10000)
    }).toDF("media_id", "n_frames", "n_cuts", "max_diff")
  }

  /** Energy-threshold voice-activity detection over decoded PCM: split
    * each clip into `windowSamples`-sample windows, mark a window
    * active when its RMS (samples normalized to [-1,1]) exceeds
    * `threshold`. The silence/speech segmentation every audio curation
    * pipeline runs before transcription — here per-clip (windows,
    * active windows, active ratio).
    */
  def vadStats(media: Dataset[MediaRecord], windowSamples: Int = 320,
      threshold: Double = 0.05): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(r => WavCodec.isWav(r.content)).mapPartitions(_.map { r =>
      val (_, _, samples) = WavCodec.decode(r.content)
      val nw = samples.length / windowSamples // trailing partial dropped
      var active = 0
      var w = 0
      while (w < nw) {
        var acc = 0.0
        var j = w * windowSamples
        val end = j + windowSamples
        while (j < end) {
          val v = samples(j) / 32768.0; acc += v * v; j += 1
        }
        if (math.sqrt(acc / windowSamples) > threshold) active += 1
        w += 1
      }
      (r.media_id, nw, active,
        if (nw == 0) 0.0 else math.rint(active.toDouble / nw * 10000) / 10000)
    }).toDF("media_id", "n_windows", "n_active", "active_ratio")
  }

  /** 64-bit average-hash (aHash) of a grayscale image: mean-pool the
    * pixels onto an 8×8 grid, set bit (row*8+col) when the cell mean
    * exceeds the global mean. Brightness-INVARIANT by construction (a
    * constant shift moves every cell mean and the global mean equally),
    * which is exactly what byte-exact sha2 dedup cannot see.
    */
  def aHash64(w: Int, h: Int, gray: Array[Byte]): Long = {
    require(w >= 8 && h >= 8, s"aHash needs >= 8x8 pixels, got ${w}x$h")
    val cellSum = new Array[Long](64)
    val cellN = new Array[Long](64)
    var y = 0
    while (y < h) {
      val cy = y * 8 / h
      var x = 0
      while (x < w) {
        val c = cy * 8 + x * 8 / w
        cellSum(c) += (gray(y * w + x) & 0xff)
        cellN(c) += 1
        x += 1
      }
      y += 1
    }
    var total = 0L; var n = 0L
    var i = 0
    while (i < 64) { total += cellSum(i); n += cellN(i); i += 1 }
    val mean = total.toDouble / n
    var bits = 0L
    i = 0
    while (i < 64) {
      if (cellSum(i).toDouble / cellN(i) > mean) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** Decoded grayscale of any VISUAL payload (PPM/BMP image, AVI
    * keyframe): (w, h, luma bytes). None for audio/unknown payloads.
    */
  def grayscaleOf(content: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    def luma(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
      val g = new Array[Byte](w * h)
      var i = 0
      while (i < w * h) {
        g(i) = (((rgb(i * 3) & 0xff) * 299 + (rgb(i * 3 + 1) & 0xff) * 587 +
          (rgb(i * 3 + 2) & 0xff) * 114) / 1000).toByte
        i += 1
      }
      g
    }
    if (PpmCodec.isPpm(content)) {
      val (w, h, rgb) = PpmCodec.decode(content); Some((w, h, luma(w, h, rgb)))
    } else if (BmpCodec.isBmp(content)) {
      Some(BmpCodec.decode(content)) // already grayscale
    } else if (AviCodec.isAvi(content)) {
      val (w, h, _, frames) = AviCodec.decode(content)
      Some((w, h, luma(w, h, frames.head))) // keyframe represents the clip
    } else None
  }

  /** Per-record perceptual hash over every visual payload (images AND
    * video keyframes — cross-modal near-dup is the point: a clip's
    * thumbnail and the clip itself collide here, never under sha2).
    * Same narrow mapPartitions shape as the feature extractors; only
    * (id, dims, 8-byte hash) leave the stage, payloads never shuffle.
    */
  def perceptualHashes(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      grayscaleOf(r.content).map { case (w, h, gray) =>
        (r.media_id, w, h, aHash64(w, h, gray))
      }
    }).toDF("media_id", "width", "height", "phash")
  }

  /** Near-duplicate pairs from a (media_id, phash) frame: SimHash-style
    * banded candidate join — split the 64-bit hash into 4×16-bit bands;
    * hamming ≤ 3 pigeonholes at least one band equal, so the band
    * equi-join has EXACT recall at that radius while never comparing
    * all pairs. Verification is one codegen'd bit_count(xor) per
    * candidate. At 100 TB the join shuffles (band, 16-bit value, hash,
    * id) tuples only; a degenerate constant-image bucket is bounded by
    * the same hot-bucket cap argument as text LSH (the cap is not
    * needed at fixture scale and would drop genuine pairs here, so the
    * radius-3 pigeonhole contract stays exact).
    */
  def phashNearDupPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4x16 banding guarantees recall only to radius 3")
    val banded = hashes.select(col("media_id"), col("phash"),
      explode(expr("transform(sequence(0, 3), " +
        "b -> struct(b as band, shiftrightunsigned(phash, b * 16) & 65535 as bval))"))
        .as("bb"))
      .select(col("media_id"), col("phash"),
        col("bb.band").as("band"), col("bb.bval").as("bval"))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bval") === col("y.bval") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("media_a"), col("y.media_id").as("media_b"),
        bit_count(col("x.phash").bitwiseXOR(col("y.phash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("media_a"), col("media_b"))
  }
}
