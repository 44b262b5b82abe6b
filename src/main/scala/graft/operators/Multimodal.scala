package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image /
  * audio / video as opaque `binary` columns with typed metadata
  * structs, processed by per-partition batch functions.
  *
  * The Spark-side contract is real and tested — schemas, partition
  * batching, deterministic outputs. The codec seam has four
  * implementations: [[ImageIoCodec]] is a REAL png/jpeg decoder built
  * on the JDK's own `javax.imageio` (no external dependency — covers
  * the reference's actual input contract, README.md:629 jpg/png
  * ≤ 5 MB), [[WavCodec]] is a REAL wav/aiff/au PCM decoder on the
  * JDK's `javax.sound.sampled`, [[GifCodec]] is a REAL multi-frame
  * decoder (animated GIF — the one multi-frame format javax.imageio
  * reads, making [[extractFrames]] genuine frame decoding with zero
  * new dependencies), and [[FakeCodec]] is the deterministic
  * stand-in retained for plumbing tests and for container formats the
  * JDK cannot demux (mp4 et al.). A production deployment swaps
  * richer codecs in; nothing else changes.
  *
  * Scale notes: `mapPartitions` keeps one codec instance per partition
  * (amortized model/codec init — the reason mapInPandas-style batch
  * APIs exist), rows stream through without materializing the whole
  * partition, and binary payloads never pass through a shuffle in these
  * ops (narrow transformations only). Feature extraction that feeds the
  * ANN path emits `array<float>` compatible with [[Similarity]].
  */
object Multimodal {

  /** Typed metadata carried alongside every media payload. */
  case class MediaMeta(format: String, width: Int, height: Int,
                       channels: Int, durationMs: Long)

  case class MediaRecord(id: Long, mediaType: String, content: Array[Byte],
                         meta: MediaMeta)

  case class DecodedRecord(id: Long, mediaType: String, meta: MediaMeta,
                           pixels: Array[Float])

  case class FrameRecord(id: Long, frameNo: Int, content: Array[Byte])

  case class DecodedFrameRecord(id: Long, frameNo: Int, meta: MediaMeta,
                                pixels: Array[Float])

  case class FeatureRecord(id: Long, embedding: Array[Float])

  /** The codec seam — a real implementation wraps an image/audio
    * library; [[FakeCodec]] is the deterministic stand-in (STUB: no
    * media libs in this container).
    */
  trait MediaCodec extends Serializable {
    def decode(bytes: Array[Byte], meta: MediaMeta): Array[Float]
    /** The metadata that actually describes [[decode]]'s output. The
      * default trusts the caller's advisory meta (FakeCodec derives
      * pixel counts FROM it, so they agree by construction); codecs
      * that read dimensions from the payload header MUST override, or
      * decode->resize breaks on records whose advisory dims disagree
      * with the bytes. */
    def decodedMeta(bytes: Array[Byte], meta: MediaMeta): MediaMeta = meta
    def resize(pixels: Array[Float], meta: MediaMeta,
               w: Int, h: Int): (Array[Float], MediaMeta)
    def embed(bytes: Array[Byte], dim: Int): Array[Float]
  }

  /** Deterministic fake: "pixels"/"embeddings" are hash-derived floats —
    * stable across runs and processes, so plumbing tests can assert
    * exact values. */
  object FakeCodec extends MediaCodec {
    // splitmix64 finalizer: full avalanche per (seed, i). A plain
    // affine map (seed*A + i*B) is NOT enough here — its outputs for
    // two seeds differ by a constant, so whenever (Δseed·A)>>16 lands
    // near a multiple of the value modulus the two feature vectors
    // come out near-parallel (measured: ~3% of doc pairs at cosine
    // ≥ 0.9999), which breaks any ANN ground-truth built on the stub.
    private def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    private def f(seed: Long, i: Int): Float =
      ((mix(seed * 6364136223846793005L + i * 1442695040888963407L) >>> 16)
        % 1000L).toFloat / 1000f
    private def seedOf(bytes: Array[Byte]): Long =
      bytes.foldLeft(1125899906842597L)((a, b) => a * 31 + b)
    def decode(bytes: Array[Byte], meta: MediaMeta): Array[Float] = {
      val n = math.min(meta.width * meta.height, 64)
      val s = seedOf(bytes)
      Array.tabulate(n)(i => f(s, i))
    }
    def resize(pixels: Array[Float], meta: MediaMeta,
               w: Int, h: Int): (Array[Float], MediaMeta) = {
      val n = math.min(w * h, 64)
      (Array.tabulate(n)(i => pixels(i % math.max(pixels.length, 1))),
        meta.copy(width = w, height = h))
    }
    /** md5-portable feature: component i = md5_32(payload ++ ":i")
      * mod 2^10 over 2^10 − 0.5. Unlike decode's splitmix stream this
      * is recomputable by the DuckDB oracle (`md5(text || ':' || i)`
      * when the payload is UTF-8 text, as in the qX_multimodal_ann
      * gate), and the dyadic modulus makes every component exact in
      * both float and double — so cross-engine cosine comparisons are
      * bit-stable, not round-to-4 lucky. md5 has full avalanche, so
      * the near-parallel-vector failure mode documented on [[f]] can't
      * occur. */
    def embed(bytes: Array[Byte], dim: Int): Array[Float] = {
      Array.tabulate(dim) { i =>
        // two-argument digest: the payload streams through MD5 once
        // per component with NO payload copy (the naive concat
        // allocates O(dim × payload) per record — real money at the
        // documented 100 TB multimodal scale)
        val suffix = (":" + i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        ((graft.functions.expr.PortableHash.md5_32(bytes, suffix) % 1024L).toDouble
          / 1024.0 - 0.5).toFloat
      }
    }
  }

  /** REAL image codec on the same seam — `javax.imageio` ships with
    * the JDK (PNG + JPEG readers, the reference's exact input contract:
    * README.md:629 accepts jpg/png ≤ 5 MB), so no external library is
    * needed for the image half of the multimodal surface. Grayscale
    * luma decode (ITU-R BT.601 weights), row-major floats in [0, 1];
    * resize is area-box averaging over the float plane; embed is an
    * `gw × gh` block-average pooling of the decoded image — the
    * classic "tiny thumbnail as embedding" baseline, fully
    * deterministic (PNG is lossless and the JDK decoder is
    * deterministic for a given payload), so identical payloads embed
    * identically and the ANN twin contracts hold with REAL decoding.
    *
    * The decoded dimensions come from the BYTES (the image header),
    * not the caller's advisory [[MediaMeta]] — corrupt/undecodable
    * payloads throw rather than silently producing garbage features.
    */
  object ImageIoCodec extends MediaCodec {
    private def read(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      require(img != null, "payload is not a decodable image (png/jpeg)")
      img
    }
    private[operators] def luma(img: java.awt.image.BufferedImage): Array[Float] = {
      val (w, h) = (img.getWidth, img.getHeight)
      val out = new Array[Float](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF
          val b = rgb & 0xFF
          out(y * w + x) =
            (0.299f * r + 0.587f * g + 0.114f * b) / 255f
          x += 1
        }
        y += 1
      }
      out
    }
    def decode(bytes: Array[Byte], meta: MediaMeta): Array[Float] =
      luma(read(bytes))
    /** Dimensions from the image HEADER — the truth the pixels follow;
      * costs a second header parse per record in the decode path
      * (cheap relative to the pixel scan). */
    override def decodedMeta(bytes: Array[Byte], meta: MediaMeta): MediaMeta = {
      val img = read(bytes)
      meta.copy(width = img.getWidth, height = img.getHeight, channels = 1)
    }
    /** Area-box resample of the row-major float plane described by
      * `meta` (which must carry the SOURCE dimensions). */
    def resize(pixels: Array[Float], meta: MediaMeta,
               w: Int, h: Int): (Array[Float], MediaMeta) = {
      val (sw, sh) = (meta.width, meta.height)
      require(sw * sh == pixels.length,
        s"meta ${sw}x$sh does not describe ${pixels.length} pixels")
      val out = new Array[Float](w * h)
      var ty = 0
      while (ty < h) {
        val y0 = ty * sh / h; val y1 = math.max((ty + 1) * sh / h, y0 + 1)
        var tx = 0
        while (tx < w) {
          val x0 = tx * sw / w; val x1 = math.max((tx + 1) * sw / w, x0 + 1)
          var s = 0.0f; var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) { s += pixels(y * sw + x); x += 1 }
            y += 1
          }
          out(ty * w + tx) = s / ((y1 - y0) * (x1 - x0))
          tx += 1
        }
        ty += 1
      }
      (out, meta.copy(width = w, height = h))
    }
    /** Block-average pooled thumbnail as the embedding: the image is
      * resampled to a near-square grid of `dim` cells (gw·gh = dim
      * exactly when dim has a near-square factorization; 1×dim
      * otherwise), centered to [-0.5, 0.5]. */
    def embed(bytes: Array[Byte], dim: Int): Array[Float] = {
      val img = read(bytes)
      val gw = {
        var g = math.sqrt(dim.toDouble).toInt
        while (g > 1 && dim % g != 0) g -= 1
        g
      }
      val gh = dim / gw
      val (pixels, meta) =
        (luma(img), MediaMeta("png", img.getWidth, img.getHeight, 1, 0L))
      val (pooled, _) = resize(pixels, meta, gw, gh)
      pooled.map(_ - 0.5f)
    }
  }

  /** REAL audio codec on the same seam — `javax.sound.sampled` also
    * ships with the JDK (WAV/AIFF/AU PCM readers; decode needs no
    * audio device, so it runs headless in executors). decode() returns
    * the mono mixdown as floats in [-1, 1]; resize() treats the sample
    * stream as a 1×N plane and area-box resamples it to w·h samples
    * (the [[ImageIoCodec]] kernel, reused); embed() is per-window RMS
    * energy over `dim` equal windows — the classic cheap audio
    * fingerprint, deterministic for a given payload. Undecodable
    * payloads throw ([[ImageIoCodec]]'s contract). Only video remains
    * on [[FakeCodec]] (the JDK has no demuxer).
    */
  object WavCodec extends MediaCodec {
    private def samples(bytes: Array[Byte]): Array[Float] = {
      val in = try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        catch { case e: javax.sound.sampled.UnsupportedAudioFileException =>
          throw new IllegalArgumentException(
            "payload is not a decodable audio stream (wav/aiff/au)", e) }
      val fmt = in.getFormat
      // decode only what the bit-twiddling below actually implements:
      // signed 16-bit PCM and signed/unsigned 8-bit PCM. Anything else
      // (mu-law/a-law AU, float WAV, 24/32-bit) throws instead of
      // silently producing sign-flipped or garbage samples — the same
      // undecodable-payload contract as ImageIoCodec.
      import javax.sound.sampled.AudioFormat.Encoding._
      val enc = fmt.getEncoding
      val bits = fmt.getSampleSizeInBits
      val ok = (enc == PCM_SIGNED && (bits == 16 || bits == 8)) ||
        (enc == PCM_UNSIGNED && bits == 8)
      if (!ok) throw new IllegalArgumentException(
        s"unsupported audio encoding $enc/$bits-bit (need 16-bit signed " +
          "or 8-bit signed/unsigned PCM)")
      val raw = in.readAllBytes()
      val ch = fmt.getChannels
      val bytesPerSample = bits / 8
      val frameBytes = bytesPerSample * ch
      val n = raw.length / frameBytes
      val out = new Array[Float](n)
      val big = fmt.isBigEndian
      val signed8 = enc == PCM_SIGNED && bits == 8
      var i = 0
      while (i < n) {
        var acc = 0.0f
        var c = 0
        while (c < ch) {
          val off = i * frameBytes + c * bytesPerSample
          val v = if (bytesPerSample == 2) {
            val (b0, b1) = (raw(off) & 0xFF, raw(off + 1) & 0xFF)
            val s = if (big) (b0 << 8) | b1 else (b1 << 8) | b0
            s.toShort / 32768f
          } else if (signed8) raw(off) / 128f // AIFF's 8-bit is signed
          else (raw(off) & 0xFF) / 128f - 1f  // WAV's 8-bit is unsigned
          acc += v
          c += 1
        }
        out(i) = acc / ch
        i += 1
      }
      out
    }
    def decode(bytes: Array[Byte], meta: MediaMeta): Array[Float] =
      samples(bytes)
    def resize(pixels: Array[Float], meta: MediaMeta,
               w: Int, h: Int): (Array[Float], MediaMeta) = {
      val (p, _) = ImageIoCodec.resize(pixels,
        meta.copy(width = pixels.length, height = 1), w * h, 1)
      (p, meta.copy(width = w, height = h))
    }
    def embed(bytes: Array[Byte], dim: Int): Array[Float] = {
      val s = samples(bytes)
      require(s.nonEmpty, "empty audio stream")
      Array.tabulate(dim) { w =>
        val lo = (w.toLong * s.length / dim).toInt
        val hi = math.max(((w + 1).toLong * s.length / dim).toInt, lo + 1)
        var acc = 0.0
        var i = lo
        while (i < hi) { acc += s(i).toDouble * s(i); i += 1 }
        math.sqrt(acc / (hi - lo)).toFloat
      }
    }
  }

  /** The multi-frame decoder seam — [[GifCodec]] is the real JDK-only
    * implementation; richer demuxers (mp4/webm) plug in here. */
  trait FrameCodec extends Serializable {
    /** Every frame's luma plane in presentation order:
      * (width, height, row-major floats in [0, 1]). */
    def frames(bytes: Array[Byte]): Seq[(Int, Int, Array[Float])]
  }

  /** REAL multi-frame decoder on the JDK alone: `javax.imageio` reads
    * every frame of an animated GIF, so the video seam's frame
    * extraction is genuine decoding — not a byte-slicing stub. Frames
    * are composited onto the logical-screen canvas at each frame's
    * (left, top) offset (GIF streams often encode only the changed
    * sub-rectangle per frame), progressive-overlay style
    * (do-not-dispose, the overwhelmingly common disposal mode;
    * restore-to-background GIFs would need the background fill the
    * spec's disposal table describes). Undecodable payloads throw —
    * [[ImageIoCodec]]'s contract.
    */
  object GifCodec extends FrameCodec {
    private def offsetOf(reader: javax.imageio.ImageReader,
                         k: Int): (Int, Int) = try {
      val root = reader.getImageMetadata(k)
        .getAsTree("javax_imageio_gif_image_1.0")
        .asInstanceOf[org.w3c.dom.Element]
      val nodes = root.getElementsByTagName("ImageDescriptor")
      if (nodes.getLength == 0) (0, 0)
      else {
        val e = nodes.item(0).asInstanceOf[org.w3c.dom.Element]
        (e.getAttribute("imageLeftPosition").toInt,
          e.getAttribute("imageTopPosition").toInt)
      }
    } catch { case _: Exception => (0, 0) }

    private def screenSize(reader: javax.imageio.ImageReader,
                           f0: java.awt.image.BufferedImage): (Int, Int) =
      try {
        val root = reader.getStreamMetadata
          .getAsTree("javax_imageio_gif_stream_1.0")
          .asInstanceOf[org.w3c.dom.Element]
        val lsd = root.getElementsByTagName("LogicalScreenDescriptor").item(0)
          .asInstanceOf[org.w3c.dom.Element]
        (lsd.getAttribute("logicalScreenWidth").toInt,
          lsd.getAttribute("logicalScreenHeight").toInt)
      } catch { case _: Exception => (f0.getWidth, f0.getHeight) }

    def frames(bytes: Array[Byte]): Seq[(Int, Int, Array[Float])] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext,
        "payload is not a decodable multi-frame stream (gif)")
      val reader = readers.next()
      try {
        reader.setInput(iis, false)
        val n = reader.getNumImages(true)
        require(n > 0, "stream holds no frames")
        val f0 = reader.read(0)
        val (cw, ch) = screenSize(reader, f0)
        val canvas = new java.awt.image.BufferedImage(cw, ch,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        (0 until n).map { k =>
          val frame = if (k == 0) f0 else reader.read(k)
          val (lx, ly) = offsetOf(reader, k)
          val g = canvas.createGraphics()
          g.drawImage(frame, lx, ly, null)
          g.dispose()
          (cw, ch, ImageIoCodec.luma(canvas))
        }
      } finally reader.dispose()
    }
  }

  /** Read a directory of media files as (path, length, content) —
    * `binaryFile` source with glob pushdown (A1's pathGlobFilter). */
  def readBinaryFiles(spark: SparkSession, dir: String, glob: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)

  /** Decode: binary → pixel array, one codec instance per partition. */
  def decode(media: Dataset[MediaRecord],
             codec: MediaCodec = FakeCodec): Dataset[DecodedRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val c = codec // one instance per partition (init amortization)
      it.map(m => DecodedRecord(m.id, m.mediaType,
        c.decodedMeta(m.content, m.meta), c.decode(m.content, m.meta)))
    }
  }

  /** Resize decoded media to (w, h); metadata updated in lockstep. */
  def resize(decoded: Dataset[DecodedRecord], w: Int, h: Int,
             codec: MediaCodec = FakeCodec): Dataset[DecodedRecord] = {
    import decoded.sparkSession.implicits._
    decoded.mapPartitions { it =>
      it.map { d =>
        val (p, m) = codec.resize(d.pixels, d.meta, w, h)
        DecodedRecord(d.id, d.mediaType, m, p)
      }
    }
  }

  /** Frame sampling: one row per sampled frame (every `everyN`-th of
    * `frameCount`), payload sliced deterministically from the source
    * bytes (STUB retained as the generator-shape executable spec; the
    * real decoder is [[extractFrames]]). Generator shape: one input
    * row → many output rows, still narrow. */
  def sampleFrames(media: Dataset[MediaRecord], everyN: Int,
                   frameCount: Int): Dataset[FrameRecord] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      (0 until frameCount by everyN).map { fno =>
        val start = if (m.content.isEmpty) 0 else fno % m.content.length
        FrameRecord(m.id, fno, m.content.slice(start, start + 16))
      }
    }
  }

  /** REAL frame extraction: decode every `everyN`-th frame of each
    * multi-frame payload to its luma plane ([[GifCodec]] default —
    * genuine decoding, JDK-only). Same narrow generator shape as
    * [[sampleFrames]]; one codec instance per partition. The emitted
    * meta carries the decoded canvas dimensions (the logical screen,
    * not the caller's advisory dims) and `durationMs` = frame index —
    * the presentation-order key a downstream sampler keys on. */
  def extractFrames(media: Dataset[MediaRecord], everyN: Int = 1,
                    codec: FrameCodec = GifCodec): Dataset[DecodedFrameRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val c = codec // one instance per partition (init amortization)
      it.flatMap { m =>
        c.frames(m.content).zipWithIndex.collect {
          case ((w, h, px), fno) if fno % everyN == 0 =>
            DecodedFrameRecord(m.id, fno,
              m.meta.copy(width = w, height = h, channels = 1,
                durationMs = fno.toLong), px)
        }
      }
    }
  }

  /** Feature extraction: binary → `array<float>` embedding, ready for
    * [[Similarity.bruteForceTopK]] / [[Similarity.lshTopK]]. */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 64,
                      codec: MediaCodec = FakeCodec): Dataset[FeatureRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val c = codec
      it.map(m => FeatureRecord(m.id, c.embed(m.content, dim)))
    }
  }

  // -------------------------------------------------- perceptual hashing

  /** 64-bit difference hash (dHash) of a row-major `w`×`h` pixel plane:
    * bit (y·(w−1) + x) = 1 iff p(x+1, y) > p(x, y). At the classic
    * 9×8 thumbnail this is the standard 64-bit dHash — the cheapest
    * robust image near-dup signature (survives re-encoding, resizing,
    * mild brightness shifts: only the horizontal brightness ORDER
    * matters, not absolute values). */
  def dHash64(pixels: Array[Float], w: Int, h: Int): Long = {
    require((w - 1) * h <= 64, s"dHash plane ${w}x$h exceeds 64 bits")
    var hash = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w - 1) {
        if (pixels(y * w + x + 1) > pixels(y * w + x))
          hash |= (1L << (y * (w - 1) + x))
        x += 1
      }
      y += 1
    }
    hash
  }

  /** Per-image 64-bit dHash over the REAL codec seam: decode (header
    * dims), area-resize to the canonical 9×8 thumbnail, difference
    * hash. Narrow projection — one codec instance per partition, the
    * corpus shuffles (id, hash) pairs only. Feed the result to
    * [[Dedup.hammingBandPairs]] for banded near-dup mining: a
    * web-scale corpus full of re-encoded/resized duplicates rides the
    * same pigeonhole join as SimHash text near-dup.
    * @return DataFrame (id, dhash). */
  def imageDHash(media: Dataset[MediaRecord],
                 codec: MediaCodec = ImageIoCodec): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val c = codec
      it.map { m =>
        val meta = c.decodedMeta(m.content, m.meta)
        val (thumb, _) = c.resize(c.decode(m.content, m.meta), meta, 9, 8)
        (m.id, dHash64(thumb, 9, 8))
      }
    }.toDF("id", "dhash")
  }

  /** 64-bit perceptual hash (pHash) of a row-major 32×32 pixel plane:
    * 2-D DCT-II, take the 8×8 lowest-frequency block, bit (8v + u) = 1
    * iff coefficient (u, v) > the median of the 64 block coefficients
    * (median over the block INCLUDING DC — with exactly 64 values the
    * median is the mean of ranks 32/33, and thresholding strictly
    * above it yields AT MOST 32 set bits — exactly 32 when no
    * coefficients tie at the median, fewer on flat/symmetric images —
    * an approximately balanced signature). Where
    * dHash keys on local brightness ORDER (robust to re-encoding,
    * broken by smoothing), pHash keys on the global low-frequency
    * structure — it survives blur, sharpening, and gamma shifts that
    * perturb neighbor order. Same banding ([[graft.operators.Dedup
    * .hammingBandPairs]]), same 100 TB shape: one narrow decode pass,
    * (id, hash) shuffles.
    */
  def pHash64(pixels: Array[Float], n: Int = 32): Long = {
    require(pixels.length == n * n, s"pHash expects ${n}x$n, got ${pixels.length}")
    // separable DCT-II: rows then columns, only the first 8 output
    // frequencies of each pass are ever used — O(n²·8), not O(n³)
    val cosTab = Array.tabulate(8, n)((k, i) =>
      math.cos((2 * i + 1) * k * math.Pi / (2.0 * n)))
    val rows = Array.ofDim[Double](n, 8) // rows(y)(u) = DCT over x
    var y = 0
    while (y < n) {
      var u = 0
      while (u < 8) {
        var s = 0.0; var x = 0
        while (x < n) { s += pixels(y * n + x) * cosTab(u)(x); x += 1 }
        rows(y)(u) = s
        u += 1
      }
      y += 1
    }
    val block = new Array[Double](64) // block(8v + u) = DCT over y of rows
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0; var yy = 0
        while (yy < n) { s += rows(yy)(u) * cosTab(v)(yy); yy += 1 }
        block(8 * v + u) = s
        u += 1
      }
      v += 1
    }
    val sorted = block.clone(); java.util.Arrays.sort(sorted)
    val median = (sorted(31) + sorted(32)) / 2.0
    var hash = 0L; var b = 0
    while (b < 64) { if (block(b) > median) hash |= (1L << b); b += 1 }
    hash
  }

  /** Per-image 64-bit pHash over the real codec seam (decode →
    * area-resize 32×32 → DCT hash) — the blur/gamma-robust companion
    * of [[imageDHash]]; feed [[graft.operators.Dedup
    * .hammingBandPairs]]. @return DataFrame (id, phash). */
  def imagePHash(media: Dataset[MediaRecord],
                 codec: MediaCodec = ImageIoCodec): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val c = codec
      it.map { m =>
        val meta = c.decodedMeta(m.content, m.meta)
        val (thumb, _) = c.resize(c.decode(m.content, m.meta), meta, 32, 32)
        (m.id, pHash64(thumb))
      }
    }.toDF("id", "phash")
  }

  /** 64-bit audio fingerprint — the waveform's "dHash": split the
    * decoded mono samples into 65 equal windows, mean-square energy
    * per window, bit i = 1 iff e(i+1) > e(i). Keys on the ENERGY
    * ENVELOPE ORDER, which survives the transforms that duplicate
    * audio in a scraped corpus: re-encoding between PCM containers
    * (identical samples), gain changes (energy scales uniformly —
    * exactly for power-of-two gains, order-exactly for any), and mild
    * resampling (window averages move together). Same scale shape as
    * [[imageDHash]]: one narrow decode pass, (id, hash) shuffles,
    * [[graft.operators.Dedup.hammingBandPairs]] banding.
    */
  def audioHash64(samples: Array[Float], windows: Int = 65): Long = {
    val n = samples.length
    if (n < windows) return 0L // too short for an envelope — degenerate
    val e = new Array[Double](windows)
    var w = 0
    while (w < windows) {
      val s0 = w * n / windows; val s1 = (w + 1) * n / windows
      var s = 0.0; var i = s0
      while (i < s1) { val x = samples(i).toDouble; s += x * x; i += 1 }
      e(w) = s / (s1 - s0)
      w += 1
    }
    var hash = 0L; var b = 0
    while (b < windows - 1) {
      if (e(b + 1) > e(b)) hash |= (1L << b)
      b += 1
    }
    hash
  }

  /** Per-clip 64-bit audio fingerprint over the real codec seam
    * (decode → windowed energy hash). @return DataFrame (id, ahash). */
  def audioDHash(media: Dataset[MediaRecord],
                 codec: MediaCodec = WavCodec): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val c = codec
      it.map(m => (m.id, audioHash64(c.decode(m.content, m.meta))))
    }.toDF("id", "ahash")
  }

  /** Per-frame 64-bit dHash over the REAL multi-frame path
    * ([[extractFrames]] — animated GIF via the JDK reader, composited
    * sub-frames): every sampled frame resized to the canonical 9×8
    * thumbnail and difference-hashed. The video face of the perceptual
    * family: clips dedup by their frame-hash SEQUENCES
    * ([[graft.operators.Dedup.frameHammingPairs]]), so re-encoded /
    * re-palettized duplicates match frame-for-frame while different
    * footage doesn't. Narrow per-partition decode; (id, frame_no,
    * hash) shuffles. @return DataFrame (id, frame_no, dhash). */
  def videoDHash(media: Dataset[MediaRecord], everyN: Int = 1,
                 codec: FrameCodec = GifCodec): DataFrame = {
    import media.sparkSession.implicits._
    extractFrames(media, everyN, codec)
      .map { f =>
        val (thumb, _) = ImageIoCodec.resize(f.pixels, f.meta, 9, 8)
        (f.id, f.frameNo, dHash64(thumb, 9, 8))
      }
      .toDF("id", "frame_no", "dhash")
  }

  /** Shot-cut detection over a [[videoDHash]] frame-hash table: a cut
    * is a frame whose dHash sits more than `maxDist` Hamming bits
    * from its predecessor — the keyframe-selection primitive (sample
    * one frame per shot instead of everyN) and the edit-detection
    * signal. One per-clip lag window (clips bound their own frame
    * counts) + a codegen XOR/popcount — no joins, no shuffles beyond
    * the window.
    *
    * @return (id, frame_no) of cut frames, ordered.
    */
  def sceneCuts(frameHashes: DataFrame, maxDist: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("frame_no")
    frameHashes.withColumn("_prev", lag(col("dhash"), 1).over(w))
      .filter(col("_prev").isNotNull &&
        call_function("bit_count",
          col("dhash").bitwiseXOR(col("_prev"))) > maxDist)
      .select(col("id"), col("frame_no"))
      .orderBy("id", "frame_no")
  }

  /** Deterministic synthetic animated GIF: one full-screen 9×8
    * bit-pattern frame per entry of `patterns` (the
    * [[renderBitPatternPng]] layout on a 256-gray indexed palette, so
    * the write→decode round trip is bit-exact and frame k's dHash is
    * an EXACT function of patterns(k)). Progressive mode off — the
    * JDK reader mis-decodes interlaced frames shorter than the 4
    * interlace passes. */
  def renderPatternGif(patterns: Seq[Long]): Array[Byte] = {
    val (w, h) = (9, 8)
    val cmap = (0 until 256).map(i => (0xFF << 24) | (i << 16) | (i << 8) | i).toArray
    val icm = new java.awt.image.IndexColorModel(8, 256, cmap, 0, false, -1,
      java.awt.image.DataBuffer.TYPE_BYTE)
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (pattern <- patterns) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val white = x % 2 == 1 && x < 8 &&
            ((pattern >>> (4 * y + (x - 1) / 2)) & 1L) == 1L
          img.getRaster.setSample(x, y, 0, if (white) 255 else 0)
          x += 1
        }
        y += 1
      }
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null,
        writer.getDefaultImageMetadata(
          new javax.imageio.ImageTypeSpecifier(img), param)), param)
    }
    writer.endWriteSequence(); ios.close(); writer.dispose()
    bos.toByteArray
  }

  /** Deterministic synthetic test WAV: 65 windows of 64 samples of an
    * alternating-sign square wave whose per-window amplitude encodes
    * `pattern` — window 2j+1 is loud (PCM 16384 >> shift) iff bit j of
    * `pattern` is set, every other window quiet (4096 >> shift), so
    * [[audioHash64]] bit (2j) = pattern bit j and all odd bits are 0.
    * Amplitudes are powers of two: `shift` renders an exactly
    * gain-scaled duplicate (the PCM ints halve exactly), and the
    * fingerprint is an EXACT function of `pattern` an external oracle
    * recomputes without decoding audio. */
  def renderPatternWav(pattern: Long, shift: Int = 0): Array[Byte] = {
    val (windows, per) = (65, 64)
    val pcm = new Array[Byte](windows * per * 2)
    var w = 0
    while (w < windows) {
      val amp = (if (w % 2 == 1 && ((pattern >>> ((w - 1) / 2)) & 1L) == 1L)
        16384 else 4096) >> shift
      var s = 0
      while (s < per) {
        val v = if (s % 2 == 0) amp else -amp
        val i = (w * per + s) * 2
        pcm(i) = (v & 0xFF).toByte
        pcm(i + 1) = ((v >> 8) & 0xFF).toByte
        s += 1
      }
      w += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, windows.toLong * per)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic synthetic test image: a 9·scale × 8·scale grayscale
    * PNG whose 9×8 dHash is an EXACT function of `pattern` — for grid
    * cell (x, y), the cell at odd x = 2j+1 is white iff bit (4y + j)
    * of `pattern` is set, every other cell black, so dHash bit
    * (8y + 2j) = pattern bit (4y + j) and all other bits are 0. Lets
    * gates/specs plant images whose hashes an external oracle computes
    * from `pattern` alone — no image decoding on the oracle side. */
  def renderBitPatternPng(pattern: Long, scale: Int,
                          level: Int = 255): Array[Byte] = {
    val (w, h) = (9 * scale, 8 * scale)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (level << 16) | (level << 8) | level
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (cx, cy) = (x / scale, y / scale)
        val white = cx % 2 == 1 && cx < 8 &&
          ((pattern >>> (4 * cy + (cx - 1) / 2)) & 1L) == 1L
        img.setRGB(x, y, if (white) rgb else 0x000000)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
