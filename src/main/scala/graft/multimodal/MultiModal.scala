package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** A media row: opaque binary payload + typed metadata columns.
  * Real container formats (PNG/JPEG/GIF/WAV) are detected by magic bytes;
  * synthetic payloads may instead carry the legacy 8-byte graft header
  * (be16 width, be16 height, be32 sampleRate) followed by the body.
  */
case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

case class MediaMeta(width: Int, height: Int, sample_rate: Int, n_bytes: Int)

case class DecodedMedia(media_id: Long, kind: String, payload: Array[Byte],
  width: Int, height: Int, sample_rate: Int, n_bytes: Int)

/** Multimodal-column plumbing (north star, SURVEY.md §2 category checklist):
  * image/audio/video as opaque `binary` columns with typed metadata.
  *
  * The *metadata* path is real: `decodeMeta` parses genuine PNG / JPEG /
  * GIF / BMP / WAV container headers in pure JVM code (magic bytes + the
  * format's own dimension/sample-rate fields — no codec library needed),
  * falling back to the legacy 8-byte graft header for synthetic payloads.
  * Pixel/sample decoding is real for EVERY container the classifier knows:
  * 24-bit BMP rasters decode arithmetically (`decodeBmp`); compressed
  * PNG / JPEG / GIF decode through the JDK's own `javax.imageio` codecs
  * (`decodeImage` — shipped with every JRE, headless-safe, zero new
  * dependencies); both feed the true nearest-neighbour resize. 16-bit PCM
  * WAV decodes to samples (`pcmSamples`) with per-frame RMS features.
  * Everything Spark-side is real and tested: the schema, the per-partition
  * batch iteration shape (the Scala analogue of `mapInPandas` — one
  * iterator per partition, setup amortized per batch, never per row),
  * narrow no-shuffle execution, and partition preservation.
  */
object MultiModal {

  /** One classifier for both kind and metadata, so they can never disagree:
    * a payload is only "png"/"jpeg"/"gif"/"wav" when the same structural
    * preconditions the parser needs actually hold (signature AND enough
    * bytes for the dimension fields). Truncated or malformed containers
    * degrade to ("raw", MediaMeta(0,0,0,n)) — one corrupt payload must
    * never throw and kill a whole decode task at scale.
    *   - PNG  — 8-byte signature + IHDR chunk's be32 width/height
    *   - JPEG — walk marker segments to the first SOFn frame header
    *   - GIF  — GIF87a/GIF89a logical-screen le16 width/height
    *   - WAV  — RIFF/WAVE chunk walk to `fmt `'s le32 sample rate
    * Unrecognized payloads fall back to the legacy 8-byte graft header
    * (be16 w, be16 h, be32 rate) used by synthetic fixtures.
    */
  private def classify(payload: Array[Byte]): (String, MediaMeta) = {
    val n = payload.length
    def u8(i: Int) = payload(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def tag(i: Int, s: String) =
      i >= 0 && n >= i + s.length &&
        s.indices.forall(j => payload(i + j) == s.charAt(j).toByte)

    // A container *signature* (first bytes) vs a *parseable* container: a
    // payload whose STRONG signature (≥6 bytes: PNG / GIF / RIFF+WAVE)
    // matches but whose structure doesn't parse is classified ("raw",
    // zeros) — never the legacy-header fallback, which would read garbage
    // dimensions out of the signature bytes themselves. The 2-byte
    // signatures ("BM", FF D8) are AMBIGUOUS with a legacy graft header
    // whose be16 width happens to be 0x424D or 0xFFD8 — for those, fall
    // through to the legacy parse ONLY when the payload cannot be the real
    // container: a real JPEG always has a 0xFF marker byte at offset 2
    // (a truncated photo must degrade to zeros, not to garbage legacy
    // dimensions), and a real BMP is at least its 54-byte header (shorter
    // BM-prefixed payloads can only be legacy fixtures).
    val strongSignature =
      (n >= 8 && be32(0) == 0x89504e47 && be32(4) == 0x0d0a1a0a) ||
        tag(0, "GIF87a") || tag(0, "GIF89a") ||
        (tag(0, "RIFF") && tag(8, "WAVE")) ||
        (n >= 3 && u8(0) == 0xff && u8(1) == 0xd8 && u8(2) == 0xff) ||
        (n >= 54 && tag(0, "BM"))

    val parsed: Option[(String, MediaMeta)] =
      if (n >= 24 && be32(0) == 0x89504e47 && be32(4) == 0x0d0a1a0a && tag(12, "IHDR"))
        Some("png" -> MediaMeta(be32(16), be32(20), 0, n))
      else if (n >= 54 && tag(0, "BM")) {
        // same parsed-or-raw contract as the other containers: any
        // structurally valid DIB with a standard bit depth is "bmp" — the
        // dimension fields don't depend on the pixel format, and the
        // ImageIO decode path handles more than the arithmetic 24-bit one,
        // so kind/metadata must not be narrower than pixel decode (height
        // may be negative = top-down; report magnitude)
        val w = le32(18); val h = le32(22)
        val bpp = le16(28)
        if (Set(1, 4, 8, 16, 24, 32)(bpp) && w > 0 && h != 0 &&
            w <= (1 << 24) && math.abs(h) <= (1 << 24))
          Some("bmp" -> MediaMeta(w, math.abs(h), 0, n))
        else None
      }
      else if (n >= 11 && u8(0) == 0xff && u8(1) == 0xd8) {
        var i = 2
        var out: Option[MediaMeta] = None
        while (out.isEmpty && i + 3 < n && u8(i) == 0xff) {
          val m = u8(i + 1)
          if (m == 0xff) i += 1 // fill byte
          else if ((m >= 0xd0 && m <= 0xd9) || m == 0x01) i += 2 // standalone marker
          else {
            // SOFn (C0-CF minus C4/C8/CC) carries be16 height @+5, width @+7
            val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
            if (isSof && i + 8 < n) out = Some(MediaMeta(be16(i + 7), be16(i + 5), 0, n))
            else i += 2 + be16(i + 2)
          }
        }
        out.map("jpeg" -> _)
      } else if (n >= 10 && (tag(0, "GIF87a") || tag(0, "GIF89a")))
        Some("gif" -> MediaMeta(le16(6), le16(8), 0, n))
      else if (tag(0, "RIFF") && tag(8, "WAVE")) {
        // Long cursor: a hostile le32 chunk size (e.g. 0x7FFFFFF0) would
        // overflow an Int cursor negative and index out of bounds.
        var i = 12L
        var rate = 0
        while (rate == 0 && i + 8 <= n) {
          val sz = le32(i.toInt + 4).toLong & 0xffffffffL
          if (tag(i.toInt, "fmt ") && i + 16 <= n) rate = le32(i.toInt + 12)
          i += 8 + sz + (sz & 1) // chunks are word-aligned
        }
        if (rate != 0) Some("wav" -> MediaMeta(0, 0, rate, n)) else None
      } else None

    parsed.getOrElse {
      if (strongSignature || n < 8) "raw" -> MediaMeta(0, 0, 0, n)
      else "raw" -> MediaMeta(be16(0), be16(2), be32(4), n) // legacy graft header
    }
  }

  /** Parse container metadata (see [[classify]]); total — malformed input
    * degrades to MediaMeta(0,0,0,n) rather than throwing.
    */
  def decodeMeta(payload: Array[Byte]): MediaMeta =
    try classify(payload)._2
    catch { case _: RuntimeException => MediaMeta(0, 0, 0, payload.length) }

  /** Container detection — same classifier as [[decodeMeta]], so the kind
    * label and the parsed metadata always agree.
    */
  def detectKind(payload: Array[Byte]): String =
    try classify(payload)._1
    catch { case _: RuntimeException => "raw" }

  /** Decoded raster: row-major top-down RGB, 3 bytes per pixel. */
  case class RgbImage(width: Int, height: Int, rgb: Array[Byte])

  /** REAL pixel decode for uncompressed 24-bit BMP (BI_RGB): pure
    * arithmetic over the container bytes, no codec library. Rows are
    * stored BGR with 4-byte padding — bottom-up for positive biHeight,
    * top-down for negative (standard Windows DIB); we emit top-down RGB
    * either way. Compressed formats (PNG/JPEG/GIF) decode through
    * [[decodeImage]]'s JDK codecs.
    */
  def decodeBmp(payload: Array[Byte]): Option[RgbImage] = try {
    def u8(i: Int) = payload(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    if (payload.length < 54 || payload(0) != 'B' || payload(1) != 'M') None
    else {
      val off = le32(10); val w = le32(18); val rawH = le32(22)
      val bpp = le16(28); val comp = le32(30)
      val h = math.abs(rawH)
      val topDown = rawH < 0
      val stride = (w * 3 + 3) & ~3
      if (bpp != 24 || comp != 0 || w <= 0 || h <= 0 || off < 54 ||
          off.toLong + stride.toLong * h > payload.length) None
      else {
        val out = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          val src = off + (if (topDown) y else h - 1 - y) * stride
          var x = 0
          while (x < w) {
            out((y * w + x) * 3) = payload(src + x * 3 + 2)     // R
            out((y * w + x) * 3 + 1) = payload(src + x * 3 + 1) // G
            out((y * w + x) * 3 + 2) = payload(src + x * 3)     // B
            x += 1
          }
          y += 1
        }
        Some(RgbImage(w, h, out))
      }
    }
  } catch { case _: RuntimeException => None }

  /** REAL pixel decode for every known raster container: uncompressed
    * 24-bit BMP arithmetically ([[decodeBmp]] — no library at all), and
    * compressed PNG / JPEG / GIF through the JDK's built-in
    * `javax.imageio` codecs — part of every JRE (headless-safe), so this
    * adds zero dependencies. Total: undecodable payloads yield None, never
    * an exception that would kill a whole decode task at scale.
    */
  def decodeImage(payload: Array[Byte]): Option[RgbImage] =
    decodeBmp(payload).orElse(try {
      // memory-backed explicitly: ImageIO.createImageInputStream defaults
      // to a FILE-cached stream, which would create and delete a temp file
      // per row inside executor tasks
      val in = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val img = javax.imageio.ImageIO.read(in)
        if (img == null) None
        else {
          val w = img.getWidth; val h = img.getHeight
          if (w <= 0 || h <= 0 || w.toLong * h * 3 > Int.MaxValue) None
          else {
            val out = new Array[Byte](w * h * 3)
            val px = new Array[Int](w)
            var y = 0
            while (y < h) {
              img.getRGB(0, y, w, 1, px, 0, w)
              var x = 0
              while (x < w) {
                val p = px(x); val d = (y * w + x) * 3
                out(d) = ((p >> 16) & 0xff).toByte
                out(d + 1) = ((p >> 8) & 0xff).toByte
                out(d + 2) = (p & 0xff).toByte
                x += 1
              }
              y += 1
            }
            Some(RgbImage(w, h, out))
          }
        }
      } finally {
        // ImageIO.read(ImageInputStream) closes the stream on a successful
        // read but NOT when it returns null — close idempotently either way
        try if (in != null) in.close()
        catch { case _: java.io.IOException => () }
      }
    } catch { case _: Exception => None })

  /** Encode an [[RgbImage]] as an uncompressed 24-bit BMP. */
  def encodeBmp(img: RgbImage): Array[Byte] = {
    val stride = (img.width * 3 + 3) & ~3
    val size = 54 + stride * img.height
    val b = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    b.putInt(40).putInt(img.width).putInt(img.height).putShort(1).putShort(24)
    b.putInt(0).putInt(stride * img.height).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = img.height - 1
    while (y >= 0) {
      var x = 0
      while (x < img.width) {
        val p = (y * img.width + x) * 3
        b.put(img.rgb(p + 2)).put(img.rgb(p + 1)).put(img.rgb(p))
        x += 1
      }
      var pad = stride - img.width * 3
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      y -= 1
    }
    b.array()
  }

  /** REAL nearest-neighbour resample of a decoded raster. */
  def resizeRgb(img: RgbImage, w2: Int, h2: Int): RgbImage = {
    val out = new Array[Byte](w2 * h2 * 3)
    var y = 0
    while (y < h2) {
      val sy = (y.toLong * img.height / h2).toInt
      var x = 0
      while (x < w2) {
        val sx = (x.toLong * img.width / w2).toInt
        val s = (sy * img.width + sx) * 3
        val d = (y * w2 + x) * 3
        out(d) = img.rgb(s); out(d + 1) = img.rgb(s + 1); out(d + 2) = img.rgb(s + 2)
        x += 1
      }
      y += 1
    }
    RgbImage(w2, h2, out)
  }

  /** 64-bit difference hash (dHash) of a decoded raster — the standard
    * perceptual image fingerprint (Krawetz, *Kind of Like That*,
    * hackerfactor.com 2013; the gradient variant of Zauner's pHash
    * family): nearest-neighbour resample to 9×8, integer ITU-R 601 luma
    * (299·R + 587·G + 114·B — no float, so the hash is bit-stable across
    * JVMs), bit(y·8 + x) = luma(x+1, y) > luma(x, y). Gradient
    * comparisons make the hash invariant to uniform brightness shifts and
    * to container/codec differences that preserve pixels; near-duplicate
    * images land within a small Hamming distance. Pure arithmetic on the
    * decoded raster — runs inside the same per-partition batch loop as
    * the other extractors.
    */
  def dhash64(img: RgbImage): Long = {
    val g = resizeRgb(img, 9, 8)
    def luma(x: Int, y: Int): Int = {
      val p = (y * 9 + x) * 3
      299 * (g.rgb(p) & 0xff) + 587 * (g.rgb(p + 1) & 0xff) +
        114 * (g.rgb(p + 2) & 0xff)
    }
    var bits = 0L
    var idx = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (luma(x + 1, y) > luma(x, y)) bits |= 1L << idx
        idx += 1; x += 1
      }
      y += 1
    }
    bits
  }

  /** Minimal deterministic VIDEO container ("GVID"): magic + LE u16
    * width/height/frame-count, then raw 24-bit RGB rasters back-to-back.
    * Real video codecs aren't in this container (the brief's documented
    * stub point) — but the SPARK-side shape this feeds is the real one:
    * an opaque binary column, per-partition sequential decode, frame
    * SAMPLING that seeks straight to the k-th frame offset (width ×
    * height × 3 × k) without touching the frames in between — exactly
    * the property container-aware frame extraction relies on at 100 TB.
    */
  def encodeGvid(frames: Seq[RgbImage]): Array[Byte] = {
    require(frames.nonEmpty && frames.forall(f =>
      f.width == frames.head.width && f.height == frames.head.height),
      "GVID frames must share dimensions")
    val w = frames.head.width; val h = frames.head.height
    val b = java.nio.ByteBuffer.allocate(10 + frames.length * w * h * 3)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("GVID".getBytes("US-ASCII"))
      .putShort(w.toShort).putShort(h.toShort).putShort(frames.length.toShort)
    frames.foreach(f => b.put(f.rgb))
    b.array()
  }

  /** Sample every `stride`-th frame (0, stride, 2·stride, …) by direct
    * offset seek — O(sampled), not O(total frames). Returns
    * (frame_idx, raster); empty on a non-GVID payload (corrupt media is
    * data, not a job failure — the malformed-record policy). */
  def sampleGvidFrames(payload: Array[Byte], stride: Int): Seq[(Int, RgbImage)] = try {
    require(stride >= 1)
    if (payload.length < 10 ||
      new String(payload.slice(0, 4), "US-ASCII") != "GVID") return Seq.empty
    def le16(i: Int) = (payload(i) & 0xff) | ((payload(i + 1) & 0xff) << 8)
    val w = le16(4); val h = le16(6); val n = le16(8)
    val fsz = w * h * 3
    (0 until n by stride).flatMap { k =>
      val off = 10 + k * fsz
      if (off + fsz <= payload.length)
        Some(k -> RgbImage(w, h, payload.slice(off, off + fsz)))
      else None
    }
  } catch { case _: Exception => Seq.empty }

  /** 32-bit audio energy fingerprint — the dhash64 idea on the time axis
    * (the energy-difference family behind Haitsma & Kalker's *Highly
    * Robust Audio Fingerprinting System*, ISMIR 2002, §III, reduced to
    * one band): the PCM stream splits into up to 33 frames of 64 samples,
    * per-frame energy Σs² accumulates EXACTLY in a Long (no float, no
    * sqrt — bit-stable), bit i = energy(i+1) > energy(i). Uniform gain
    * scales every energy by k², so comparisons — and the fingerprint —
    * are amplitude-invariant; a local edit flips only the bits at its
    * frame boundaries. Returns 0L when fewer than two frames exist.
    */
  def audioFp32(samples: Array[Short]): Long = {
    val seg = 64
    val nseg = math.min(33, samples.length / seg)
    if (nseg < 2) return 0L
    val e = new Array[Long](nseg)
    var j = 0
    while (j < nseg) {
      var acc = 0L
      var i = j * seg
      val end = i + seg
      while (i < end) { val v = samples(i).toLong; acc += v * v; i += 1 }
      e(j) = acc; j += 1
    }
    var bits = 0L
    var i = 0
    while (i < nseg - 1) {
      if (e(i + 1) > e(i)) bits |= 1L << i
      i += 1
    }
    bits
  }

  /** REAL sample decode for 16-bit PCM WAV: the `data` chunk is just
    * interleaved little-endian shorts. Returns None unless fmt says
    * uncompressed (audioFormat=1) 16-bit.
    */
  def pcmSamples(payload: Array[Byte]): Option[Array[Short]] = try {
    val n = payload.length
    def u8(i: Int) = payload(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32l(i: Int) = (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)).toLong & 0xffffffffL
    def tag(i: Long, s: String) =
      i >= 0 && n >= i + s.length &&
        s.indices.forall(j => payload(i.toInt + j) == s.charAt(j).toByte)
    if (!(tag(0, "RIFF") && tag(8, "WAVE"))) None
    else {
      var i = 12L
      var fmtOk = false
      var out: Option[Array[Short]] = None
      while (out.isEmpty && i + 8 <= n) {
        val sz = le32l(i.toInt + 4)
        if (tag(i, "fmt ") && i + 24 <= n)
          fmtOk = le16(i.toInt + 8) == 1 && le16(i.toInt + 22) == 16
        else if (tag(i, "data") && fmtOk) {
          val count = math.min(sz, (n - i - 8)) / 2
          val arr = new Array[Short](count.toInt)
          var k = 0
          while (k < arr.length) { arr(k) = le16(i.toInt + 8 + k * 2).toShort; k += 1 }
          out = Some(arr)
        }
        i += 8 + sz + (sz & 1)
      }
      out
    }
  } catch { case _: RuntimeException => None }

  /** Per-frame RMS amplitude over the decoded PCM samples — the shape of
    * any real audio feature extractor (normalized to [0, 1]).
    */
  def audioRms(payload: Array[Byte], frames: Int): Option[Array[Double]] =
    pcmSamples(payload).filter(_ => frames > 0).map { s =>
      if (s.isEmpty) Array.fill(frames)(0.0)
      else {
        val sz = math.max(1, s.length / frames)
        (0 until frames).map { f =>
          val from = f * sz
          val to = if (f == frames - 1) s.length else math.min((f + 1) * sz, s.length)
          if (from >= to) 0.0
          else {
            var acc = 0.0
            var k = from
            while (k < to) { val v = s(k) / 32768.0; acc += v * v; k += 1 }
            math.sqrt(acc / (to - from))
          }
        }.toArray
      }
    }

  /** Encode the legacy 8-byte graft header (synthetic fixtures and the
    * non-raster resize fallback). */
  def encodeHeader(width: Int, height: Int, sampleRate: Int): Array[Byte] =
    Array[Byte](
      ((width >> 8) & 0xff).toByte, (width & 0xff).toByte,
      ((height >> 8) & 0xff).toByte, (height & 0xff).toByte,
      ((sampleRate >> 24) & 0xff).toByte, ((sampleRate >> 16) & 0xff).toByte,
      ((sampleRate >> 8) & 0xff).toByte, (sampleRate & 0xff).toByte)

  /** Decode metadata for every row — per-partition batch shape: the decoder
    * (in real life: a codec context, a model handle) is constructed once
    * per partition, then streamed over the iterator. Narrow: no shuffle.
    */
  def withDecodedMeta(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    implicit val enc = Encoders.product[DecodedMedia]
    media.mapPartitions { it =>
      // per-partition setup point (codec/context init — the JDK ImageIO
      // registry is JVM-global, so nothing to construct here)
      it.map { r =>
        val m = decodeMeta(r.payload)
        DecodedMedia(r.media_id, r.kind, r.payload, m.width, m.height, m.sample_rate, m.n_bytes)
      }
    }
  }

  /** Real (non-stub) feature extraction: 256-bin byte histogram per payload
    * — the shape of any per-item feature extractor (embedding, spectrogram).
    */
  val byteHistogram = udf { payload: Array[Byte] =>
    val h = new Array[Long](256)
    var i = 0
    while (i < payload.length) { h(payload(i) & 0xff) += 1L; i += 1 }
    h
  }

  /** Frame sampling: split the body (after the 8-byte header) into `n`
    * contiguous frames — array-of-binary out, one row in. Real slicing;
    * the last frame extends to the end of the body so no trailing bytes
    * are dropped.
    */
  def frameSample(n: Int) = udf { payload: Array[Byte] =>
    val body = payload.drop(8)
    if (body.isEmpty || n <= 0) Array.empty[Array[Byte]]
    else {
      val sz = math.max(1, body.length / n)
      (0 until n).map { i =>
        val end = if (i == n - 1) body.length else math.min((i + 1) * sz, body.length)
        body.slice(i * sz, end)
      }.toArray
    }
  }

  /** Resize: REAL nearest-neighbour resample for every decodable raster
    * (BMP arithmetically, PNG/JPEG/GIF via [[decodeImage]]'s JDK codecs),
    * re-encoded as uncompressed 24-bit BMP — a deterministic byte layout,
    * unlike the JDK's PNG writer whose chunking may vary across versions.
    * Non-raster payloads (audio, synthetic fixtures) keep the deterministic
    * header-rewrite fallback — truncate/cycle the body to w*h bytes — so
    * the dataflow stays total. The encode side validates allocation sizes
    * before touching memory: a hostile target (or source) dimension must
    * degrade to the fallback, not overflow Int and kill the decode task.
    */
  def resize(w: Int, h: Int) = udf { payload: Array[Byte] =>
    val fitsRaster = w > 0 && h > 0 &&
      w.toLong * h * 3 <= Int.MaxValue &&                   // resizeRgb raster
      ((w.toLong * 3 + 3) & ~3L) * h + 54 <= Int.MaxValue   // encodeBmp stride
    (if (fitsRaster) decodeImage(payload) else None) match {
      case Some(img) => encodeBmp(resizeRgb(img, w, h))
      case None =>
        val body = payload.drop(8)
        val target = // clamped: a hostile w×h must not overflow the Int
          // allocation (crash) or balloon a per-row buffer (OOM) — legit
          // fallback fixtures are tiny, so cap the synthetic body at 64 MiB
          if (w <= 0 || h <= 0) 0
          else math.min(w.toLong * h, 1L << 26).toInt
        val out = new Array[Byte](target)
        var i = 0
        while (i < target && body.nonEmpty) { out(i) = body(i % body.length); i += 1 }
        // the legacy header packs w/h as big-endian 16-bit: clamp so a
        // >65535 target reports 65535 instead of silently wrapping (e.g.
        // w=70000 would read back as 4464); the body is capped separately
        encodeHeader(math.max(0, math.min(w, 0xFFFF)),
          math.max(0, math.min(h, 0xFFFF)), decodeMeta(payload).sample_rate) ++ out
    }
  }

  /** Per-frame RMS as a column (null for non-PCM payloads). */
  def audioRmsCol(frames: Int) = udf { payload: Array[Byte] =>
    audioRms(payload, frames).orNull
  }

  /** Column-level convenience: metadata decode + histogram + frame stats +
    * audio features in one narrow select over a DataFrame with a binary
    * `payload` column.
    */
  def enrich(df: DataFrame, frames: Int = 4): DataFrame =
    df.withColumn("hist", byteHistogram(col("payload")))
      .withColumn("frames", frameSample(frames)(col("payload")))
      .withColumn("rms", audioRmsCol(frames)(col("payload")))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
}
