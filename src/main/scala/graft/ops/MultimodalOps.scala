package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque media asset: binary payload + typed metadata. Image/audio/
  * video payloads are carried as `binary` columns with metadata the
  * pipeline can partition/filter on without decoding.
  */
case class MediaAsset(
    doc_id: Long,
    format: String,
    width: Int,
    height: Int,
    content: Array[Byte])

/** Decoded per-asset features (see [[MultimodalOps.extractFeatures]]):
  * decoded dimensions (pixels for images; frames×channels for audio),
  * a rolling payload checksum, a 16-bin normalized histogram (pixel
  * luminance / PCM amplitude), and an 8-d embedding derived from it.
  */
case class MediaFeatures(
    doc_id: Long,
    format: String,
    byte_len: Int,
    dec_width: Int,
    dec_height: Int,
    checksum: Long,
    histogram: Array[Double],
    embedding: Array[Float])

/** 64-bit perceptual fingerprint emitted by
  * [[MultimodalOps.perceptualHashes]].
  */
case class MediaHash(doc_id: Long, format: String, phash: Long)

/** Multimodal-column plumbing: treat image/audio/video as opaque
  * `binary` columns with typed metadata, decode/feature-extract in
  * partition-sized batches with REAL codecs — `javax.imageio` for
  * PNG/JPEG (deterministic seeded render → encode → decode → pixel
  * luminance histogram) and RIFF/PCM for WAV (header write/parse +
  * amplitude histogram). No image/audio libraries beyond the JDK.
  *
  * Scale notes: payload bytes never hit the driver; synthesis and
  * decode both run `mapPartitions` so per-partition codec setup is
  * amortized the way an Arrow-batched Pandas UDF would be in PySpark;
  * features are a narrow projection so downstream aggregation shuffles
  * only small rows.
  */
object MultimodalOps {

  // ImageIO defaults to a disk-backed stream cache (a temp file per
  // encode/decode) — in-memory is strictly better for byte-array IO
  // and avoids /tmp contention across executor threads.
  ImageIO.setUseCache(false)

  /** Lift documents into binary assets (stand-in for `binaryFile`
    * sources); format/width/height are deterministic metadata and the
    * payload is the utf8 text — the oracle-mirrorable metadata path
    * (q60). For real codec payloads see [[synthesizeMedia]].
    */
  def assetsFromDocuments(docs: DataFrame): Dataset[MediaAsset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(
        col("doc_id"),
        element_at(array(lit("png"), lit("jpeg"), lit("wav")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format"),
        (pmod(col("doc_id"), lit(7)) * 64 + 64).cast("int").as("width"),
        (pmod(col("doc_id"), lit(5)) * 64 + 64).cast("int").as("height"),
        encode(col("text"), "UTF-8").as("content"))
      .as[MediaAsset]
  }

  /** Executor-side media-file writer: each asset's payload lands as a
    * real `doc_<id>_<w>x<h>.<format>` file under `dir` through the
    * Hadoop FileSystem API (local path, HDFS, or object store alike) —
    * payload bytes never touch the driver. The inverse of
    * [[readMediaAssets]]; together they close the loop between "codec
    * plumbing" and a real on-disk media corpus.
    */
  def writeMediaFiles(assets: Dataset[MediaAsset], dir: String): Unit = {
    // ship the SESSION's hadoop conf to executors (as a plain Map —
    // Configuration isn't serializable): a bare new Configuration()
    // would drop spark.hadoop.* settings like object-store credentials
    val confMap = {
      val c = assets.sparkSession.sparkContext.hadoopConfiguration
      val it = c.iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
      b.result()
    }
    assets.foreachPartition { (it: Iterator[MediaAsset]) =>
      val conf = new org.apache.hadoop.conf.Configuration(false)
      confMap.foreach { case (k, v) => conf.set(k, v) }
      val base = new org.apache.hadoop.fs.Path(dir)
      val fs = base.getFileSystem(conf)
      fs.mkdirs(base)
      it.foreach { a =>
        val p = new org.apache.hadoop.fs.Path(base,
          s"doc_${a.doc_id}_${a.width}x${a.height}.${a.format}")
        val out = fs.create(p, true)
        try out.write(a.content) finally out.close()
      }
    }
  }

  /** SURVEY §2.1 S5 at its real destination: ingest a media directory
    * through Spark's `binaryFile` source (distributed file listing +
    * content read, split across executors by
    * `spark.sql.files.maxPartitionBytes` like any other scan) and
    * recover the typed metadata from the file names written by
    * [[writeMediaFiles]]. Non-matching files are skipped — a media
    * drop-zone always carries strays — and the name-derived fields are
    * parsed only after the pattern filter so ANSI casts can't throw.
    */
  def readMediaAssets(spark: SparkSession, path: String): Dataset[MediaAsset] = {
    import spark.implicits._
    val re = "doc_(\\d+)_(\\d+)x(\\d+)\\.([a-z0-9]+)$"
    spark.read.format("binaryFile").load(path)
      .filter(col("path").rlike(re))
      .select(
        regexp_extract(col("path"), re, 1).cast("long").as("doc_id"),
        regexp_extract(col("path"), re, 4).as("format"),
        regexp_extract(col("path"), re, 2).cast("int").as("width"),
        regexp_extract(col("path"), re, 3).cast("int").as("height"),
        col("content"))
      .as[MediaAsset]
  }

  /** Real-media synthesis: replace each asset's payload with an actual
    * encoded PNG / JPEG / WAV generated deterministically from
    * (doc_id, width, height). Distributed per-partition — the encoder
    * never leaves the executor.
    */
  def synthesizeMedia(assets: Dataset[MediaAsset]): Dataset[MediaAsset] = {
    val spark = assets.sparkSession
    import spark.implicits._
    // Codec work is CPU-bound but the metadata input is tiny (one scan
    // partition for thousands of assets) — spread it across the cluster
    // before encoding or the whole stage runs on one core.
    assets
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions(_.map(encodeOne))
  }

  /** Partition-batched REAL decode: `ImageIO.read` for png/jpeg,
    * RIFF/PCM parse for wav.
    */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(_.map(decodeOne))
  }

  /** WAV frame count is deterministic metadata math (kept small so a
    * 100 TB corpus of assets stays payload-bounded, not frame-bounded).
    */
  def wavFrames(docId: Long, width: Int, height: Int): Int =
    4096 + (docId % 5).toInt * 1024

  // ---- shared ImageIO edges ----

  private def readImage(a: MediaAsset): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(a.content))
    require(img != null, s"undecodable ${a.format} payload (doc ${a.doc_id})")
    img
  }

  private def writeImage(img: BufferedImage, format: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, format, bos),
      s"no $format ImageIO writer on this JVM")
    bos.toByteArray
  }

  // ---- encode ----

  private def encodeOne(a: MediaAsset): MediaAsset = a.format match {
    case "png" | "jpeg" =>
      a.copy(content =
        writeImage(renderImage(a.doc_id, a.width, a.height), a.format))
    case "wav" =>
      a.copy(content =
        encodeWav(a.doc_id, wavFrames(a.doc_id, a.width, a.height)))
    case other => sys.error(s"unknown media format: $other")
  }

  /** Deterministic seeded render: smooth gradients + a doc_id-keyed
    * xor pattern (structured enough that JPEG survives it; no RNG so
    * re-synthesis is bit-stable for PNG and encoder-stable for JPEG).
    */
  private def renderImage(docId: Long, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val seed = (docId * 0x9e3779b9L & 0xff).toInt
    // bulk row writes: per-pixel setRGB pays a color-model conversion
    // and bounds check per call, ~5x slower than a raster row store
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      val g = (y * 255 / h + (seed >> 1)) & 0xff
      var x = 0
      while (x < w) {
        val r = (x * 255 / w + seed) & 0xff
        val b = ((x ^ y) + seed) & 0xff
        row(x) = (r << 16) | (g << 8) | b
        x += 1
      }
      img.setRGB(0, y, w, 1, row, 0, w)
      y += 1
    }
    img
  }

  /** Minimal-but-real RIFF/WAVE writer: 44-byte canonical header +
    * 16-bit mono PCM sine sweep keyed by doc_id at 8 kHz.
    */
  private def encodeWav(docId: Long, frames: Int): Array[Byte] = {
    val sampleRate = 8000
    val dataLen = frames * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1.toShort)            // PCM
    buf.putShort(1.toShort)            // mono
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2)         // byte rate
    buf.putShort(2.toShort)            // block align
    buf.putShort(16.toShort)           // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    val freq = 200.0 + (docId % 40) * 25.0
    var i = 0
    while (i < frames) {
      val s = math.sin(2.0 * math.Pi * freq * i / sampleRate) * 12000.0
      buf.putShort(s.toShort)
      i += 1
    }
    buf.array()
  }

  /** Real image resize: decode → bilinear-scale so the longest side is
    * `maxDim` (aspect preserved, never upscaled) → re-encode in the
    * same format, metadata updated to the new dims. Audio passes
    * through untouched. The standard normalize-before-training step
    * for an image corpus; per-partition like the other codec stages.
    */
  def resizeImages(assets: Dataset[MediaAsset], maxDim: Int): Dataset[MediaAsset] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(_.map {
      case a if a.format == "png" || a.format == "jpeg" => resizeOne(a, maxDim)
      case a => a
    })
  }

  private def resizeOne(a: MediaAsset, maxDim: Int): MediaAsset = {
    val img = readImage(a)
    val (w, h) = (img.getWidth, img.getHeight)
    val scale = maxDim.toDouble / math.max(w, h)
    if (scale >= 1.0) a
    else {
      val (nw, nh) = (math.max(1, math.round(w * scale).toInt),
        math.max(1, math.round(h * scale).toInt))
      // preserve transparency for formats that carry it (JPEG can't
      // encode alpha, and compositing ARGB onto an RGB target would
      // silently flatten transparent pixels to black)
      val targetType =
        if (a.format != "jpeg" && img.getColorModel.hasAlpha)
          BufferedImage.TYPE_INT_ARGB
        else BufferedImage.TYPE_INT_RGB
      val out = new BufferedImage(nw, nh, targetType)
      val g = out.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, nw, nh, null)
      g.dispose()
      MediaAsset(a.doc_id, a.format, nw, nh, writeImage(out, a.format))
    }
  }

  /** Real audio frame-sampling: decimate PCM to every `everyN`-th frame
    * and re-encode the RIFF container (the video analogue — keyframe
    * sampling — has the same shape: parse container, keep 1/N frames,
    * rewrite). Images pass through untouched.
    */
  def sampleFrames(assets: Dataset[MediaAsset], everyN: Int): Dataset[MediaAsset] = {
    val spark = assets.sparkSession
    import spark.implicits._
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    assets.mapPartitions(_.map {
      case a if a.format == "wav" => sampleWavOne(a, everyN)
      case a => a
    })
  }

  /** Chunk-walking decimation (same RIFF discipline as [[decodeWav]]):
    * non-data chunks are copied verbatim, the data chunk keeps every
    * `everyN`-th FRAME — a `blockAlign`-sized byte block, so stereo
    * interleaving and 24/32-bit sample boundaries survive intact — and
    * the fmt rates are divided so the duration is preserved. Works on
    * any standards-compliant PCM WAV (fmt must precede data, as the
    * spec requires: the frame size comes from the fmt chunk).
    */
  private def sampleWavOne(a: MediaAsset, everyN: Int): MediaAsset = {
    val in = ByteBuffer.wrap(a.content).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); in.get(b); new String(b, "US-ASCII")
    }
    require(tag() == "RIFF", s"not a RIFF payload (doc ${a.doc_id})")
    in.getInt // riff size (rewritten below)
    require(tag() == "WAVE", s"not a WAVE payload (doc ${a.doc_id})")
    val out = ByteBuffer.allocate(a.content.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(0) // size patched at end
    out.put("WAVE".getBytes("US-ASCII"))
    var fmtRatePos = -1
    var blockAlign = 0
    while (in.remaining() >= 8) {
      val id = tag()
      val size = in.getInt
      val padded = size + (size & 1)
      id match {
        case "fmt " =>
          out.put(id.getBytes("US-ASCII")).putInt(size)
          // parse the fields the decimation depends on (positions are
          // fixed by the spec), then copy the chunk bytes verbatim
          val fmtStart = in.position()
          require(in.getShort == 1, s"only PCM wav supported (doc ${a.doc_id})")
          val channels = in.getShort.toInt
          in.getInt // sample rate (rewritten below)
          in.getInt // byte rate
          blockAlign = in.getShort.toInt
          val bits = in.getShort.toInt
          require(bits % 8 == 0 && blockAlign == channels * (bits / 8),
            s"inconsistent fmt chunk: channels=$channels bits=$bits " +
              s"blockAlign=$blockAlign (doc ${a.doc_id})")
          fmtRatePos = out.position() + 4 // after format+channels shorts
          in.position(fmtStart)
          val body = new Array[Byte](padded)
          in.get(body)
          out.put(body)
        case "data" =>
          require(blockAlign > 0,
            s"data chunk before fmt chunk (doc ${a.doc_id})")
          require(size % blockAlign == 0,
            s"PCM data not frame-aligned (doc ${a.doc_id})")
          val frames = size / blockAlign
          val kept = (frames + everyN - 1) / everyN
          out.put(id.getBytes("US-ASCII")).putInt(kept * blockAlign)
          val frame = new Array[Byte](blockAlign)
          var i = 0
          while (i < frames) {
            in.get(frame)
            if (i % everyN == 0) out.put(frame)
            i += 1
          }
          if ((size & 1) == 1) in.get()
          if ((kept * blockAlign & 1) == 1) out.put(0.toByte)
        case _ =>
          out.put(id.getBytes("US-ASCII")).putInt(size)
          val body = new Array[Byte](padded)
          in.get(body)
          out.put(body)
      }
    }
    require(fmtRatePos >= 0, s"no fmt chunk (doc ${a.doc_id})")
    val rate = math.max(1, out.getInt(fmtRatePos) / everyN)
    out.putInt(fmtRatePos, rate)              // sample rate ÷ N
    out.putInt(fmtRatePos + 4, rate * blockAlign) // byte rate
    val total = out.position()
    out.putInt(4, total - 8)                  // RIFF size
    val bytes = new Array[Byte](total)
    out.rewind(); out.get(bytes)
    a.copy(content = bytes)
  }

  // ---- decode ----

  private def decodeOne(a: MediaAsset): MediaFeatures = a.format match {
    case "png" | "jpeg" => decodeImage(a)
    case "wav" => decodeWav(a)
    case other => sys.error(s"unknown media format: $other")
  }

  private def decodeImage(a: MediaAsset): MediaFeatures = {
    val img = readImage(a)
    val (w, h) = (img.getWidth, img.getHeight)
    val hist = new Array[Double](16)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w) // bulk row read (see renderImage)
      var x = 0
      while (x < w) {
        val rgb = row(x)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        hist(lum >> 4) += 1.0
        x += 1
      }
      y += 1
    }
    finish(a, w, h, hist, (w * h).toDouble)
  }

  /** RIFF/WAVE parse: validate magics, walk chunks to `fmt `/`data`,
    * histogram the 16-bit amplitudes.
    */
  /** Cross-format transcode (images only): decode and re-encode in
    * `format` — the lossy-twin generator for perceptual-dedup tests
    * and the normalize-to-one-codec corpus step. Non-image assets pass
    * through unchanged.
    */
  def transcode(assets: Dataset[MediaAsset],
      format: String): Dataset[MediaAsset] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(_.map {
      case a if a.format == "png" || a.format == "jpeg" =>
        val img = readImage(a)
        // JPEG can't carry alpha — flatten like resizeOne does
        val src =
          if (format == "jpeg" && img.getColorModel.hasAlpha) {
            val flat = new BufferedImage(img.getWidth, img.getHeight,
              BufferedImage.TYPE_INT_RGB)
            val g = flat.createGraphics(); g.drawImage(img, 0, 0, null)
            g.dispose(); flat
          } else img
        MediaAsset(a.doc_id, format, a.width, a.height,
          writeImage(src, format))
      case a => a
    })
  }

  /** 64-bit perceptual average-hash (aHash) per asset. Images: decode
    * → 8×8 bilinear downscale → per-cell integer luminance (the same
    * 299/587/114 formula as [[extractFeatures]]) → bit i set iff
    * lum_i·64 > Σlum (exact integer compare, no FP mean). WAV: 64
    * equal PCM segments, bit i set iff the segment's summed |amplitude|
    * ·64 > the total (same exact-compare trick on the energy envelope).
    *
    * The point vs q60's md5: a PNG and a JPEG of the SAME pixels hash
    * IDENTICALLY-or-within-a-few-bits (JPEG loss), so a banded Hamming
    * join over these 64-bit hashes — the exact q30 SimHash machinery —
    * finds cross-codec duplicate media that byte hashing can never
    * see. Per-row, shuffle-free, `mapPartitions` like every codec
    * stage.
    */
  def perceptualHashes(assets: Dataset[MediaAsset]): Dataset[MediaHash] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(_.map(phashOne))
  }

  private def phashOne(a: MediaAsset): MediaHash = a.format match {
    case "png" | "jpeg" =>
      val img = readImage(a)
      val small = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
      val g = small.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, 8, 8, null)
      g.dispose()
      val lums = new Array[Long](64)
      var sum = 0L
      val row = new Array[Int](8)
      var y = 0
      while (y < 8) {
        small.getRGB(0, y, 8, 1, row, 0, 8)
        var x = 0
        while (x < 8) {
          val rgb = row(x)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          lums(y * 8 + x) = lum
          sum += lum
          x += 1
        }
        y += 1
      }
      var h = 0L
      var i = 0
      while (i < 64) {
        if (lums(i) * 64L > sum) h |= (1L << i)
        i += 1
      }
      MediaHash(a.doc_id, a.format, h)
    case "wav" =>
      val buf = ByteBuffer.wrap(a.content).order(ByteOrder.LITTLE_ENDIAN)
      def tag(): String = {
        val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
      }
      require(tag() == "RIFF", s"not a RIFF payload (doc ${a.doc_id})")
      buf.getInt
      require(tag() == "WAVE", s"not a WAVE payload (doc ${a.doc_id})")
      var samples: Array[Short] = null
      while (buf.remaining() >= 8 && samples == null) {
        val id = tag()
        val size = buf.getInt
        if (id == "data") {
          val n = size / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = buf.getShort; i += 1 }
        } else buf.position(buf.position() + size + (size & 1))
      }
      require(samples != null && samples.length > 0,
        s"no data chunk (doc ${a.doc_id})")
      val seg = new Array[Long](64)
      var total = 0L
      var i = 0
      val n = samples.length
      while (i < n) {
        val e = math.abs(samples(i).toLong)
        seg((i * 64L / n).toInt) += e
        total += e
        i += 1
      }
      var h = 0L
      i = 0
      while (i < 64) {
        if (seg(i) * 64L > total) h |= (1L << i)
        i += 1
      }
      MediaHash(a.doc_id, a.format, h)
    case other =>
      throw new IllegalArgumentException(
        s"no perceptual hash for format $other (doc ${a.doc_id})")
  }

  private def decodeWav(a: MediaAsset): MediaFeatures = {
    val buf = ByteBuffer.wrap(a.content).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(tag() == "RIFF", s"not a RIFF payload (doc ${a.doc_id})")
    buf.getInt // riff size
    require(tag() == "WAVE", s"not a WAVE payload (doc ${a.doc_id})")
    var channels = 0
    var bits = 0
    var frames = 0
    val hist = new Array[Double](16)
    while (buf.remaining() >= 8) {
      val id = tag()
      val size = buf.getInt
      id match {
        case "fmt " =>
          val fmtEnd = buf.position() + size
          require(buf.getShort == 1, "only PCM wav supported")
          channels = buf.getShort.toInt
          buf.getInt // sample rate
          buf.getInt // byte rate
          buf.getShort // block align
          bits = buf.getShort.toInt
          buf.position(fmtEnd + (size & 1)) // word-aligned (see below)
        case "data" =>
          require(bits == 16, s"expected 16-bit PCM, got $bits")
          val n = size / 2
          frames = n / math.max(channels, 1)
          var i = 0
          while (i < n) {
            hist((buf.getShort + 32768) >> 12) += 1.0
            i += 1
          }
        case _ =>
          // RIFF chunks are word-aligned: an odd-sized chunk is
          // followed by a pad byte that is not counted in `size`
          buf.position(buf.position() + size + (size & 1))
      }
    }
    require(frames > 0, s"no data chunk (doc ${a.doc_id})")
    finish(a, frames, channels, hist, (frames * channels).toDouble)
  }

  private def finish(a: MediaAsset, w: Int, h: Int,
      hist: Array[Double], n: Double): MediaFeatures = {
    val bytes = a.content
    var checksum = 0L
    var i = 0
    while (i < bytes.length) {
      checksum = (checksum * 1000003L + (bytes(i) & 0xff)) % 2147483648L
      i += 1
    }
    val norm = hist.map(_ / math.max(n, 1.0))
    MediaFeatures(a.doc_id, a.format, bytes.length, w, h, checksum, norm,
      norm.take(8).map(_.toFloat))
  }
}
