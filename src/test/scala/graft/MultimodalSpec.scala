package graft

import graft.core.GraftSession
import graft.ops.MultimodalOps
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)
  val sf = "/root/testdata/sf0.001"

  test("binary assets preserve payload length and deterministic metadata") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val assets = MultimodalOps.assetsFromDocuments(docs).collect()
    assert(assets.length === docs.count())
    val byId = assets.map(a => a.doc_id -> a).toMap
    assert(byId(0L).format === "png")
    assert(byId(1L).format === "jpeg")
    assert(byId(2L).format === "wav")
    assert(byId(3L).width === 256 && byId(3L).height === 256)
  }

  test("synthesized media are real codec payloads with correct magic bytes") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val media = MultimodalOps
      .synthesizeMedia(MultimodalOps.assetsFromDocuments(docs))
      .collect()
    assert(media.length === docs.count())
    media.foreach { a =>
      val head = a.content.take(8).map(_ & 0xff)
      a.format match {
        case "png" =>
          assert(head.startsWith(Seq(0x89, 0x50, 0x4e, 0x47)),
            s"doc ${a.doc_id}: not a PNG signature")
        case "jpeg" =>
          assert(head.startsWith(Seq(0xff, 0xd8, 0xff)),
            s"doc ${a.doc_id}: not a JPEG SOI marker")
        case "wav" =>
          assert(new String(a.content.take(4), "US-ASCII") === "RIFF")
          assert(new String(a.content.slice(8, 12), "US-ASCII") === "WAVE")
      }
    }
  }

  test("real decode recovers the encoded dimensions and normalized histograms") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val assets = MultimodalOps.assetsFromDocuments(docs)
    val metaById = assets.collect().map(a => a.doc_id -> a).toMap
    val feats = MultimodalOps
      .extractFeatures(MultimodalOps.synthesizeMedia(assets))
      .collect()
    assert(feats.length === docs.count())
    feats.foreach { f =>
      val m = metaById(f.doc_id)
      f.format match {
        case "png" | "jpeg" =>
          // ImageIO round-trip must recover the rendered pixel dims
          assert(f.dec_width === m.width && f.dec_height === m.height,
            s"doc ${f.doc_id}: decoded ${f.dec_width}x${f.dec_height}, " +
              s"rendered ${m.width}x${m.height}")
        case "wav" =>
          assert(f.dec_width ===
            MultimodalOps.wavFrames(f.doc_id, m.width, m.height))
          assert(f.dec_height === 1) // mono
      }
      assert(f.embedding.length === 8)
      assert(math.abs(f.histogram.sum - 1.0) < 1e-9,
        s"histogram of ${f.doc_id} must be normalized")
      assert(f.checksum >= 0L && f.checksum < 2147483648L)
    }
    // same input → same checksum (codec determinism across runs)
    val again = MultimodalOps
      .extractFeatures(MultimodalOps.synthesizeMedia(assets))
      .collect()
      .map(f => f.doc_id -> f.checksum)
      .toMap
    feats.foreach(f => assert(again(f.doc_id) === f.checksum))
  }

  test("resize caps the longest side, preserves aspect, never upscales") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val assets = MultimodalOps.assetsFromDocuments(docs)
    val metaById = assets.collect().map(a => a.doc_id -> a).toMap
    val resized = MultimodalOps
      .resizeImages(MultimodalOps.synthesizeMedia(assets), 128)
    val feats = MultimodalOps.extractFeatures(resized).collect()
    feats.filter(f => f.format == "png" || f.format == "jpeg").foreach { f =>
      val m = metaById(f.doc_id)
      val scale = 128.0 / math.max(m.width, m.height)
      if (scale >= 1.0) {
        assert(f.dec_width === m.width && f.dec_height === m.height,
          s"doc ${f.doc_id}: small image must pass through unchanged")
      } else {
        assert(math.max(f.dec_width, f.dec_height) === 128,
          s"doc ${f.doc_id}: longest side must be 128, got " +
            s"${f.dec_width}x${f.dec_height}")
        assert(f.dec_width === math.max(1, math.round(m.width * scale).toInt))
        assert(f.dec_height === math.max(1, math.round(m.height * scale).toInt))
      }
    }
  }

  test("frame sampling keeps every Nth PCM frame and rewrites the container") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val assets = MultimodalOps.assetsFromDocuments(docs)
    val metaById = assets.collect().map(a => a.doc_id -> a).toMap
    val sampled = MultimodalOps
      .sampleFrames(MultimodalOps.synthesizeMedia(assets), 4)
    val feats = MultimodalOps.extractFeatures(sampled).collect()
    feats.filter(_.format == "wav").foreach { f =>
      val m = metaById(f.doc_id)
      val orig = MultimodalOps.wavFrames(f.doc_id, m.width, m.height)
      assert(f.dec_width === (orig + 3) / 4,
        s"doc ${f.doc_id}: expected ceil($orig/4) frames, got ${f.dec_width}")
      assert(f.dec_height === 1)
    }
  }

  test("frame sampling keeps stereo frames intact (blockAlign-sized)") {
    import java.nio.{ByteBuffer, ByteOrder}
    // hand-built stereo 16-bit WAV: frame i = (L=i, R=1000+i), 10 frames
    val frames = 10
    val dataLen = frames * 4
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1).putShort(2)        // PCM, stereo
    buf.putInt(8000).putInt(8000 * 4)  // sample rate, byte rate
    buf.putShort(4).putShort(16)       // block align, bits
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    (0 until frames).foreach { i =>
      buf.putShort(i.toShort).putShort((1000 + i).toShort)
    }
    val sq = spark
    import sq.implicits._
    val asset = graft.ops.MediaAsset(99L, "wav", 0, 0, buf.array())
    val sampled = MultimodalOps
      .sampleFrames(Seq(asset).toDS(), 2).collect().head
    val out = ByteBuffer.wrap(sampled.content).order(ByteOrder.LITTLE_ENDIAN)
    out.position(44) // canonical header layout is preserved verbatim
    val kept = (0 until 5).map(_ => (out.getShort.toInt, out.getShort.toInt))
    // every 2nd FRAME survives as an intact (L, R) pair — a sample-wise
    // decimator would have scrambled channels into (0,2),(4,6),...
    assert(kept === Seq((0, 1000), (2, 1002), (4, 1004), (6, 1006), (8, 1008)))
    assert(out.getInt(40) === 5 * 4, "data chunk size must be 5 frames")
  }

  test("binaryFile ingest round-trips payloads and metadata bit-exactly") {
    val sq = spark
    import sq.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val media = MultimodalOps
      .synthesizeMedia(MultimodalOps.assetsFromDocuments(docs)
        .filter($"doc_id" < 20))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_binaryfile_spec").toString
    MultimodalOps.writeMediaFiles(media, dir)
    // a stray non-media file must be skipped by the name filter
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "README.txt"), "stray".getBytes)
    val got = MultimodalOps.readMediaAssets(spark, dir).collect()
      .map(a => a.doc_id ->
        (a.format, a.width, a.height, a.content.toSeq)).toMap
    val want = media.collect()
      .map(a => a.doc_id ->
        (a.format, a.width, a.height, a.content.toSeq)).toMap
    assert(got === want, "ingested corpus differs from the written one")
  }

  test("perceptual hash: codec-invariant for same pixels, twins within 6 bits") {
    val sq = spark
    import sq.implicits._
    val docs = sq.read.parquet(s"$sf/documents.parquet")
      .where("doc_id < 30")
    val base = MultimodalOps
      .synthesizeMedia(MultimodalOps.assetsFromDocuments(docs))
    val pngs = base.filter((a: graft.ops.MediaAsset) => a.format == "png")
    // png → png transcode decodes and re-encodes losslessly: the hash
    // must be IDENTICAL (it sees pixels, not bytes)
    val h0 = MultimodalOps.perceptualHashes(pngs).collect()
      .map(h => h.doc_id -> h.phash).toMap
    val hPng = MultimodalOps
      .perceptualHashes(MultimodalOps.transcode(pngs, "png")).collect()
      .map(h => h.doc_id -> h.phash).toMap
    assert(hPng === h0, "lossless transcode must not move the hash")
    // png → jpeg is lossy: every twin must stay within Hamming 6
    val hJpeg = MultimodalOps
      .perceptualHashes(MultimodalOps.transcode(pngs, "jpeg")).collect()
      .map(h => h.doc_id -> h.phash).toMap
    val hams = h0.map { case (id, h) =>
      id -> java.lang.Long.bitCount(h ^ hJpeg(id))
    }
    assert(hams.values.forall(_ <= 6),
      s"jpeg twins must stay within 6 bits: $hams")
    // the wav path is deterministic (a flat-envelope sine legitimately
    // hashes to 0 — every segment sits at the mean, like aHash of a
    // flat image)
    val wavSrc = base.filter((a: graft.ops.MediaAsset) => a.format == "wav")
    val wavs = MultimodalOps.perceptualHashes(wavSrc).collect()
      .map(h => h.doc_id -> h.phash).sortBy(_._1)
    val wavs2 = MultimodalOps.perceptualHashes(wavSrc).collect()
      .map(h => h.doc_id -> h.phash).sortBy(_._1)
    assert(wavs.nonEmpty && wavs.toSeq === wavs2.toSeq)
  }

  test("q157 class-level dedup: per-asset rows, twin components, verdict") {
    val out = graft.SparkEntry.queries("q157_phash_dedup")(spark, sf)
      .collect()
    // linear output: exactly one row per asset (docs + jpeg twins of
    // the png third), never a pair list that can go quadratic
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    val nPng = (0L until nDocs).count(_ % 3 == 0)
    assert(out.length === nDocs + nPng,
      s"one row per asset expected: ${out.length} vs ${nDocs + nPng}")
    // the self-verdict (100% twin recall via shared components) holds
    assert(out.forall(_.getAs[Long]("verdict") === 1L),
      "every png/jpeg twin must share a near-dup component")
    // identical hashes collapse into one class: class_size sums back
    // to the corpus and each twin sits in its original's component
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    val twinOffset = 10000000L
    byId.keys.filter(_ >= twinOffset).foreach { tid =>
      assert(byId(tid).getAs[Long]("comp") ===
        byId(tid - twinOffset).getAs[Long]("comp"),
        s"twin $tid must share its original's component")
    }
  }
}
