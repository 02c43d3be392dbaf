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

  test("stub decode is deterministic and batch-shaped") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val feats = MultimodalOps
      .extractFeatures(MultimodalOps.assetsFromDocuments(docs))
      .collect()
    assert(feats.length === docs.count())
    feats.foreach { f =>
      assert(f.fake_embedding.length === 8)
      assert(math.abs(f.histogram.sum - 1.0) < 1e-9,
        s"histogram of ${f.doc_id} must be normalized")
      assert(f.checksum >= 0L && f.checksum < 2147483648L)
    }
    // same input → same checksum (determinism across runs)
    val again = MultimodalOps
      .extractFeatures(MultimodalOps.assetsFromDocuments(docs))
      .collect()
      .map(f => f.doc_id -> f.checksum)
      .toMap
    feats.foreach(f => assert(again(f.doc_id) === f.checksum))
  }
}
