package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{MediaRow, Multimodal}

/** Multimodal plumbing: binary schema, batched decode shape, deterministic
 *  stub features. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("media table: every doc present, bytes round-trip, modality routing") {
    val media = Multimodal.mediaTable(spark, dir).collect()
    assert(media.length === 500)
    media.foreach { m =>
      assert(m.n_bytes === m.bytes.length.toLong)
      assert(Set("image", "audio", "video").contains(m.modality))
      assert(m.modality === (m.doc_id % 3 match {
        case 0 => "image"; case 1 => "audio"; case _ => "video" }))
    }
  }

  test("extractFeatures: batched partition decode, deterministic stub output") {
    val media = Multimodal.mediaTable(spark, dir)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length === 500)
    val byId = feats.map(f => f.doc_id -> f).toMap
    // independent recompute through the stub must agree exactly
    media.collect().foreach { m =>
      val want = Multimodal.stubDecode(m)
      val got = byId(m.doc_id)
      assert(got.width === want.width && got.height === want.height)
      assert(got.duration_ms === m.n_bytes * 7L)
      assert(got.features.toSeq === want.features.toSeq)
    }
  }

  test("feature schema is fixed-length float8 regardless of media size") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(spark, dir))
    assert(feats.collect().forall(_.features.length === 8))
  }
}
