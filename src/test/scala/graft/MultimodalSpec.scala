package graft

import graft.operators.Multimodal

/** Typed multimodal pipeline: binary payloads survive the Dataset
  * round-trip and the partition-batched decoder produces the stand-in
  * features byte-exactly. */
class MultimodalSpec extends SparkTestBase {

  test("mediaItems carries binary payload + typed metadata") {
    val items = Multimodal.mediaItems(spark, sf).take(5)
    items.foreach { m =>
      assert(m.payload.nonEmpty)
      assert(m.meta.kind == "utf8-text")
      assert(m.meta.width > 0 && m.meta.height == 1L)
    }
  }

  test("decodeBatches emits first-bytes features deterministically") {
    val feats = Multimodal.decodeBatches(Multimodal.mediaItems(spark, sf))
      .collect().sortBy(_.doc_id).take(3)
    val raw = Multimodal.mediaItems(spark, sf)
      .collect().sortBy(_.doc_id).take(3)
    feats.zip(raw).foreach { case (f, m) =>
      assert(f.n_bytes == m.payload.length)
      assert(f.feature.length == Multimodal.FeatureDim)
      f.feature.zipWithIndex.foreach { case (v, i) =>
        assert(v == (m.payload(i) & 0xff) / 255.0)
      }
    }
  }
}
