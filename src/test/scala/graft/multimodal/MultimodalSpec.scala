package graft.multimodal

import graft.{SparkSpec, TestSpark}

class MultimodalSpec extends SparkSpec {

  import Multimodal._

  test("decodeAndFeaturize: deterministic, fixed-dim features, narrow plan") {
    import spark.implicits._
    val media = Seq(
      Media(1, "image", "aaaa".getBytes), Media(2, "video", "bbbbbbbb".getBytes),
      Media(3, "audio", Array[Byte]())).toDS()
    val out = decodeAndFeaturize(media, batchSize = 2).collect().sortBy(_.media_id)
    assert(out.map(_.features.length).toSet == Set(FeatureDim))
    assert(out.forall(d => d.width >= 1 && d.height >= 1 && d.n_frames >= 1))
    // deterministic: same bytes → same features
    val again = decodeAndFeaturize(media, batchSize = 1).collect().sortBy(_.media_id)
    assert(out.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
    // no shuffle in the decode stage
    assert(!decodeAndFeaturize(media).queryExecution.sparkPlan.toString.contains("Exchange"))
  }

  test("resize caps the longest side preserving aspect; sampleFrames divides frames") {
    import spark.implicits._
    val d = Seq(Decoded(1, "image", 512, 256, 1, Array.fill(FeatureDim)(0f)),
      Decoded(2, "video", 100, 50, 30, Array.fill(FeatureDim)(0f))).toDS()
    val r = resize(d, 256).collect().sortBy(_.media_id)
    assert(r(0).width == 256 && r(0).height == 128)
    assert(r(1).width == 100 && r(1).height == 50)
    val f = sampleFrames(d, 4).collect().sortBy(_.media_id)
    assert(f(1).n_frames == 8)
  }

  test("m_media_features corpus query: three kinds, non-empty, bounded dims") {
    val out = Multimodal.queries("m_media_features")(spark, TestSpark.sf0001).collect()
    assert(out.map(_.getString(0)).toSet == Set("image", "audio", "video"))
    assert(out.forall(_.getLong(1) > 0))
    assert(out.forall(r => r.getInt(3) <= 256 && r.getInt(4) <= 256))
  }
}
