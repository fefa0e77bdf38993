package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MediaSpec extends SparkSpec {
  import Media._

  private def mediaDs = {
    import spark.implicits._
    Seq(
      MediaRow(1L, "image", Array[Byte](1, 2, 3, 4, 5)),
      MediaRow(2L, "video", Array[Byte](9, 9, 9, 9, 9, 9)),
      MediaRow(3L, "audio", Array[Byte](7, 7)),
      MediaRow(4L, "image", Array[Byte](1, 2, 3, 4, 5))).toDS()
  }

  test("probe is deterministic per content: identical bytes → identical meta") {
    val meta = Media.probeAll(spark, mediaDs).collect()
      .map(m => m.media_id -> m).toMap
    assert(meta(1L).copy(media_id = 4L) === meta(4L))
    assert(meta(1L).format === "fake/png")
    assert(meta(2L).n_frames > 1)
    assert(meta(3L).format === "fake/wav")
    assert(meta.values.forall(m => m.width >= 0 && m.n_frames >= 1))
  }

  test("feature extraction yields fixed-dim deterministic vectors") {
    val f = Media.extractFeatures(spark, mediaDs, dim = 16).collect()
      .map(x => x.media_id -> x.features).toMap
    assert(f.values.forall(_.length === 16))
    assert(f(1L).toSeq === f(4L).toSeq)
    assert(f(1L).toSeq !== f(2L).toSeq)
    assert(f.values.forall(_.forall(v => v >= -2f && v <= 2f)))
  }

  test("frame sampling bounds frames and varies features per frame") {
    val frames = Media.sampleFrames(spark, mediaDs, dim = 8, maxFrames = 4)
      .collect().groupBy(_.media_id)
    assert(frames(2L).length <= 4 && frames(2L).length >= 2)
    val fs = frames(2L).sortBy(_.frame_idx)
    assert(fs(0).frame_features.toSeq !== fs(1).frame_features.toSeq)
  }

  test("resize preserves aspect ratio within the bound") {
    val meta = Media.probeAll(spark, mediaDs).toDF()
    val resized = Media.resizeMeta(meta, 256)
      .filter(col("kind") === "image").collect()(0)
    val (w, h) = (resized.getAs[Int]("width"), resized.getAs[Int]("height"))
    val (rw, rh) = (resized.getAs[Int]("resized_width"),
      resized.getAs[Int]("resized_height"))
    assert(rw <= 256 + 1 && rh <= 256 + 1)
    assert(math.abs(rw.toDouble / rh - w.toDouble / h) < 0.1)
  }
}
