package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}

/** One "decoded frame" sampled from an opaque binary payload. */
case class Frame(doc_id: Long, frame_idx: Int, byte_val: Int, feat: Double)

/** Imperative decode plumbing for multimodal binary columns — the
  * Scala analog of a `mapInPandas` decode stage: a per-partition
  * iterator over (id, payload) pairs feeding a codec, emitting a
  * typed frame batch per row. The codec here is a deterministic STUB
  * (image/audio libraries are not on this box): it "frame-samples"
  * the payload at 4 evenly spaced offsets and fabricates a bounded
  * feature from each byte. The plumbing — binary column in, typed
  * `Dataset[Frame]` out, no driver-side collection, partition-local
  * iteration — is the real thing a production codec drops into.
  *
  * Scale notes: mapPartitions keeps codec state (decoder contexts,
  * buffers) per partition rather than per row; output is a flatMap so
  * frame fan-out streams without materializing a per-row collection
  * beyond the frames of one payload.
  */
object BinaryFrames {

  val FramesPerDoc = 4

  /** Expects columns (doc_id: long, blob: binary). */
  def decodeFrames(df: DataFrame): Dataset[Frame] = {
    import df.sparkSession.implicits._
    df.select($"doc_id", $"blob").as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        // per-partition "codec" setup would go here (kept per
        // partition, not per row)
        iter.flatMap { case (id, bytes) =>
          if (bytes.isEmpty) Iterator.empty
          else (0 until FramesPerDoc).iterator.map { k =>
            val off = (bytes.length.toLong * k / FramesPerDoc).toInt
            val b = bytes(off) & 0xff
            Frame(id, k, b, b / 255.0)
          }
        }
      }
  }
}
