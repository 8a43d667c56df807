package graft.api

import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal-column plumbing (builder north star): image/audio/video
  * treated as opaque payloads with typed metadata, processed in batched
  * `mapPartitions` passes with per-partition state — the Scala/JVM
  * equivalent of Python's mapInPandas batches. Every decode/feature kernel
  * goes through the pluggable [[Codec]] seam, resolved executor-side once
  * per JVM: the container ships no codec libraries, so the default
  * [[StubCodec]] provides clearly-marked deterministic fakes, and a
  * codec-equipped deployment swaps real kernels in via
  * `-Dgraft.codec.class=…` without touching any operator here. The
  * Spark-side shape — schemas, typed Datasets, batch iteration,
  * generator-style frame explosion — is real and tested either way.
  */
object Multimodal {

  case class Payload(id: Long, payload: Array[Byte])
  case class Decoded(id: Long, n_bytes: Long, width: Int, height: Int)
  case class Frame(id: Long, frame_idx: Long, frame: Array[Byte])

  /** Decode each payload to (dimensions, size) metadata via
    * [[Codec.imageDims]] (stub: deterministic dims from byte length).
    */
  def decode(payloads: Dataset[Payload]): Dataset[Decoded] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      // per-partition codec resolution = the expensive per-executor init a
      // real decoder has; never serialized from the driver
      val codec = Codec.active
      it.map { p =>
        val (w, h) = codec.imageDims(p.payload)
        Decoded(p.id, p.payload.length.toLong, w, h)
      }
    }
  }

  /** Resize: rescale the decoded dims, preserving aspect. Pure integer
    * arithmetic over [[Decoded]] metadata — no codec involvement; the
    * contract (never exceed maxSide, preserve ratio within integer
    * rounding) is what the spec checks.
    */
  def resize(decoded: Dataset[Decoded], maxSide: Int): Dataset[Decoded] = {
    import decoded.sparkSession.implicits._
    decoded.map { d =>
      val side = math.max(d.width, d.height)
      if (side <= maxSide) d
      else {
        val scale = maxSide.toDouble / side
        d.copy(width = math.max(1, (d.width * scale).toInt),
          height = math.max(1, (d.height * scale).toInt))
      }
    }
  }

  /** Frame sampling: decode each payload's frame sequence via
    * [[Codec.frameIter]] (stub: fixed-size byte slicing), keep every
    * `stride`-th. Real generator-shaped explosion (one input row → many
    * frame rows) in a single partition-local pass.
    */
  def sampleFrames(payloads: Dataset[Payload], frameBytes: Int, stride: Int): Dataset[Frame] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      val codec = Codec.active
      it.flatMap { p =>
        codec.frameIter(p.payload, frameBytes).zipWithIndex.collect {
          case (frame, i) if i % stride == 0 => Frame(p.id, i.toLong, frame)
        }
      }
    }
  }

  case class AudioWindow(id: Long, win_idx: Long, energy: Long)

  /** Audio-style OVERLAPPING windowing: fixed `windowBytes` windows every
    * `stride` bytes (stride < window ⇒ overlap), full windows only, with a
    * per-window feature from [[Codec.windowFeature]] (stub: byte-sum
    * energy; a real audio pipeline swaps in the DSP kernel and nothing
    * else moves). Same single partition-local generator pass as
    * [[sampleFrames]].
    */
  def windowEnergy(payloads: Dataset[Payload], windowBytes: Int, stride: Int): Dataset[AudioWindow] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      val codec = Codec.active
      it.flatMap { p =>
        val n = if (p.payload.length < windowBytes) 0
                else (p.payload.length - windowBytes) / stride + 1
        (0 until n).iterator.map { i =>
          AudioWindow(p.id, i.toLong,
            codec.windowFeature(p.payload, i * stride, windowBytes))
        }
      }
    }
  }

  /** Feature extraction: per-frame (digest, energy) via
    * [[Codec.frameFeature]] — the aggregation shape of a real embedding
    * pass.
    */
  def frameFeatures(frames: Dataset[Frame]): DataFrame = {
    import frames.sparkSession.implicits._
    frames.mapPartitions { it =>
      val codec = Codec.active
      it.map { f =>
        val (digest, energy) = codec.frameFeature(f.frame)
        (f.id, f.frame_idx, digest, energy)
      }
    }.toDF("doc_id", "frame_idx", "frame_md5", "energy")
  }
}
