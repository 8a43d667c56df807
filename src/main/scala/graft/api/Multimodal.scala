package graft.api

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder north star): image/audio/video
  * treated as opaque payloads with typed metadata, processed in batched
  * `mapPartitions` passes with per-partition state — the Scala/JVM
  * equivalent of Python's mapInPandas batches. The container ships no codec
  * libraries, so every *decode* body is a clearly-marked deterministic stub
  * (`// STUB:`); the Spark-side shape — schemas, typed Datasets, batch
  * iteration, generator-style frame explosion — is real and tested, and
  * swapping a stub for a JNI/codec call changes nothing else.
  */
object Multimodal {

  case class Payload(id: Long, payload: Array[Byte])
  case class Decoded(id: Long, n_bytes: Long, width: Int, height: Int)
  case class Frame(id: Long, frame_idx: Long, frame: Array[Byte])

  /** "Decode" each payload to (dimensions, size) metadata.
    * STUB: a real build calls the image codec here; the fake derives
    * deterministic dims from the byte length so tests are stable.
    */
  def decode(payloads: Dataset[Payload]): Dataset[Decoded] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      // per-partition "codec handle" (the expensive init a real decoder has)
      it.map { p =>
        val n = p.payload.length
        // STUB: fake dims — w = n mod 64 + 1, h = n / (w) bounded
        val w = n % 64 + 1
        Decoded(p.id, n.toLong, w, math.max(1, n / math.max(w, 1)))
      }
    }
  }

  /** "Resize": rescale the stub dims, preserving aspect. STUB for a real
    * resampling kernel; the arithmetic contract (never exceed maxSide,
    * preserve ratio within integer rounding) is what the spec checks.
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

  /** Frame sampling: split each payload into fixed-size frames, keep every
    * `stride`-th. Real generator-shaped explosion (one input row → many
    * frame rows) in a single partition-local pass — a video pipeline's
    * sampling stage with the codec stubbed to byte-slicing.
    */
  def sampleFrames(payloads: Dataset[Payload], frameBytes: Int, stride: Int): Dataset[Frame] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      it.flatMap { p =>
        val n = p.payload.length / frameBytes
        (0 until n by stride).iterator.map { i =>
          Frame(p.id, i.toLong,
            java.util.Arrays.copyOfRange(p.payload, i * frameBytes, (i + 1) * frameBytes))
        }
      }
    }
  }

  case class AudioWindow(id: Long, win_idx: Long, energy: Long)

  /** Audio-style OVERLAPPING windowing: fixed `windowBytes` windows every
    * `stride` bytes (stride < window ⇒ overlap), full windows only, with a
    * per-window energy proxy (byte sum — STUB for a real RMS/spectral
    * feature). Same single partition-local generator pass as
    * [[sampleFrames]]; a real audio pipeline swaps the energy body for the
    * DSP kernel and nothing else moves.
    */
  def windowEnergy(payloads: Dataset[Payload], windowBytes: Int, stride: Int): Dataset[AudioWindow] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      it.flatMap { p =>
        val n = if (p.payload.length < windowBytes) 0
                else (p.payload.length - windowBytes) / stride + 1
        (0 until n).iterator.map { i =>
          var s = 0L
          var j = i * stride
          val end = i * stride + windowBytes
          while (j < end) { s += (p.payload(j) & 0xff); j += 1 }
          AudioWindow(p.id, i.toLong, s)
        }
      }
    }
  }

  /** Stub feature extraction: per-frame digest + energy (sum of bytes) —
    * the aggregation shape of a real embedding pass.
    */
  def frameFeatures(frames: Dataset[Frame]): DataFrame = {
    import frames.sparkSession.implicits._
    frames.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { f =>
        // STUB: a real build runs the vision encoder here
        val energy = f.frame.foldLeft(0L)((a, b) => a + (b & 0xff))
        (f.id, f.frame_idx, md.digest(f.frame).map("%02x".format(_)).mkString, energy)
      }
    }.toDF("doc_id", "frame_idx", "frame_md5", "energy")
  }
}
