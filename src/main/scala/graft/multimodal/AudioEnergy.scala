package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.lake.Tables

/** One fixed-width analysis window of a decoded audio stream: integer
  * energy (sum of squared centered amplitudes) and the silence flag a
  * VAD/segmentation stage gates on. */
final case class AudioWindow(
    doc_id: Long, win_id: Int, n_samples: Int, energy: Long,
    is_silence: Boolean)

/**
 * Audio feature extraction over really-decoded WAV payloads: windowed
 * energy + silence detection — the voice-activity-detection shape a
 * speech-data pipeline runs before segmenting, and the audio twin of the
 * image dHash (fixture closed-form in doc_id, REAL RIFF/PCM decode on the
 * Spark side, every decoded sample under the oracle's hash gate).
 *
 * The varying-PCM fixture: mono 8-bit WAV where sample i is
 * `32 + (doc_id*29 + i*7) % 95`, except every 4th 160-sample window is
 * held at the 79 center — an exactly-silent stretch, so `is_silence` has
 * real positives. Amplitude = sample - 79 (in [-47, 47]); energy is pure
 * int64 — no IEEE anywhere.
 */
object AudioEnergy {

  /** Analysis window width in samples (8 kHz-ish speech framing). */
  val WindowSamples = 160

  def nSamples(docId: Long): Long = 200 + (docId * 23) % 1800
  def sampleRate(docId: Long): Int = (8000 + 100 * ((docId * 19) % 81)).toInt

  /** The authored 8-bit sample value at index i (closed form shared with
    * the DuckDB oracle in `graft.catalog.MediaCatalog`). */
  def sampleAt(docId: Long, i: Long): Int =
    if ((i / WindowSamples) % 4 == 3) 79
    else (32 + (docId * 29 + i * 7) % 95).toInt

  /** Deterministic mono 8-bit varying-PCM WAV fixture. */
  def wavVarFixture(docId: Long): Array[Byte] = {
    val rate = sampleRate(docId)
    val n = nSamples(docId).toInt
    val buf = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort)       // PCM
      .putShort(1.toShort)       // mono
      .putInt(rate)
      .putInt(rate)              // byte rate (8-bit mono)
      .putShort(1.toShort)       // block align
      .putShort(8.toShort)       // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(n)
    var i = 0
    while (i < n) { buf.put(sampleAt(docId, i).toByte); i += 1 }
    buf.array()
  }

  /** The audio corpus: every `doc_id % 3 = 1` document (the audio modality
    * slice) gets a varying-PCM WAV payload. */
  def corpus(spark: SparkSession, sfDir: String): DataFrame = {
    val wav = udf((docId: Long) => wavVarFixture(docId))
    Tables.spread(Tables.documents(spark, sfDir))
      .filter(col("doc_id") % 3 === 1)
      .select(col("doc_id"), wav(col("doc_id")).as("content"))
  }

  /** Decode each WAV for real ([[Media.decodeWav]] RIFF/PCM parse) and
    * emit one row per fixed-width window: integer energy around the 8-bit
    * midline and the silence flag. The last window may be partial —
    * `n_samples` says how many samples it actually holds. */
  def windows(audio: DataFrame, silenceMax: Long = 0L): Dataset[AudioWindow] = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (docId, bytes) =>
          val (_, ch, bits, dataOff, dataLen) = Media.decodeWav(bytes)
          require(ch == 1 && bits == 8,
            s"energy kernel expects mono 8-bit PCM for doc_id=$docId")
          val nWin = (dataLen + WindowSamples - 1) / WindowSamples
          (0 until nWin).iterator.map { w =>
            val from = w * WindowSamples
            val until = math.min(from + WindowSamples, dataLen)
            var e = 0L
            var i = from
            while (i < until) {
              val amp = (bytes(dataOff + i) & 0xff) - 79
              e += amp.toLong * amp
              i += 1
            }
            AudioWindow(docId, w, until - from, e, e <= silenceMax)
          }
        }
      }
  }
}
