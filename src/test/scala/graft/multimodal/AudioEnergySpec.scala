package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AudioEnergySpec extends SparkSpec {

  import spark.implicits._

  private def referenceWindows(docId: Long): Seq[AudioWindow] = {
    val n = AudioEnergy.nSamples(docId).toInt
    val w = AudioEnergy.WindowSamples
    (0 until (n + w - 1) / w).map { win =>
      val until = math.min((win + 1) * w, n)
      val e = (win * w until until)
        .map { i => val a = AudioEnergy.sampleAt(docId, i) - 79; a.toLong * a }
        .sum
      AudioWindow(docId, win, until - win * w, e, e == 0)
    }
  }

  test("decoded windows == closed-form recompute for a doc slice") {
    val ids = (0L until 120L).filter(_ % 3 == 1)
    val got = AudioEnergy
      .windows(ids.map(id => (id, AudioEnergy.wavVarFixture(id)))
        .toDF("doc_id", "content"))
      .collect()
      .groupBy(_.doc_id)
    ids.foreach { id =>
      val exp = referenceWindows(id)
      assert(got(id).sortBy(_.win_id).toSeq == exp, s"doc $id divergence")
    }
  }

  test("every 4th full window is exactly silent; every other has energy") {
    val rows = AudioEnergy
      .windows(Seq((7L, AudioEnergy.wavVarFixture(7L))).toDF("doc_id", "content"))
      .collect()
      .sortBy(_.win_id)
    rows.foreach { r =>
      if (r.win_id % 4 == 3) assert(r.is_silence && r.energy == 0L)
      else assert(!r.is_silence && r.energy > 0L, s"win ${r.win_id}")
    }
  }

  test("partial last window carries its true sample count") {
    // pick a doc whose nSamples is not a multiple of the window width
    val id = (1L to 200L).find(d => AudioEnergy.nSamples(d) % 160 != 0).get
    val rows = AudioEnergy
      .windows(Seq((id, AudioEnergy.wavVarFixture(id))).toDF("doc_id", "content"))
      .collect().sortBy(_.win_id)
    val n = AudioEnergy.nSamples(id)
    assert(rows.map(_.n_samples.toLong).sum == n)
    assert(rows.last.n_samples == (n % 160))
  }

  test("non-mono / non-8-bit payloads are rejected, not mis-measured") {
    // the constant-fill stereo fixture from the metadata family
    val stereoId = (1L to 20L).find(Media.wavChannels(_) == 2).get
    val bad = Seq((stereoId, Media.wavFixture(stereoId))).toDF("doc_id", "content")
    val e = intercept[org.apache.spark.SparkException] {
      AudioEnergy.windows(bad).collect()
    }
    assert(e.getMessage.contains("mono") || e.getCause != null)
  }

  test("silence threshold is a dial: everything below it flags") {
    val rows = AudioEnergy
      .windows(
        Seq((7L, AudioEnergy.wavVarFixture(7L))).toDF("doc_id", "content"),
        silenceMax = Long.MaxValue)
      .collect()
    assert(rows.forall(_.is_silence))
  }

  test("catalog media_audio_energy matches the typed operator") {
    val viaCatalog = graft.SparkEntry.queries("media_audio_energy")(spark, sf001)
    val viaOp = AudioEnergy
      .windows(AudioEnergy.corpus(spark, sf001))
      .toDF()
      .orderBy(col("doc_id"), col("win_id"))
    assert(viaCatalog.exceptAll(viaOp).isEmpty && viaOp.exceptAll(viaCatalog).isEmpty)
  }
}
