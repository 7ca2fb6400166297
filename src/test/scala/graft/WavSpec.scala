package graft

import graft.ext.{Multimodal, Wav}

/** RIFF/WAVE codec: exact roundtrip, compliant chunk walking, readable
  * rejection of non-PCM input.
  */
class WavSpec extends SparkSpec {

  private val samples = Array.tabulate(300)(i =>
    (((i * 104729L) % 65536L) - 32768L).toShort)

  test("encode/decode roundtrip is exact") {
    val pcm = Wav.Pcm16(16000, 1, samples)
    val back = Wav.decode(Wav.encode(pcm))
    assert(back.sampleRate === 16000)
    assert(back.channels === 1)
    assert(back.bitsPerSample === 16)
    assert(back.samples.toSeq === samples.toSeq)
  }

  test("unknown chunks (LIST) are skipped like any compliant reader") {
    val blob = Wav.encode(Wav.Pcm16(44100, 2, samples))
    // splice a LIST chunk between fmt and data (fmt ends at offset 36)
    val list = "LIST".getBytes ++ Array[Byte](6, 0, 0, 0) ++
      "INFOab".getBytes
    val spliced = blob.take(36) ++ list ++ blob.drop(36)
    val back = Wav.decode(spliced)
    assert(back.sampleRate === 44100 && back.channels === 2)
    assert(back.samples.toSeq === samples.toSeq)
  }

  test("non-WAV and non-PCM blobs fail with a readable error") {
    intercept[IllegalArgumentException](Wav.decode("not a wav".getBytes))
    val blob = Wav.encode(Wav.Pcm16(8000, 1, samples))
    blob(20) = 3 // audioFormat = IEEE float
    val e = intercept[IllegalArgumentException](Wav.decode(blob))
    assert(e.getMessage.contains("PCM"))
  }

  test("undersized fmt chunk fails readably instead of reading past it") {
    val blob = Wav.encode(Wav.Pcm16(8000, 1, samples))
    blob(16) = 8 // fmt chunk claims 8 bytes; fields need 16
    val e = intercept[IllegalArgumentException](Wav.decode(blob))
    assert(e.getMessage.contains("fmt chunk too small"))
  }

  test("audioStats decodes through the container and matches direct math") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(7L, "audio",
        Wav.encode(Wav.Pcm16(16000, 1, samples)), "wav")).toDS()
    val row = Multimodal.audioStats(media).collect().head
    assert(row.n_samples === 300L)
    assert(row.peak === samples.map(s => math.abs(s.toLong)).max)
    assert(row.sum_amp === samples.map(_.toLong).sum)
    assert(row.sum_sq === samples.map(s => s.toLong * s.toLong).sum)
  }
}
