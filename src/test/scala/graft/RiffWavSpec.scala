package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.RiffWav

/** The RIFF/WAV chunk-walking parser (r12 real container decode): canonical
  * roundtrip, foreign-chunk skipping with the spec's odd-size pad byte, and
  * every refusal path (truncation, bad magic, overrunning size fields). */
class RiffWavSpec extends AnyFunSuite {

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  test("encode/parse roundtrip recovers every fmt field and the sample count") {
    val data = Array.tabulate(1001)(i => (i % 251).toByte) // odd length
    val m = RiffWav.parse(RiffWav.encode(16000, 16, 1, data)).get
    assert(m.audioFormat == 1 && m.channels == 1 && m.bitsPerSample == 16)
    assert(m.sampleRate == 16000 && m.byteRate == 32000 && m.blockAlign == 2)
    assert(m.dataBytes == 1001)
    assert(m.nSamples == 500, "ragged trailing byte drops via blockAlign floor")
  }

  test("stereo 8-bit blockAlign arithmetic") {
    val m = RiffWav.parse(RiffWav.encode(44100, 8, 2, new Array[Byte](10))).get
    assert(m.blockAlign == 2 && m.byteRate == 88200 && m.nSamples == 5)
  }

  test("empty data chunk parses to zero samples") {
    val m = RiffWav.parse(RiffWav.encode(8000, 16, 1, Array.empty)).get
    assert(m.dataBytes == 0 && m.nSamples == 0)
  }

  test("a foreign odd-sized LIST chunk before data is skipped with its pad byte") {
    val base = RiffWav.encode(32000, 16, 1, Array[Byte](1, 2, 3, 4))
    // splice LIST(5 bytes body + 1 pad) between fmt (ends at 36) and data
    val listChunk = "LIST".getBytes("US-ASCII") ++ le32(5) ++
      Array[Byte]('I', 'N', 'F', 'O', 'x', 0 /* pad */)
    val spliced = base.take(36) ++ listChunk ++ base.drop(36)
    // patch the RIFF size field (offset 4) for honesty
    val patched = spliced.clone()
    le32(spliced.length - 8L).copyToArray(patched, 4)
    val m = RiffWav.parse(patched).get
    assert(m.sampleRate == 32000 && m.dataBytes == 4 && m.nSamples == 2)
  }

  test("refusals: truncation, bad magic, overrunning declared sizes") {
    val ok = RiffWav.encode(16000, 16, 1, Array[Byte](1, 2))
    assert(RiffWav.parse(ok.take(11)).isEmpty, "shorter than RIFF preamble")
    val badMagic = ok.clone(); badMagic(0) = 'X'
    assert(RiffWav.parse(badMagic).isEmpty, "bad RIFF magic")
    val badWave = ok.clone(); badWave(8) = 'X'
    assert(RiffWav.parse(badWave).isEmpty, "bad WAVE form type")
    assert(RiffWav.parse(ok.dropRight(1)).isEmpty,
      "data size field overruns the truncated buffer")
    val hugeFmt = ok.clone()
    le32(1 << 20).copyToArray(hugeFmt, 16) // fmt size field
    assert(RiffWav.parse(hugeFmt).isEmpty, "fmt size overruns the buffer")
    val tinyFmt = ok.clone()
    le32(8L).copyToArray(tinyFmt, 16)
    assert(RiffWav.parse(tinyFmt).isEmpty, "fmt chunk shorter than PCM header")
  }
}
