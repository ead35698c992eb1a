package graft.media

/** WAV (RIFF / WAVE) PCM decoder — the audio leg of the multimodal story.
  * The brief permits stubbing audio decode behind a deterministic fake
  * (codec libraries are absent offline); RIFF PCM needs no library — the
  * container is a chunk list and the payload IS the samples — so this is
  * a REAL decode, implemented from the published format like
  * [[graft.sources.Warc]] and [[PdfPages]] are:
  *
  *  - `RIFF` header with the `WAVE` form type;
  *  - chunk walk with word (2-byte) alignment padding per the spec;
  *    unknown chunks (LIST, INFO, cue…) are SKIPPED — metadata must not
  *    break ingestion;
  *  - `fmt ` must be audio format 1 (integer PCM) with 16-bit samples;
  *    compressed/float/24-bit formats throw with the offending values
  *    (the repo's reject-loudly contract — never silent garbage);
  *  - `data` decodes to interleaved little-endian signed 16-bit samples.
  */
object Wav {

  /** Interleaved 16-bit PCM. `frames` = samples per channel. */
  final case class WavAudio(channels: Int, sampleRate: Int, samples: Array[Short]) {
    def frames: Int = samples.length / channels
  }

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (u16(b, o).toLong) | (u16(b, o + 2).toLong << 16)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  def decode(bytes: Array[Byte]): WavAudio = {
    require(bytes.length >= 44, "too short for a WAV header")
    require(tag(bytes, 0) == "RIFF", s"not RIFF: '${tag(bytes, 0)}'")
    require(tag(bytes, 8) == "WAVE", s"not a WAVE form: '${tag(bytes, 8)}'")
    var pos = 12
    var channels = -1
    var rate = -1
    var bits = -1
    var data: Array[Short] = null
    while (pos + 8 <= bytes.length) {
      val id = tag(bytes, pos)
      // keep the declared size in Long: a corrupt u32 ≥ 2^31 truncated
      // through toInt goes NEGATIVE, the overrun require passes spuriously,
      // and the word-aligned advance moves ≤ 0 — an infinite loop on an
      // unknown chunk, NegativeArraySizeException on a data chunk
      val lenL = u32(bytes, pos + 4)
      require(pos + 8 + lenL <= bytes.length, s"chunk '$id' overruns the file")
      val len = lenL.toInt
      id match {
        case "fmt " =>
          // duplicate fmt would silently re-bind channels/rate AFTER data
          // validated against the first one (stereo samples re-read as mono
          // doubles `frames` and strides L/R as one channel) — reject
          require(channels < 0, "duplicate fmt chunk")
          require(len >= 16, s"fmt chunk too short ($len)")
          val fmt = u16(bytes, pos + 8)
          require(fmt == 1, s"audio format $fmt unsupported (PCM=1 only)")
          channels = u16(bytes, pos + 10)
          rate = u32(bytes, pos + 12).toInt
          bits = u16(bytes, pos + 22)
          require(channels > 0, "zero channels")
          require(rate > 0, "zero sample rate")
          require(bits == 16, s"$bits-bit samples unsupported (16-bit PCM only)")
        case "data" =>
          require(channels > 0, "data chunk before fmt")
          require(data == null, "duplicate data chunk") // never silently keep only the last
          require(len % 2 == 0, "odd data length for 16-bit PCM")
          val out = new Array[Short](len / 2)
          var i = 0
          while (i < out.length) {
            out(i) = u16(bytes, pos + 8 + i * 2).toShort
            i += 1
          }
          require(out.length % channels == 0, "partial final frame")
          data = out
        case _ => // LIST/INFO/cue/fact… metadata: skip
      }
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(data != null, "no data chunk")
    WavAudio(channels, rate, data)
  }
}
