package graft.media

/** GFV1 video container: per-frame decode with sampled-frame skipping.
  *
  * Layout (written by tools/gen_video_fixture.py, an MJPEG-style
  * length-prefixed frame stream with lossless PNG frames so digests are
  * decoder-independent): magic "GFV1" | u16be fps | u32be frameCount, then
  * per frame u32be length | png bytes.
  *
  * The sampling contract matches [[graft.ops.Queries.videoFrames]] (the
  * generator-shape query) and the reference's frame-sample semantics:
  * uniform in TIME, one sample per 500 ms —
  * `durationMs = frameCount*1000/fps`, `ts = k*500 (ts < durationMs)`,
  * `frameIdx = ts*fps/1000` (all integer arithmetic, mirrored exactly by
  * the pure-Python expectation writer). Decode cost scales with the SAMPLE
  * count, not the source frame count: the length-prefix walk skips
  * unsampled frames without inflating them (a 2-hour 30 fps video is 216k
  * frames but only 14.4k decodes).
  */
object VideoFrames {

  val SampleEveryMs = 500L

  final case class Sampled(tsMs: Long, frameIdx: Long, frame: ImageDecode.Decoded)

  private def u16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  /** Parse the header and frame index (offset, length per frame) WITHOUT
    * decoding any frame. Rejects non-GFV1 bytes loudly.
    */
  def index(bytes: Array[Byte]): (Int, Array[(Int, Int)]) = {
    require(bytes.length >= 10 &&
      bytes(0) == 'G' && bytes(1) == 'F' && bytes(2) == 'V' && bytes(3) == '1',
      "not a GFV1 container")
    val fps = u16(bytes, 4)
    require(fps > 0, s"fps must be positive: $fps")
    // u32 fields stay Long until bounds-checked — a corrupt 2^31+ count or
    // frame length truncated through .toInt would go NEGATIVE, slip past
    // the <= bytes.length checks and fail far from the parse
    val nL = u32(bytes, 6)
    require(nL <= (bytes.length - 10) / 4 + 1, s"implausible frame count $nL for ${bytes.length} bytes")
    val n = nL.toInt
    val frames = new Array[(Int, Int)](n)
    var off = 10
    var i = 0
    while (i < n) {
      require(off + 4 <= bytes.length, s"truncated container at frame $i")
      val len = u32(bytes, off) // Long: unsigned, never negative
      require(off + 4 + len <= bytes.length, s"truncated frame $i")
      frames(i) = (off + 4, len.toInt)
      off += 4 + len.toInt
      i += 1
    }
    (fps, frames)
  }

  /** Uniform-in-time sample positions for a container's timeline:
    * ceil(durationMs / 500) samples — ZERO for a sub-millisecond timeline
    * (durationMs = frameCount·1000/fps truncates to 0), matching the
    * Python expectation writer's floor-division row count exactly (JVM
    * `/` truncates toward zero, so the old `(durationMs-1)/500` form
    * disagreed with Python's floor `//` at durationMs = 0).
    */
  def samplePositions(fps: Int, frameCount: Int): Seq[(Long, Long)] = {
    val durationMs = frameCount.toLong * 1000L / fps
    val n = (durationMs + SampleEveryMs - 1) / SampleEveryMs
    (0L until n).map { k =>
      val ts = k * SampleEveryMs
      (ts, ts * fps / 1000L)
    }
  }

  /** Decode ONLY the sampled frames of a container. Sample positions are
    * non-decreasing in frame index, and at fps < 2 consecutive 500 ms
    * samples land on the SAME frame — the one-frame memo keeps decode cost
    * proportional to DISTINCT sampled frames (a 1 fps clip would otherwise
    * decode every frame twice).
    */
  def sampledFrames(bytes: Array[Byte]): Seq[Sampled] = {
    val (fps, frames) = index(bytes)
    var lastIdx = -1L
    var lastDecoded: ImageDecode.Decoded = null
    samplePositions(fps, frames.length).map { case (ts, idx) =>
      if (idx != lastIdx) {
        val (off, len) = frames(idx.toInt)
        lastDecoded =
          ImageDecode.loadImage(java.util.Arrays.copyOfRange(bytes, off, off + len))
        lastIdx = idx
      }
      Sampled(ts, idx, lastDecoded)
    }
  }
}
