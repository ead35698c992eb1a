package graft

import java.nio.file.{Files, Paths}

import graft.media.VideoFrames
import org.scalatest.funsuite.AnyFunSuite

/** GFV1 container parsing + sampled-frame decode (no Spark needed). */
class VideoFramesSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] =
    Files.readAllBytes(Paths.get(s"src/test/resources/media/$name"))

  test("sample positions are uniform in time with integer frame mapping") {
    // vid_02: fps 6, 13 frames → duration 2166 ms → ts 0..2000 step 500
    assert(VideoFrames.samplePositions(6, 13) ==
      Seq((0L, 0L), (500L, 3L), (1000L, 6L), (1500L, 9L), (2000L, 12L)))
    // exact-multiple duration: fps 30, 75 frames → 2500 ms → last ts 2000
    assert(VideoFrames.samplePositions(30, 75).last == (2000L, 60L))
    // sub-sample-window video: one frame at ts 0
    assert(VideoFrames.samplePositions(24, 6) == Seq((0L, 0L)))
  }

  test("index walks length prefixes without decoding; decode count = sample count") {
    val bytes = fixture("vid_00.gfv")
    val (fps, frames) = VideoFrames.index(bytes)
    assert(fps == 24 && frames.length == 30)
    val sampled = VideoFrames.sampledFrames(bytes)
    // 30 frames at 24 fps = 1250 ms → 3 samples, NOT 30 decodes
    assert(sampled.length == 3)
    assert(sampled.map(s => (s.tsMs, s.frameIdx)) == Seq((0L, 0L), (500L, 12L), (1000L, 24L)))
    assert(sampled.forall(s => s.frame.width == 24 && s.frame.height == 14))
    // distinct frames decode to distinct pixels
    assert(sampled.map(s => graft.media.ImageDecode.sha256Hex(s.frame.rgb)).distinct.size == 3)
  }

  test("repeated sample indices reuse one decode (fps < 2 memo)") {
    // fps 1: consecutive 500 ms samples land on the SAME frame index —
    // build a 1 fps container by patching vid_00's header (magic | u16be
    // fps | u32be count; frames themselves are untouched)
    val bytes = fixture("vid_00.gfv").clone()
    bytes(4) = 0; bytes(5) = 1 // fps 24 → 1
    val sampled = VideoFrames.sampledFrames(bytes)
    // 30 frames at 1 fps = 30,000 ms → 60 samples over 30 frames
    assert(sampled.length == 60)
    assert(sampled.map(_.frameIdx) == (0L until 30L).flatMap(i => Seq(i, i)))
    // the memo hands BOTH samples of a frame the same Decoded instance
    sampled.grouped(2).foreach { case Seq(a, b) =>
      assert(a.frame eq b.frame, s"frame ${a.frameIdx} decoded twice")
    }
  }

  test("malformed containers are rejected loudly") {
    val bytes = fixture("vid_01.gfv")
    intercept[IllegalArgumentException](VideoFrames.index("nope".getBytes))
    intercept[IllegalArgumentException](VideoFrames.index(bytes.take(bytes.length / 2)))
  }
}
