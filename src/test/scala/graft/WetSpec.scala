package graft

import graft.jobs.WetExport
import graft.sources.Warc
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** WET sink: docs-shaped rows → Common-Crawl-style conversion records,
  * round-tripped through the project's own WARC reader, byte-deterministic
  * across reruns.
  */
class WetSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("wetspec").toString

  private def docsDf() = {
    import spark.implicits._
    // spans deliberately OUT of offset order for doc u2 — the sink must
    // offset-sort, not trust array order; u3 is image-only → empty text
    Seq(
      ("https://h/u1", Seq(("heading", "Title One", "", 0),
        ("text", "first paragraph", "", 1),
        ("image", "a caption", "media://x", 2),
        ("text", "último párrafo 中文", "", 3))),
      ("https://h/u2", Seq(("text", "tail line", "", 2),
        ("heading", "Title Two", "", 0),
        ("text", "middle line", "", 1))),
      ("https://h/u3", Seq(("image", "only a figure", "media://y", 0)))
    ).toDF("doc_id", "raw")
      .selectExpr("doc_id",
        "transform(raw, r -> struct(r._1 AS kind, r._2 AS text, r._3 AS media_ref, r._4 AS offset)) AS spans")
  }

  private def readBack(dir: String): Map[String, String] = {
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.wet.gz")).sortBy(_.getName)
    files.flatMap { f =>
      Warc.records(java.nio.file.Files.readAllBytes(f.toPath)).map { r =>
        assert(r.warcType == "conversion")
        assert(r.httpStatus == 0) // non-HTTP payload kept raw
        r.targetUri -> new String(r.body, java.nio.charset.StandardCharsets.UTF_8)
      }
    }.toMap
  }

  test("round-trips through the WARC reader with offset-ordered text") {
    val out = tmpDir()
    val (docs, bytes) = WetExport.export(docsDf(), out, files = 2)
    assert(docs == 3L && bytes > 0L)
    val got = readBack(out)
    assert(got.keySet == Set("https://h/u1", "https://h/u2", "https://h/u3"))
    // image spans excluded, utf-8 preserved
    assert(got("https://h/u1") ==
      "Title One\nfirst paragraph\núltimo párrafo 中文")
    // out-of-order input spans came out offset-sorted
    assert(got("https://h/u2") == "Title Two\nmiddle line\ntail line")
    // an image-only doc converts to an empty text record, not a dropped one
    assert(got("https://h/u3") == "")
  }

  test("hash-empty partitions still emit VALID gzip WET files, not 0-byte ones") {
    val out = tmpDir()
    val (docs, _) = WetExport.export(docsDf(), out, files = 8) // 3 docs, ≥5 empty parts
    assert(docs == 3L)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".warc.wet.gz")).sortBy(_.getName)
    assert(files.length == 8)
    files.foreach { f =>
      assert(f.length > 0L, s"${f.getName} is zero bytes — not a gzip stream")
      // every file must gunzip end-to-end (an empty member decodes to "")
      val in = new java.util.zip.GZIPInputStream(
        java.nio.file.Files.newInputStream(f.toPath))
      try { val buf = new Array[Byte](8192); while (in.read(buf) >= 0) () }
      finally in.close()
    }
    assert(readBack(out).keySet.size == 3) // empty members add no records
  }

  test("re-export is byte-identical (deterministic partitioning + framing)") {
    val outA = tmpDir()
    val outB = tmpDir()
    WetExport.export(docsDf(), outA, files = 2)
    WetExport.export(docsDf(), outB, files = 2)
    val bytesOf = (d: String) => new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".warc.wet.gz")).sortBy(_.getName)
      .map(f => f.getName -> java.nio.file.Files.readAllBytes(f.toPath).toVector).toMap
    assert(bytesOf(outA) == bytesOf(outB))
    // rerun over the SAME directory converges too (tmp + atomic rename)
    WetExport.export(docsDf(), outA, files = 2)
    assert(bytesOf(outA) == bytesOf(outB))
  }

  test("exports the crawl-ingest docs snapshot end-to-end") {
    val crawlOut = tmpDir()
    graft.jobs.WarcIngestJob.run(spark,
      graft.jobs.WarcIngestJob.Args(files = 4, pagesPerFile = 6, out = crawlOut,
        groupSize = 2, clock = () => 1000L))
    val wetOut = tmpDir()
    val docs = graft.storage.Snapshots.read(spark, s"$crawlOut/docs", 42L)
    val (n, _) = WetExport.export(docs, wetOut, files = 2)
    assert(n == docs.count())
    val got = readBack(wetOut)
    // a known page's text is its construction-derived heading + paragraphs
    val pid = graft.sources.WarcGen.extractablePageIds(0, 6).head
    val expected = graft.sources.WarcGen.expectedSpans(pid, 42L)
      .filter(s => s.kind == "heading" || s.kind == "text")
      .map(_.text).mkString("\n")
    assert(got(graft.sources.WarcGen.uriOf(pid)) == expected)
  }
}
