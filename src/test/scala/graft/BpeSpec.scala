package graft

import graft.ops.Queries
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** BPE tokenizer training vs hand-computed merge tables (the Sennrich
  * worked example plus tie-break and greedy-overlap cases), and the
  * differential contract against the Python trainer twin's fixture.
  */
class BpeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def mergesOf(texts: Seq[String]): Seq[(Int, String, String, String, Long)] = {
    import spark.implicits._
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    Queries.bpeMergesFrom(spark, docs)
      .as[(Int, String, String, String, Long)].collect().toSeq
  }

  test("learns the classic low/lower merges with deterministic tie-breaks") {
    // low ×3, lower ×2, newest ×1: round 1 ties (l,o) and (o,w) at 5 —
    // lexicographic ascending picks (l,o); rounds cascade lo→low→low</w>;
    // round 4 ties (e,r)/(low,e)/(r,</w>) at 2 — "e" < "low" < "r"
    val got = mergesOf(Seq("low low low", "lower lower", "newest"))
    assert(got.take(4) == Seq(
      (1, "l", "o", "lo", 5L),
      (2, "lo", "w", "low", 5L),
      (3, "low", "</w>", "low</w>", 3L),
      (4, "e", "r", "er", 2L)))
    assert(got.length == Queries.BpeMergeRounds)
  }

  test("counts overlapping adjacencies but applies merges greedily") {
    // "aaa" → a a a </w>: pair (a,a) occurs at two positions (count 2);
    // greedy left-to-right application yields [aa, a, </w>], so round 2's
    // candidates are (aa,a) and (a,</w>) tied at 1 — "a" < "aa" wins
    val got = mergesOf(Seq("aaa"))
    assert(got.take(2) == Seq(
      (1, "a", "a", "aa", 2L),
      (2, "a", "</w>", "a</w>", 1L)))
  }

  test("stops when no pairs remain instead of looping") {
    // single-letter words: symbols are [x, </w>] — one pair each; after a
    // few merges nothing adjacent is left and training stops early
    val got = mergesOf(Seq("a b a"))
    assert(got.map(m => (m._2, m._3)).head == (("a", "</w>")))
    assert(got.length < Queries.BpeMergeRounds)
  }

  test("merges never cross the end-of-word sentinel into the next word") {
    // if pairs crossed words, (</w>, x) pairs would appear; they never do
    val got = mergesOf(Seq("ab ab ab ba"))
    got.foreach { case (_, l, _, _, _) => assert(!l.endsWith("</w>")) }
  }

  test("encode replays the learned merges to a pinned symbol stream") {
    import spark.implicits._
    // corpus ["aaa"]: merges = (a,a)→aa, (a,</w>)→a</w>, (aa,a</w>)→aaa</w>
    // then no pairs remain; encoding "aaa aaa" yields two aaa</w> symbols
    val docs = Seq((0L, "aaa aaa"), (1L, "aaa"), (2L, ""))
      .toDF("doc_id", "text")
    val got = Queries.bpeEncodeFrom(spark, docs)
      .as[(Long, Long, String)].collect().toSeq
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String): String =
      md5.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got == Seq(
      (0L, 2L, hex("aaa</w> aaa</w>")),
      (1L, 1L, hex("aaa</w>")),
      (2L, 0L, hex(""))))
  }

  test("the committed fixture matches this trainer on the sf0.001 slice") {
    // differential smoke vs the Python twin's convention (full agreement is
    // the q_bpe_merges oracle at sf0.01): same split, sentinel, tie-break
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Queries.bpeMergesFrom(spark, docs)
      .as[(Int, String, String, String, Long)].collect()
    assert(got.length == Queries.BpeMergeRounds)
    // merge table is a chain: every later left/right is a prior merged
    // symbol or a single code point (+sentinel)
    val known = scala.collection.mutable.Set[String]("</w>")
    got.foreach { case (_, l, r, m, cnt) =>
      assert(cnt > 0)
      def ok(s: String): Boolean =
        known.contains(s) || s.codePointCount(0, s.length) == 1
      assert(ok(l) && ok(r), s"$l + $r must be single symbols or prior merges")
      known += m
    }
  }
}
