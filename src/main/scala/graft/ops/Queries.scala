package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** The relational / training-data operator catalog.
  *
  * Each query has a Spark DataFrame implementation here and (where ANSI-SQL
  * expressible) an exactly column-matched DuckDB oracle in
  * [[graft.SparkEntry.oracleSql]]. Numeric parity across engines is engineered,
  * not hoped for: money sums go through DECIMAL(18,2) (exact addition in both
  * engines), ratios are single double divisions of exact integers, and hashes
  * use md5/sha256 (identical hex in both).
  *
  * Operator coverage maps to SURVEY.md §2: scans/pruning (§2.1-2.2),
  * equi/semi/anti joins (§2.3), aggregations + grouping sets + rounded
  * percentages (§2.4), window functions/ordering (§2.5), top-k/offset-limit
  * (§2.6), set ops (§2.7), plus the training-data additions (dedup, minhash,
  * similarity search, text analysis, multimodal plumbing).
  */
object Queries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private val dec: DataType = DecimalType(18, 2)

  // ---- scans / filters / projections ---------------------------------------

  /** Projection + filter pushed to the parquet scan (SURVEY §2.2/§4). */
  def scanPrune(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
      .filter(col("n_chars") > 200)
      .orderBy("doc_id")

  /** Case-insensitive subset filter (`dataset.py:57-92`). */
  def ciFilter(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .filter(lower(trim(col("lang"))) === lit("de"))
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")

  /** Offset/limit windowing (`dataset.py:103-133`). */
  def offsetLimit(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
      .orderBy("doc_id")
      .offset(100).limit(50)

  // ---- aggregations ---------------------------------------------------------

  /** TPC-H Q1-style pricing summary; DECIMAL sums for cross-engine parity. */
  def aggPricing(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1997-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_base_price"),
        sum(col("l_extendedprice").cast(dec) * (lit(1).cast(dec) - col("l_discount").cast(dec)))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** The reference's three simultaneous group-bys (`metrics.py:50-78`) as one
    * GROUPING SETS aggregation.
    */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "documents").createOrReplaceTempView("documents_gs")
    spark.sql(
      """SELECT coalesce(lang, '(all)') AS lang_g, coalesce(source, '(all)') AS source_g,
        |       CAST(SUM(n_chars) AS DOUBLE) / COUNT(n_chars) AS avg_chars,
        |       COUNT(*) AS n
        |FROM documents_gs
        |GROUP BY GROUPING SETS ((lang), (source), (lang, source))
        |ORDER BY lang_g, source_g""".stripMargin)
  }

  /** ×100 / round-to-1-decimal metric formatting (`metrics.py:37-47`). */
  def roundedPct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy(col("lang"))
      .agg(round(
        lit(100.0) * sum(when(col("n_chars") > 200, 1L).otherwise(0L)) / count(lit(1)).cast("double"),
        1).as("pct_long"),
        count(lit(1)).as("n"))
      .orderBy("lang")

  /** Exact distinct counting per group. */
  def distinctUsers(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type")

  // ---- joins ----------------------------------------------------------------

  /** Broadcast equi-join + aggregate (customer is the small build side). */
  def joinAgg(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val customer = t(spark, dir, "customer")
    orders.join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(dec)).cast("double").as("revenue"))
      .orderBy("c_mktsegment")
  }

  /** Left-semi join: customers that have orders (EXISTS). */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val customer = t(spark, dir, "customer")
    val orders = t(spark, dir, "orders").select(col("o_custkey"))
    customer.join(orders, customer("c_custkey") === orders("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  /** Left-anti join: customers without orders (NOT EXISTS). */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val customer = t(spark, dir, "customer")
    val orders = t(spark, dir, "orders").select(col("o_custkey"))
    customer.join(orders, customer("c_custkey") === orders("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  // ---- windows / ordering ---------------------------------------------------

  /** Best-candidate rank (`_mineru25.py:408-427` shape): argmax per group via
    * row_number over a total order.
    */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_extendedprice").desc, col("l_linenumber").asc)
    t(spark, dir, "lineitem")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy("l_orderkey")
  }

  /** Running (cumulative) sum over a total order — the reference's
    * index-addressed reassembly/page_index analog (SURVEY §2.5).
    */
  def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "lineitem")
      .filter(col("l_suppkey") < 10)
      .withColumn("running_qty", sum(col("l_quantity").cast(dec)).over(w).cast("double"))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("running_qty"))
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
  }

  /** Top-k with total tiebreak (SURVEY §2.6). */
  def topK(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"), col("lang"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
      .limit(10)

  // ---- set operations (SURVEY §2.7) ----------------------------------------

  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val part = t(spark, dir, "part")
    val big = part.filter(col("p_size") > 25).select(col("p_partkey"))
    val cheap = part.filter(col("p_retailprice") < 1200.0).select(col("p_partkey"))
    big.except(cheap).orderBy("p_partkey")
  }

  // ---- time / semi-structured -----------------------------------------------

  /** Tumbling-window event aggregation (batch form; streaming twin below). */
  def timeWindow(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("min_v"), max(col("value")).as("max_v"))
      .orderBy("hour", "event_type")

  /** JSON path extraction from the events `props` column. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
      .orderBy("k")

  // ---- deduplication --------------------------------------------------------

  /** Documents plus deterministic near-duplicate copies — the dedup testbed
    * (both engines construct the same union).
    */
  private def docsWithDups(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").select(col("doc_id"), col("text"), col("lang"))
    val exact = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"), col("lang"))
    val near = docs.filter(col("doc_id") % 10 === 1)
      .select((col("doc_id") + 200000).as("doc_id"),
        regexp_replace(col("text"), "the", "teh").as("text"), col("lang"))
    docs.unionAll(exact).unionAll(near)
  }

  /** Exact dedup: hash-groupBy on content, keep the smallest id. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    docsWithDups(spark, dir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .orderBy("keep_id")

  /** MinHash signatures over word shingles using md5 (portable across engines);
    * the scale path hashes each word once per band and takes per-band minima
    * map-side (explode → partial min aggregation, no wide shuffle of text).
    */
  def minhashSig(spark: SparkSession, dir: String): DataFrame = {
    val words = docsWithDups(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    words.groupBy(col("doc_id"))
      .agg(
        min(md5(concat(lit("s0:"), col("w")))).as("sig0"),
        min(md5(concat(lit("s1:"), col("w")))).as("sig1"),
        min(md5(concat(lit("s2:"), col("w")))).as("sig2"),
        min(md5(concat(lit("s3:"), col("w")))).as("sig3"))
      .orderBy("doc_id")
  }

  /** MinHash+LSH candidate pairs: band buckets = hashes of signature pairs;
    * self-join within buckets only (the standard sub-quadratic dedup path).
    */
  def minhashPairs(spark: SparkSession, dir: String): DataFrame = {
    // an OR-of-equalities join degenerates to a nested-loop join; the LSH
    // band semantics are per-band equi-joins UNIONed — each one hash-joins
    // and scales (this is the whole point of banding)
    val sigs = minhashSig(spark, dir)
      .withColumn("b0", md5(concat(col("sig0"), col("sig1"))))
      .withColumn("b1", md5(concat(col("sig2"), col("sig3"))))
      .persist()
    val perBand = Seq("b0", "b1").map { band =>
      val left = sigs.select(col("doc_id").as("a"), col(band))
      val right = sigs.select(col("doc_id").as("b"), col(band).as("rb"))
      left.join(right, col(band) === col("rb"))
        .filter(col("a") < col("b"))
        .select(col("a"), col("b"))
    }
    perBand.reduce(_ unionAll _).distinct().orderBy("a", "b")
  }

  /** Word 3-gram Jaccard similarity for the LSH candidate pairs (exact
    * verification stage of near-dup detection). Spark-side only (set algebra
    * over shingles isn't portable ANSI SQL) — rows-only check.
    */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val docs = docsWithDups(spark, dir).select(col("doc_id"), col("text"))
    val pairs = minhashPairs(spark, dir)
    val shingles = docs.select(col("doc_id"), col("text"))
      .withColumn("words", split(col("text"), " "))
      .withColumn("grams", expr(
        "array_distinct(transform(sequence(0, greatest(size(words) - 3, 0)), i -> concat_ws(' ', slice(words, i + 1, 3))))"))
      .select(col("doc_id"), col("grams"))
      .persist() // joined twice (both pair sides) — avoid recomputing the shingling
    pairs
      .join(shingles.withColumnRenamed("doc_id", "a").withColumnRenamed("grams", "ga"), "a")
      .join(shingles.withColumnRenamed("doc_id", "b").withColumnRenamed("grams", "gb"), "b")
      .withColumn("inter", size(array_intersect(col("ga"), col("gb"))).cast("long"))
      .withColumn("uni", size(array_union(col("ga"), col("gb"))).cast("long"))
      .select(col("a"), col("b"), col("inter"), col("uni"),
        (col("inter").cast("double") / col("uni")).as("jaccard"))
      .filter(col("jaccard") >= 0.7)
      .orderBy("a", "b")
  }

  /** 64-bit SimHash from word xxhash64 (Spark-native hash; rows-only check). */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val words = docsWithDups(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .withColumn("h", xxhash64(col("w")))
    val bitCols = (0 until 64).map { i =>
      sum(when(col("h").bitwiseAND(lit(1L << i)) =!= 0L, 1L).otherwise(-1L)).as(s"bit$i")
    }
    val agg = words.groupBy(col("doc_id")).agg(bitCols.head, bitCols.tail: _*)
    val sig = (0 until 64).map(i => when(col(s"bit$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    agg.select(col("doc_id"), sig.as("simhash")).orderBy("doc_id")
  }

  // ---- similarity search -----------------------------------------------------

  /** Brute-force cosine top-k over the embedding column (baseline ANN).
    * Query side is broadcast (tiny); ranking via row_number with id tiebreak.
    */
  def embedTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
      .withColumn("v", expr("transform(embedding, x -> cast(x as double))"))
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val cand = emb.filter(col("vec_id") >= 5).select(col("vec_id"), col("v"))
    val dot = expr("aggregate(zip_with(qv, v, (x, y) -> x * y), 0D, (acc, e) -> acc + e)")
    val nq = expr("sqrt(aggregate(transform(qv, x -> x * x), 0D, (acc, e) -> acc + e))")
    val nv = expr("sqrt(aggregate(transform(v, x -> x * x), 0D, (acc, e) -> acc + e))")
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
    cand.crossJoin(broadcast(q))
      .withColumn("cos", dot / (nq * nv))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("q_id"), col("vec_id"), round(col("cos"), 4).as("cos4"), col("rn"))
      .orderBy("q_id", "rn")
  }

  /** LSH-bucketed ANN (scale path): sign-of-projection onto deterministic
    * pseudo-random hyperplanes → bucket; candidates meet only within buckets.
    * Rows-only check (hyperplane derivation is engine-specific).
    */
  def embedLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
      .withColumn("v", expr("transform(embedding, x -> cast(x as double))"))
    // plane p, dim i weight = sin(p * 64 + i) — deterministic, engine-side
    val bits = (0 until 8).map { p =>
      val proj = expr(
        s"aggregate(zip_with(v, transform(sequence(0, 63), i -> sin(cast(${p * 64} + i as double))), (x, w) -> x * w), 0D, (acc, e) -> acc + e)")
      when(proj > 0, lit(1 << p)).otherwise(0)
    }
    val bucketed = emb.select(col("vec_id"), col("label"), col("v"))
      .withColumn("bucket", bits.reduce((a: Column, b: Column) => a + b))
    bucketed.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), collect_list(col("vec_id")).as("members"))
      .select(col("bucket"), col("n"), sort_array(col("members")).as("members"))
      .orderBy("bucket")
  }

  // ---- text analysis ---------------------------------------------------------

  /** Token counting (whitespace split; SURVEY training-data ops). */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"),
        col("n_chars"))
      .orderBy("doc_id")

  /** Quality scoring: exact integer char/space/stopword counts + ratios. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("len", length(col("text")).cast("long"))
      .withColumn("n_space", (length(col("text")) - length(regexp_replace(col("text"), " ", ""))).cast("long"))
      .withColumn("the_bytes", (length(concat(lit(" "), col("text"), lit(" "))) -
        length(regexp_replace(concat(lit(" "), col("text"), lit(" ")), " the ", ""))).cast("long"))
      .select(col("doc_id"), col("len"), col("n_space"), col("the_bytes"),
        (col("n_space").cast("double") / col("len")).as("space_ratio"))
      .orderBy("doc_id")

  /** Language-ID marker scores (exact integer occurrence arithmetic; the
    * argmax labeling lives in [[langId]]).
    */
  def langidScores(spark: SparkSession, dir: String): DataFrame = {
    def occBytes(marker: String): Column =
      (length(concat(lit(" "), col("text"), lit(" "))) -
        length(regexp_replace(concat(lit(" "), col("text"), lit(" ")),
          s" $marker ", ""))).cast("long")
    t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        occBytes("the").as("score_en"),
        occBytes("der").as("score_de"),
        occBytes("el").as("score_es"))
      .orderBy("doc_id")
  }

  /** Heuristic language-ID label (argmax of marker scores; rows-only). */
  def langId(spark: SparkSession, dir: String): DataFrame =
    langidScores(spark, dir)
      .withColumn("lang_pred",
        when(col("score_de") > col("score_en") && col("score_de") > col("score_es"), "de")
          .when(col("score_es") > col("score_en") && col("score_es") >= col("score_de"), "es")
          .otherwise("en"))
      .select(col("doc_id"), col("lang"), col("lang_pred"))
      .orderBy("doc_id")

  /** ROLLUP aggregation (hierarchical grouping-sets form). */
  def rollupStats(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .rollup(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"),
        (sum(col("n_chars")).cast("double") / count(col("n_chars"))).as("avg_chars"))
      .select(coalesce(col("lang"), lit("(all)")).as("lang_g"),
        coalesce(col("source"), lit("(all)")).as("source_g"), col("n"), col("avg_chars"))
      .orderBy("lang_g", "source_g")

  /** INTERSECT set operation. */
  def setIntersect(spark: SparkSession, dir: String): DataFrame = {
    val part = t(spark, dir, "part")
    val big = part.filter(col("p_size") > 20).select(col("p_partkey"))
    val cheap = part.filter(col("p_retailprice") < 1500.0).select(col("p_partkey"))
    big.intersect(cheap).orderBy("p_partkey")
  }

  /** Approximate distinct counting (HLL sketch; engine-specific estimates —
    * rows-only check, with the exact count alongside for sanity).
    */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .orderBy("event_type")

  /** Rolling-hash document fingerprint (polynomial 64-bit over codepoints;
    * Spark-side deterministic, rows-only check).
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val fp = udf { (text: String) =>
      var h = 1469598103934665603L
      var i = 0
      while (i < text.length) { h = h * 31 + text.charAt(i); i += 1 }
      h
    }
    t(spark, dir, "documents")
      .select(col("doc_id"), fp(col("text")).as("fingerprint"))
      .orderBy("doc_id")
  }

  /** Raw-text NLS evaluation rows (`evaluate_page.py:97-103` arithmetic) over
    * deterministic corrupted predictions — levenshtein is built-in (and
    * identical) in both engines.
    */
  def nlsEval(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("pred", regexp_replace(col("text"), "the", "teh"))
      .withColumn("lev", levenshtein(col("pred"), col("text")).cast("long"))
      .withColumn("maxlen", greatest(length(col("pred")), length(col("text"))))
      .select(col("doc_id"), col("lang"), col("lev"),
        (lit(1.0) - col("lev").cast("double") / col("maxlen")).as("nls"))
      .orderBy("doc_id")

  // ---- multimodal plumbing ----------------------------------------------------

  /** Opaque-binary column plumbing: utf-8 encode → BinaryType, byte length +
    * sha256 digest (the decode/feature steps on real media are stubbed — the
    * schema, partitioning and digest path are real).
    */
  def multimodalSha(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("payload", encode(col("text"), "utf-8"))
      .select(col("doc_id"), octet_length(col("payload")).cast("long").as("n_bytes"),
        sha2(col("payload"), 256).as("sha"))
      .orderBy("doc_id")
}
