package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot DELTA — the maintenance operator of a corpus fed by repeated
  * crawls: given two keyed generations of a table, classify every key as
  * `added` / `removed` / `changed` / `unchanged`, so the next pipeline run
  * touches only the delta instead of reprocessing 10^12 documents.
  *
  * Shape: each side projects to (key, xxhash64(content)) FIRST — the wide
  * payload never ships, only an 8-byte digest per row — then ONE
  * full-outer equi-join on the key decides the status. At scale that is
  * one hash-partition shuffle per side, of 16 bytes per row regardless of
  * document width — the projection below the exchange is the whole
  * optimization. (Hive-style `partitionBy` directories, the layout
  * [[graft.storage.Snapshots]] writes, do NOT co-locate join keys, so the
  * shuffle is not elidable with this storage layer; eliding it would need
  * catalog-registered `bucketBy` tables.) Status semantics follow the
  * crawl convention: content
  * equality means byte equality of the projected content column (hash
  * equality internally; a 64-bit collision misclassifying a changed doc
  * as unchanged is accepted at ~2^-64 per pair, the standard trade).
  */
object SnapshotDelta {

  /** @param key     join key column name present in both frames
    * @param content content column whose equality defines `unchanged`
    */
  def delta(a: DataFrame, b: DataFrame, key: String, content: Column): DataFrame = {
    val ha = a.select(col(key), xxhash64(content).as("h_a"))
    val hb = b.select(col(key), xxhash64(content).as("h_b"))
    ha.join(hb, Seq(key), "full_outer")
      .select(col(key),
        when(col("h_a").isNull, lit("added"))
          .when(col("h_b").isNull, lit("removed"))
          .when(col("h_a") === col("h_b"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }
}
