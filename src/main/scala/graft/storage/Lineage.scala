package graft.storage

import graft.model.LineageRow
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Per-partition lineage/metrics table (north_rule: every stage writes
  * per-partition lineage rows — input snapshot id, partition hash, span
  * counts, divergence — so the job resumes from the last committed
  * checkpoint without recomputation).
  *
  * Rows are appended one file per committed bucket group via atomic rename,
  * so a kill between groups leaves a consistent, readable table.
  */
object Lineage {

  def dir(root: String): String = s"$root/lineage"

  def append(spark: SparkSession, root: String, rows: Seq[LineageRow]): Unit = {
    import spark.implicits._
    val d = dir(root)
    Files.createDirectories(Paths.get(d))
    val groupId = rows.map(_.partition_id).min
    val tmp = s"$root/.lineage-tmp-$groupId"
    spark.createDataset(rows).coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).filter(_.toString.endsWith(".parquet")).findFirst().get()
    Files.move(part, Paths.get(s"$d/group-$groupId.parquet"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  def read(spark: SparkSession, root: String): Dataset[LineageRow] = {
    import spark.implicits._
    val d = dir(root)
    if (!Files.exists(Paths.get(d)) || !Files.list(Paths.get(d)).findFirst().isPresent)
      spark.emptyDataset[LineageRow]
    else {
      // schema tolerance: lineage written before `error_count` was added to
      // [[LineageRow]] must still resume (the encoder would otherwise fail
      // analysis with "cannot resolve 'error_count'" — aborting the exact
      // job this table exists to make resumable); absent means zero errors
      val raw = spark.read.parquet(d)
      val full =
        if (raw.columns.contains("error_count")) raw
        else raw.withColumn("error_count", org.apache.spark.sql.functions.lit(0L))
      full.as[LineageRow]
    }
  }

  /** Buckets already committed — the resume filter is a left-anti join of the
    * work list against this set.
    */
  def committedPartitions(spark: SparkSession, root: String): Set[Int] = {
    import spark.implicits._
    read(spark, root).map(_.partition_id).collect().toSet
  }
}
