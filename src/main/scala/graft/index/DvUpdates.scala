package graft.index

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Numeric doc-values updates — `IndexWriter.updateNumericDocValue`
  * (`index/IndexWriter.java:1602-1637`): change a doc's numeric field
  * WITHOUT re-indexing it. The reference stacks per-segment "DV update
  * gen" files that readers overlay over the base doc values; this engine
  * does the same with write-once batches under `$dir/dvupdates/` —
  * (docId, field, value) rows, later batches win — overlaid on the row
  * store by every doc-values consumer (sort-by-field local+distributed,
  * expression/function queries, multi-field sort). `fold` bakes the
  * overlay into a new snapshot's row store, the merge-time counterpart.
  *
  * Tombstone-sized by design: the overlay loads as per-field maps into
  * the query broadcast; a corpus-sized overlay wants `fold`, same as
  * corpus-sized deletes want expunge.
  */
object DvUpdates {

  private val BatchName = """upd-(\d+)-.*""".r

  private def batches(dir: String): Seq[(Int, String)] = {
    val f = new java.io.File(s"$dir/dvupdates")
    if (!f.isDirectory) Nil
    else f.listFiles().filter(_.isDirectory).toSeq.flatMap(b => b.getName match {
      case BatchName(seq) => Some(seq.toInt -> b.getPath)
      case _ => None
    }).sortBy(_._1)
  }

  /** Append one update batch (later batches overwrite earlier ones). */
  def updateNumeric(spark: SparkSession, dir: String, field: String,
      updates: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    require(updates.nonEmpty, "empty update batch")
    val seq = batches(dir).lastOption.map(_._1 + 1).getOrElse(0)
    val path = s"$dir/dvupdates/upd-$seq-${java.util.UUID.randomUUID().toString.take(8)}"
    updates.map { case (id, v) => (id, field, v) }
      .toDF("docId", "field", "value")
      .coalesce(1).write.mode("errorifexists").parquet(path)
  }

  /** Update-by-term (the reference's actual signature shape:
    * updateNumericDocValue(Term, field, value)) — every doc matching
    * `term` gets `value`; resolution is a bucket-pruned segment read.
    */
  def updateByTerm(spark: SparkSession, dir: String, term: String,
      field: String, value: Long): Long = {
    val m = IndexBuilder.readManifest(dir).getOrElse(sys.error(s"no manifest at $dir"))
    val bucket = IndexBuilder.bucketOf(term, m.numBuckets)
    val paths = m.completedGroups.map(g => s"$dir/segments/grp=$g")
    val rows = paths.map(p => spark.read.option("basePath", p).parquet(p))
      .reduce(_ unionByName _)
      .filter(col("bucket") === bucket && col("term") === term)
      .select("docBlocks", "skipData").collect()
    val ids = rows.flatMap(r => PostingsCodec.decode(
      r.getAs[Array[Byte]]("docBlocks"), r.getAs[Array[Byte]]("skipData")).docs)
      .distinct
    if (ids.nonEmpty)
      updateNumeric(spark, dir, field, ids.toSeq.map(_ -> value))
    ids.length.toLong
  }

  /** The effective overlay: field → (docId → value), later batches win. */
  def load(spark: SparkSession, dir: String): Map[String, Map[Long, Long]] = {
    val bs = batches(dir)
    if (bs.isEmpty) return Map.empty
    val acc = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Map[Long, Long]]
    bs.foreach { case (_, path) =>
      spark.read.parquet(path).select("docId", "field", "value").collect()
        .foreach { r =>
          acc.getOrElseUpdate(r.getString(1), scala.collection.mutable.Map.empty)
            .update(r.getLong(0), r.getLong(2))
        }
    }
    acc.map { case (f, m) => f -> m.toMap }.toMap
  }

  /** Bake the overlay into a fresh snapshot: row store rewritten with the
    * effective values, dvupdates dir absent in the output; segments,
    * stats, termdict and lineage are SHARED (links) — updates never touch
    * postings. The merge-time counterpart of the reference's DV-gen files
    * being collapsed by SegmentMerger.
    */
  def fold(spark: SparkSession, dir: String, outDir: String,
      snapshotId: String): Unit = {
    val ups = load(spark, dir)
    require(ups.nonEmpty, s"no dv updates to fold at $dir")
    new java.io.File(outDir).mkdirs()
    val b = spark.sparkContext.broadcast(ups)
    val docs0 = spark.read.parquet(s"$dir/docs")
    val folded = ups.keys.foldLeft(docs0) { (df, f) =>
      val upd = udf((id: Long, cur: Long) => b.value(f).getOrElse(id, cur))
      df.withColumn(f, upd(col("docId"), col(f).cast("long")))
    }
    folded.write.mode("overwrite").parquet(s"$outDir/docs")
    def link(sub: String): Unit = {
      val s = java.nio.file.Paths.get(s"$dir/$sub").toAbsolutePath.normalize()
      val d = java.nio.file.Paths.get(s"$outDir/$sub")
      if (java.nio.file.Files.exists(s) && !java.nio.file.Files.exists(d)) {
        java.nio.file.Files.createDirectories(d.getParent)
        try java.nio.file.Files.createSymbolicLink(d, s)
        catch { case _: Exception =>
          org.apache.commons.io.FileUtils.copyDirectory(s.toFile, d.toFile) }
      }
    }
    val m = IndexBuilder.readManifest(dir).getOrElse(sys.error(s"no manifest at $dir"))
    m.completedGroups.foreach(g => link(s"segments/grp=$g"))
    link("termstats"); link("termdict"); link("lineage")
    // deletes (if any) remain pending — fold only collapses the overlay
    if (new java.io.File(s"$dir/deletes").isDirectory) link("deletes")
    IndexBuilder.commitManifest(outDir, m.copy(snapshotId = snapshotId))
  }
}
