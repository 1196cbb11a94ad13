package graft.index

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder.Manifest

/** Term-hash resharding — the index-split operation class of the
  * reference's `misc/index/IndexSplitter.java:49` and
  * `MultiPassIndexSplitter.java:40` (re-cut a committed index into a
  * different number of parts WITHOUT re-indexing), re-expressed on this
  * engine's scale axis: the term-hash bucket count.
  *
  * Because a posting list's bytes depend only on (term, salt, docIds) —
  * never on which bucket file holds them — changing `numBuckets` is a
  * pure re-keying: one shuffle of the already-encoded blobs by the new
  * `bucketOf(term, newNb)`, zero decode/re-encode (asserted byte-identical
  * in ReshardSpec). At 10¹² files this is the "scale out the query tier"
  * move: 32 → 256 buckets costs one pass over segment METADATA+blobs,
  * while a rebuild would re-tokenize the full corpus.
  *
  * The docId-space artifacts (row store, docs lineage, termdict sidecar —
  * all bucket-count independent) are shared, not copied: symlinked on a
  * local filesystem, with a recursive copy fallback where links are
  * unsupported. In a cluster deployment these are a shared object-store
  * prefix. `termstats` IS bucket-partitioned, so it is re-keyed the same
  * way as the segments (it is ~vocabulary-sized, not corpus-sized).
  *
  * Salting is untouched: `numDocShards` and `saltThreshold` carry over,
  * so the (term, salt) list structure — and therefore every blob — is
  * preserved verbatim. Scores are rank-identical by construction (the
  * gate pins q_reshard_term/or2 against the UNSHARDED oracles).
  */
object Reshard {

  def reshard(spark: SparkSession, dir: String, outDir: String,
      newNumBuckets: Int, snapshotId: String): Manifest = {
    require(newNumBuckets > 0, s"newNumBuckets must be positive: $newNumBuckets")
    val m = IndexBuilder.readManifest(dir)
      .getOrElse(sys.error(s"no manifest at $dir"))
    new java.io.File(outDir).mkdirs()

    // segments: re-key encoded rows by the new term-hash; blobs verbatim
    val nb = newNumBuckets
    val bucketUdf = udf((t: String) => IndexBuilder.bucketOf(t, nb))
    val segs = m.completedGroups
      .map { g =>
        val p = s"$dir/segments/grp=$g"
        val raw = spark.read.option("basePath", p).parquet(p)
        val r1 =
          if (raw.columns.contains("posBlocks")) raw
          else raw.withColumn("posBlocks", lit(Array.empty[Byte]))
        if (r1.columns.contains("payBlocks")) r1
        else r1.withColumn("payBlocks", lit(Array.empty[Byte]))
      }
      .reduce(_ unionByName _)
      .withColumn("bucket", bucketUdf(col("term")))
      .select("bucket", "term", "salt", "df", "maxTf",
        "docBlocks", "skipData", "posBlocks", "payBlocks")
    segs
      .repartition(math.max(spark.sessionState.conf.numShufflePartitions, 1),
        col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$outDir/segments/grp=0")

    // termstats: same re-key (vocabulary-sized)
    spark.read.parquet(s"$dir/termstats")
      .select("term", "df", "ttf")
      .withColumn("bucket", bucketUdf(col("term")))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$outDir/termstats")

    // the bloom sidecar keys bits by bucketOf(term, numBuckets) — a
    // re-cut bucket count invalidates every filter, so REBUILD from the
    // re-keyed vocabulary (unlike the blobs, which are bucket-agnostic)
    if (m.bloom)
      IndexBuilder.writeBloomSidecar(spark,
        spark.read.parquet(s"$outDir/termstats"), outDir, nb, m.docCount)

    // bucket-independent artifacts are SHARED, not rewritten
    linkOrCopy(s"$dir/docs", s"$outDir/docs")
    if (new java.io.File(s"$dir/termdict").isDirectory)
      linkOrCopy(s"$dir/termdict", s"$outDir/termdict")
    if (new java.io.File(s"$dir/lineage/docs").isDirectory) {
      new java.io.File(s"$outDir/lineage").mkdirs()
      linkOrCopy(s"$dir/lineage/docs", s"$outDir/lineage/docs")
    }

    // per-bucket lineage over the re-keyed segments (same aggregate shape
    // as Merge's — the resume/verify machinery reads it identically)
    spark.read.parquet(s"$outDir/segments/grp=0")
      .groupBy("bucket")
      .agg(count(lit(1)).as("postingLists"),
        sum("df").cast("long").as("postingCount"),
        sum(length(col("docBlocks")) + length(col("skipData")))
          .cast("long").as("bytesWritten"),
        expr("bit_xor(xxhash64(term, salt, docBlocks))").as("contentDigest"))
      .withColumn("snapshotId", lit(snapshotId))
      .write.mode("overwrite").parquet(s"$outDir/lineage/grp=0")

    // docIds and their order are untouched, so indexSort survives (unlike
    // merge, which interleaves docId ranges)
    val manifest = m.copy(snapshotId = snapshotId, numBuckets = nb,
      completedGroups = Seq(0), numGroups = 1)
    IndexBuilder.commitManifest(outDir, manifest)
    manifest
  }

  /** Symlink `src` at `dst`; recursive copy where the filesystem refuses
    * links. Shared-not-copied is the point at scale — the row store is
    * the corpus-sized artifact and reshard never touches it.
    */
  private def linkOrCopy(src: String, dst: String): Unit = {
    import java.nio.file.{Files, Paths}
    val s = Paths.get(src).toAbsolutePath.normalize()
    val d = Paths.get(dst)
    if (Files.exists(d)) return
    try Files.createSymbolicLink(d, s)
    catch {
      case _: Exception =>
        org.apache.commons.io.FileUtils.copyDirectory(s.toFile, d.toFile)
    }
  }
}
