package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.index.{IndexBuilder, Replicator}
import graft.index.IndexBuilder.BuildConfig
import graft.search._

/** Replication law (lucene/replicator): delta-only pulls, commit file
  * last, dropped revisions cleaned after the new one is whole.
  */
class ReplicatorSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  private val tmp = java.nio.file.Files.createTempDirectory("graft-repl").toString
  private val cfg = BuildConfig(numBuckets = 4, numDocShards = 2,
    saltThreshold = 100000L)

  private def build(n: Int, seed: Long, dir: String): Unit = {
    import spark.implicits._
    val df = Corpus.generate(n, seed = seed)
      .sortBy(f => (f.repo, f.path, f.commit)).zipWithIndex
      .map { case (f, i) => (i.toLong, f.repo, f.path, f.commit, f.lang, f.content) }
      .toDF("docId", "repo", "path", "commit", "lang", "content")
    val ix = IndexBuilder.buildLogical(df, "content", Some("docId"), Nil, cfg)
    IndexBuilder.writeIndex(ix, dir, s"snap-$seed", numGroups = 1)
    ix.unpersistCached(); ix.postings.unpersist()
  }

  private def hits(dir: String, q: Query): Seq[(Long, Double)] =
    SegmentSearcher.search(spark, SegmentSearcher.load(dir), q, 10)
      .map(h => (h.docId, h.score)).toSeq

  test("full sync replicates a revision; re-sync is a zero-file no-op") {
    build(120, 7L, s"$tmp/pub/snap=0")
    val r1 = Replicator.sync(s"$tmp/pub", s"$tmp/replica")
    assert(r1.copied.nonEmpty && r1.deleted.isEmpty)
    assert(hits(s"$tmp/replica/snap=0", TermQ("def")) ===
      hits(s"$tmp/pub/snap=0", TermQ("def")))
    val r2 = Replicator.sync(s"$tmp/pub", s"$tmp/replica")
    assert(r2.copied.isEmpty && r2.deleted.isEmpty && r2.bytesCopied === 0L)
  }

  test("a new batch replicates as exactly its own files (delta, not index)") {
    build(80, 11L, s"$tmp/pub/snap=1")
    val r = Replicator.sync(s"$tmp/pub", s"$tmp/replica")
    assert(r.copied.nonEmpty)
    assert(r.copied.forall(_.startsWith("snap=1/")),
      s"delta leaked outside the new batch: ${r.copied.filterNot(_.startsWith("snap=1/"))}")
    assert(hits(s"$tmp/replica/snap=1", TermQ("def")) ===
      hits(s"$tmp/pub/snap=1", TermQ("def")))
  }

  test("commit files are copied after every data file") {
    val dir = s"$tmp/pub2"
    build(60, 13L, s"$dir/snap=0")
    val r = Replicator.sync(dir, s"$tmp/replica2")
    val idxManifest = r.copied.indexWhere(_.endsWith("manifest.json"))
    assert(idxManifest >= 0)
    assert(r.copied.drop(idxManifest).forall(_.endsWith("manifest.json")),
      "a data file was copied after a commit file")
  }

  test("dropped revisions are cleaned from the replica") {
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(s"$tmp/pub/snap=0"))
    val r = Replicator.sync(s"$tmp/pub", s"$tmp/replica")
    assert(r.deleted.nonEmpty && r.deleted.forall(_.startsWith("snap=0/")))
    assert(!new java.io.File(s"$tmp/replica/snap=0").exists())
    // the surviving revision is untouched and still searchable
    assert(hits(s"$tmp/replica/snap=1", TermQ("def")).nonEmpty)
  }

  test("a torn pull (size-mismatched file) is repaired on the next sync") {
    val manifest = new java.io.File(s"$tmp/replica/snap=1/manifest.json")
    val segDir = new java.io.File(s"$tmp/replica/snap=1")
    val victim = segDir.listFiles().filter(_.isDirectory).head
      .listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .headOption.getOrElse(manifest)
    java.nio.file.Files.write(victim.toPath, Array[Byte](1, 2, 3))
    val r = Replicator.sync(s"$tmp/pub", s"$tmp/replica")
    assert(r.copied.nonEmpty)
    assert(hits(s"$tmp/replica/snap=1", TermQ("def")) ===
      hits(s"$tmp/pub/snap=1", TermQ("def")))
  }
}
