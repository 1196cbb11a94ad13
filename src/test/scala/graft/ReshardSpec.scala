package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core._
import graft.index.{IndexBuilder, Reshard}
import graft.index.IndexBuilder.BuildConfig
import graft.search._

/** Term-hash resharding (the IndexSplitter/MultiPassIndexSplitter
  * operation class): re-cutting a committed index to a different bucket
  * count must (a) answer every query rank-identically, (b) move the
  * encoded blobs VERBATIM — zero decode/re-encode — and (c) share, not
  * copy, the bucket-independent artifacts (row store, termdict, docs
  * lineage).
  */
class ReshardSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  private val tmp = java.nio.file.Files.createTempDirectory("graft-reshard").toString
  private val cfg = BuildConfig(numBuckets = 4, numDocShards = 2,
    saltThreshold = 150L)

  private lazy val built: String = {
    import spark.implicits._
    val files = Corpus.generate(300, seed = 47L)
    val df = files.sortBy(f => (f.repo, f.path, f.commit)).zipWithIndex
      .map { case (f, i) => (i.toLong, f.repo, f.path, f.commit, f.lang, f.content) }
      .toDF("docId", "repo", "path", "commit", "lang", "content")
    val ix = IndexBuilder.buildLogical(df, "content", Some("docId"), Nil, cfg)
    IndexBuilder.writeIndex(ix, s"$tmp/base", "snap-base", numGroups = 2)
    ix.unpersistCached(); ix.postings.unpersist()
    s"$tmp/base"
  }

  private val queries = Seq[Query](
    TermQ("def"), TermQ("index"),
    Query.and(TermQ("index"), TermQ("merge")),
    Query.orMin(2, TermQ("spark"), TermQ("val"), TermQ("score")),
    Query.not(TermQ("class"), TermQ("spark")),
    PhraseQ(Seq("public", "void")))

  private def hits(dir: String, q: Query): Seq[(Long, Double)] =
    SegmentSearcher.search(spark, SegmentSearcher.load(dir), q, 20)
      .map(h => (h.docId, h.score)).toSeq

  /** Multiset fingerprint of every (term, salt, blob) — byte-identity
    * across the reshard proves no decode/re-encode happened.
    */
  private def blobFingerprint(dir: String): (Long, Long) = {
    val m = IndexBuilder.readManifest(dir).get
    val paths = m.completedGroups.map(g => s"$dir/segments/grp=$g")
    val df = paths.map(p => spark.read.option("basePath", p).parquet(p))
      .reduce(_ unionByName _)
    val r = df.agg(count(lit(1)),
      expr("bit_xor(xxhash64(term, salt, docBlocks, skipData, posBlocks, payBlocks))"))
      .collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  test("reshard up (4 -> 7 buckets): rank-identical, blobs verbatim") {
    val m = Reshard.reshard(spark, built, s"$tmp/up", 7, "snap-up")
    assert(m.numBuckets === 7)
    assert(m.docCount === IndexBuilder.readManifest(built).get.docCount)
    for (q <- queries)
      assert(hits(s"$tmp/up", q) === hits(built, q), s"q=$q")
    assert(blobFingerprint(s"$tmp/up") === blobFingerprint(built))
    // rows actually live in their NEW bucket partition
    val seg = spark.read.option("basePath", s"$tmp/up/segments/grp=0")
      .parquet(s"$tmp/up/segments/grp=0")
    val bad = seg.select("term", "bucket").collect()
      .count(r => IndexBuilder.bucketOf(r.getString(0), 7) != r.getInt(1))
    assert(bad === 0)
  }

  test("reshard down (4 -> 2 buckets): rank-identical") {
    Reshard.reshard(spark, built, s"$tmp/down", 2, "snap-down")
    for (q <- queries)
      assert(hits(s"$tmp/down", q) === hits(built, q), s"q=$q")
    assert(blobFingerprint(s"$tmp/down") === blobFingerprint(built))
  }

  test("row store, termdict and docs lineage are shared, not copied") {
    Reshard.reshard(spark, built, s"$tmp/shared", 3, "snap-shared")
    import java.nio.file.{Files, Paths}
    for (sub <- Seq("docs", "termdict", "lineage/docs")) {
      val p = Paths.get(s"$tmp/shared/$sub")
      assert(Files.isSymbolicLink(p), s"$sub should be a link")
      assert(p.toRealPath() === Paths.get(s"$built/$sub").toRealPath())
    }
    // stats were re-keyed, not linked (they are bucket-partitioned)
    assert(!Files.isSymbolicLink(Paths.get(s"$tmp/shared/termstats")))
    val st = spark.read.parquet(s"$tmp/shared/termstats")
      .select("term", "bucket").collect()
    assert(st.forall(r => IndexBuilder.bucketOf(r.getString(0), 3) === r.getInt(1)))
  }

  test("multi-term expansion still rides the (linked) termdict") {
    Reshard.reshard(spark, built, s"$tmp/mt", 5, "snap-mt")
    val base = hits(built, PrefixQ("in"))
    assert(base.nonEmpty)
    assert(hits(s"$tmp/mt", PrefixQ("in")) === base)
  }
}
