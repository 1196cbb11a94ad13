package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.{BloomCodec, IndexBuilder, Merge}
import graft.index.IndexBuilder.BuildConfig
import graft.search._

/** BloomFilteringPostingsFormat laws (`lucene/codecs/.../bloom/
  * FuzzySet.java:40-306`, `MurmurHash2.java:44-99`,
  * `DefaultBloomFilterFactory.java:33-52`): hash transcription against
  * an independently-derived little-endian implementation, the all-ones
  * size ladder, never-false-negative membership, AND-projection
  * downsizing, and end-to-end invisibility (identical hits with the
  * sidecar on or off) with observable fail-fast skips.
  */
class BloomSpec extends AnyFunSuite {

  test("murmur2 matches an independent little-endian derivation") {
    // independent recompute: ByteBuffer little-endian word reads instead
    // of the reference's manual byte shifts
    def alt(data: Array[Byte]): Int = {
      val m = 0x5bd1e995; val r = 24
      var h = 0x9747b28c ^ data.length
      val bb = java.nio.ByteBuffer.wrap(data)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      while (bb.remaining() >= 4) {
        var k = bb.getInt()
        // the reference sign-extends the TOP byte (no & 0xff on byte 3)
        k *= m; k ^= k >>> r; k *= m
        h *= m; h ^= k
      }
      val left = bb.remaining()
      if (left > 0) {
        if (left >= 3) h ^= data(data.length - 3).toInt << 16
        if (left >= 2) h ^= data(data.length - 2).toInt << 8
        h ^= data(data.length - 1).toInt
        h *= m
      }
      h ^= h >>> 13; h *= m; h ^= h >>> 15
      h
    }
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 2000) {
      val len = rnd.nextInt(24)
      val bytes = new Array[Byte](len)
      rnd.nextBytes(bytes)
      assert(BloomCodec.murmur2(bytes) == alt(bytes),
        s"bytes ${bytes.mkString(",")}")
    }
  }

  test("usable sizes are the all-ones ladder") {
    assert(BloomCodec.usableSizes.head == 3)
    BloomCodec.usableSizes.foreach(sz =>
      assert(((sz + 1) & sz) == 0, s"$sz not 2^k-1"))
    assert(BloomCodec.usableSizes.sliding(2).forall(p => p(0) < p(1)))
  }

  test("never a false negative; downsize preserves membership") {
    val rnd = new scala.util.Random(11)
    val values = (0 until 5000).map(_ => rnd.alphanumeric.take(8).mkString)
    val set = BloomCodec.FuzzySet.forDocCount(values.size.toLong)
    values.foreach(set.add)
    values.foreach(v => assert(set.mightContain(v)))
    val down = set.downsize(0.1f)
    assert(down.bloomSize <= set.bloomSize)
    assert(down.saturation <= 0.1f || (down.bloomSize == set.bloomSize))
    values.foreach(v => assert(down.mightContain(v), v))
  }

  test("end-to-end: sidecar invisible, absent lookups fail fast, merge keeps it") {
    val spark = TestSpark.spark
    import spark.implicits._
    def build(docs: org.apache.spark.sql.DataFrame, bloom: Boolean): String = {
      val ix = IndexBuilder.buildLogical(docs, "text", Some("doc_id"), Nil,
        BuildConfig(numBuckets = 4, bloom = bloom))
      val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
      IndexBuilder.writeIndex(ix, dir, "snap", 1)
      ix.unpersistCached(); ix.postings.unpersist()
      dir
    }
    val docsA = Seq((1L, "spark fast merge"), (2L, "key value store"))
      .toDF("doc_id", "text")
    val docsB = Seq((3L, "sort merge join"), (4L, "window batch scan"))
      .toDF("doc_id", "text")
    val dirOn = build(docsA, bloom = true)
    val dirOff = build(docsA, bloom = false)
    val on = new Searcher(spark, SegmentSearcher.load(dirOn))
    val off = new Searcher(spark, SegmentSearcher.load(dirOff))
    val q = BoolQ(should = Seq(TermQ("merge"), TermQ("zzz_nope")))
    assert(on.search(q, 10).toSeq == off.search(q, 10).toSeq)
    // 50 random absent probes: all-false-positive odds ~1e-50 at 10%
    // saturation — the skip counter must move
    val rnd = new scala.util.Random(3)
    val absents = (0 until 50)
      .map(_ => "zz" + rnd.alphanumeric.take(10).mkString.toLowerCase).toSet
    val got = on.stats(absents)
    assert(got.isEmpty)
    assert(on.bloomSkipped >= 40, s"skipped only ${on.bloomSkipped}")
    assert(off.bloomSkipped == 0L)
    // merge: the sidecar survives compaction (rebuilt over merged vocab)
    val dirB = build(docsB, bloom = true)
    val mergedDir =
      java.nio.file.Files.createTempDirectory("graft-bloom-m").toString
    Merge.mergeIndexes(spark, Seq(dirOn, dirB), mergedDir, "msnap")
    val ms = SegmentSearcher.load(mergedDir)
    assert(ms.manifest.bloom)
    val mOn = new Searcher(spark, ms)
    assert(mOn.search(TermQ("merge"), 10).map(_.docId).toSet == Set(1L, 3L))
    mOn.stats(absents)
    assert(mOn.bloomSkipped >= 40)
  }
}
