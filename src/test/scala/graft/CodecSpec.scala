package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.PostingsCodec
import graft.core.Norms

/** Round-trip + iterator properties (seeded randomized trials), mirroring
  * the reference's BasePostingsFormatTestCase family
  * (`lucene/test-framework/.../index/BasePostingsFormatTestCase.java:83`).
  */
class CodecSpec extends AnyFunSuite {

  private def mkList(n: Int, seed: Long): (Array[Long], Array[Int], Array[Byte]) = {
    val rnd = new scala.util.Random(seed)
    val docs = new Array[Long](n)
    var d = rnd.nextInt(100).toLong
    var i = 0
    while (i < n) {
      docs(i) = d
      d += 1 + rnd.nextInt(1000)
      i += 1
    }
    val tfs = Array.fill(n)(1 + rnd.nextInt(50))
    val norms = Array.fill(n)(Norms.normByte(1 + rnd.nextInt(400)))
    (docs, tfs, norms)
  }

  test("round-trip at block boundaries {1,127,128,129,255,256,257,1000}") {
    for (n <- Seq(1, 127, 128, 129, 255, 256, 257, 1000); seed <- 1L to 3L) {
      val (docs, tfs, norms) = mkList(n, seed * 31 + n)
      val (body, skip) = PostingsCodec.encode(docs, tfs, norms)
      val out = PostingsCodec.decode(body, skip)
      assert(out.docs.toSeq === docs.toSeq, s"docs n=$n seed=$seed")
      assert(out.tfs.toSeq === tfs.toSeq, s"tfs n=$n seed=$seed")
      assert(out.norms.toSeq === norms.toSeq, s"norms n=$n seed=$seed")
    }
  }

  test("FOR format: explicit both-format round-trip at 127/128/129 " +
      "boundaries + legacy blobs + all-equal fast path") {
    for (n <- Seq(1, 2, 127, 128, 129, 255, 256, 257, 1000);
         seed <- 1L to 3L) {
      val (docs, tfs, norms) = mkList(n, seed * 57 + n)
      val (bV, sV) = PostingsCodec.encode(docs, tfs, norms,
        PostingsCodec.FmtVByte)
      val (bF, sF) = PostingsCodec.encode(docs, tfs, norms,
        PostingsCodec.FmtFor)
      // both formats decode to the identical list (a legacy vbyte blob
      // stays readable next to FOR blobs — format is self-describing)
      for ((b, s) <- Seq((bV, sV), (bF, sF))) {
        val pl = PostingsCodec.decode(b, s)
        assert(pl.docs.toSeq == docs.toSeq && pl.tfs.toSeq == tfs.toSeq &&
          pl.norms.toSeq == norms.toSeq, s"n=$n seed=$seed")
      }
      // skip metadata identical between formats (offsets differ)
      val (skV, skF) =
        (PostingsCodec.readSkips(sV), PostingsCodec.readSkips(sF))
      assert(skV.fmt == PostingsCodec.FmtVByte &&
        skF.fmt == PostingsCodec.FmtFor)
      assert(skV.lastDocs.toSeq == skF.lastDocs.toSeq &&
        skV.maxTfs.toSeq == skF.maxTfs.toSeq &&
        skV.minNorms.toSeq == skF.minNorms.toSeq &&
        skV.docCounts.toSeq == skF.docCounts.toSeq)
      // iterator parity: nextDoc sweep and advance pattern agree
      val itV = PostingsCodec.iterator(bV, sV)
      val itF = PostingsCodec.iterator(bF, sF)
      while (itV.nextDoc()) {
        assert(itF.nextDoc() && itF.doc == itV.doc && itF.tf == itV.tf &&
          itF.norm == itV.norm)
      }
      assert(!itF.nextDoc())
    }
    // wide-gap values (> 56-bit packing path) round-trip too
    val wideDocs = Array(0L, 1L << 58, (1L << 58) + (1L << 59))
    val (wb, ws) = PostingsCodec.encode(wideDocs, Array(1, 2, 3),
      Array[Byte](1, 2, 3), PostingsCodec.FmtFor)
    val wide = PostingsCodec.decode(wb, ws)
    assert(wide.docs.toSeq == wideDocs.toSeq)
    // all-equal fast path: unit gaps + constant tf compress to width-0
    // runs — far below even 1 byte/posting
    val n = 1000
    val eqDocs = Array.tabulate(n)(i => 5L + i)
    val (eb, es) = PostingsCodec.encode(eqDocs, Array.fill(n)(3),
      Array.fill(n)(7.toByte), PostingsCodec.FmtFor)
    // block 0's gaps are [5,1,1,…] (first gap differs) so it bit-packs at
    // width 3; blocks 1..7 and every tf run hit the width-0 fast path —
    // the whole body is norm bytes + ~80 bytes of runs
    assert(eb.length < n + 96,
      s"all-equal blocks should be ~norm-bytes only: ${eb.length}")
    val epl = PostingsCodec.decode(eb, es)
    assert(epl.docs.toSeq == eqDocs.toSeq && epl.tfs.forall(_ == 3))
  }

  test("round-trip property (random sizes, 50 seeded trials)") {
    val meta = new scala.util.Random(424242L)
    for (_ <- 1 to 50) {
      val n = 1 + meta.nextInt(3000)
      val seed = meta.nextLong()
      val (docs, tfs, norms) = mkList(n, seed)
      val (body, skip) = PostingsCodec.encode(docs, tfs, norms)
      val out = PostingsCodec.decode(body, skip)
      assert(out.docs.toSeq == docs.toSeq && out.tfs.toSeq == tfs.toSeq &&
        out.norms.toSeq == norms.toSeq, s"n=$n seed=$seed")
    }
  }

  test("map-side per-doc pre-encode reassembles the sidecar bit-for-bit") {
    // the build shuffle ships encodeDocPositions(doc) chunks; the reduce
    // side must produce EXACTLY encodePositions' blob (lineage digests and
    // phrase scoring depend on the bytes, not just the decoded values)
    val meta = new scala.util.Random(99L)
    for (trial <- 1 to 30) {
      val nDocs = 1 + meta.nextInt(400) // crosses the 128-doc block bound
      val perDoc = Array.fill(nDocs) {
        val tf = 1 + meta.nextInt(12)
        val ps = new Array[Int](tf)
        var p = meta.nextInt(50)
        var j = 0
        while (j < tf) { ps(j) = p; p += 1 + meta.nextInt(300); j += 1 }
        ps
      }
      val direct = PostingsCodec.encodePositions(perDoc)
      val chunks = perDoc.map(PostingsCodec.encodeDocPositions)
      val reassembled = PostingsCodec.concatPositionBlocks(chunks)
      assert(java.util.Arrays.equals(direct, reassembled), s"trial=$trial nDocs=$nDocs")
      chunks.zip(perDoc).foreach { case (c, ps) =>
        assert(PostingsCodec.countVarints(c) == ps.length)
      }
    }
  }

  test("skip metadata: per-block maxTf and min-cache norm are correct") {
    val (docs, tfs, norms) = mkList(1000, 7L)
    val (body, skip) = PostingsCodec.encode(docs, tfs, norms)
    val skips = PostingsCodec.readSkips(skip)
    assert(skips.numBlocks === 8) // ceil(1000/128)
    var b = 0
    while (b < skips.numBlocks) {
      val start = b * PostingsCodec.BlockSize
      val end = math.min(start + PostingsCodec.BlockSize, 1000)
      assert(skips.lastDocs(b) === docs(end - 1))
      assert(skips.maxTfs(b) === tfs.slice(start, end).max)
      assert(skips.docCounts(b) === end - start)
      val minTable = norms.slice(start, end).map(n => Norms.NORM_TABLE(n & 0xff)).min
      assert(Norms.NORM_TABLE(skips.minNorms(b) & 0xff) === minTable)
      b += 1
    }
  }

  test("iterator nextDoc streams the full list") {
    val (docs, tfs, norms) = mkList(500, 11L)
    val (body, skip) = PostingsCodec.encode(docs, tfs, norms)
    val it = PostingsCodec.iterator(body, skip)
    var i = 0
    while (it.nextDoc()) {
      assert(it.doc === docs(i) && it.tf === tfs(i) && it.norm === norms(i))
      i += 1
    }
    assert(i === 500)
    assert(it.doc === Long.MaxValue)
  }

  test("iterator advance matches a linear scan (30 seeded trials)") {
    val meta = new scala.util.Random(777L)
    for (_ <- 1 to 30) {
      val n = 1 + meta.nextInt(2000)
      val seed = meta.nextLong()
      val (docs, tfs, _) = mkList(n, seed)
      val norms = Array.fill(n)(Norms.normByte(10))
      val (body, skip) = PostingsCodec.encode(docs, tfs, norms)
      val it = PostingsCodec.iterator(body, skip)
      val rnd = new scala.util.Random(seed)
      var target = 0L
      var ok = true
      while (ok && target <= docs.last) {
        val expected = docs.find(_ >= target)
        val got = it.advance(target)
        expected match {
          case Some(d) =>
            assert(got && it.doc === d, s"advance($target)")
            assert(it.tf === tfs(docs.indexOf(d)))
            // next target strictly beyond current doc (iterator is forward-only)
            target = it.doc + 1 + rnd.nextInt(500)
          case None =>
            assert(!got && it.doc === Long.MaxValue)
            ok = false
        }
      }
    }
  }

  test("advance then nextDoc interleave correctly") {
    val docs = Array(1L, 5L, 9L, 130L, 260L, 300L, 1000L)
    val tfs = Array(1, 2, 3, 4, 5, 6, 7)
    val norms = Array.fill(7)(Norms.normByte(5))
    val (body, skip) = PostingsCodec.encode(docs, tfs, norms)
    val it = PostingsCodec.iterator(body, skip)
    assert(it.advance(6) && it.doc === 9L && it.tf === 3)
    assert(it.nextDoc() && it.doc === 130L)
    assert(it.advance(261) && it.doc === 300L)
    assert(it.nextDoc() && it.doc === 1000L)
    assert(!it.nextDoc())
  }

  test("singleton list (Lucene singleton-doc optimization case)") {
    val (body, skip) = PostingsCodec.encode(Array(42L), Array(3),
      Array(Norms.normByte(7)))
    val out = PostingsCodec.decode(body, skip)
    assert(out.docs.toSeq === Seq(42L) && out.tfs.toSeq === Seq(3))
    val it = PostingsCodec.iterator(body, skip)
    assert(it.advance(42) && it.doc === 42L)
    assert(!it.nextDoc())
  }

  test("docId 0 is encodable (first doc of the corpus)") {
    val (body, skip) = PostingsCodec.encode(Array(0L, 1L), Array(1, 1),
      Array(Norms.normByte(3), Norms.normByte(4)))
    assert(PostingsCodec.decode(body, skip).docs.toSeq === Seq(0L, 1L))
  }
}
