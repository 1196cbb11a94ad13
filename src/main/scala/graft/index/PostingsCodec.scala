package graft.index

/** Posting-list blob codec: delta-gap docIDs + var-byte, in 128-doc blocks,
  * with inlined norm bytes and per-block skip entries carrying
  * (lastDocId, maxTf, minCacheNormByte, byteLen, docCount).
  *
  * Mirrors the reference's format semantics without its machinery:
  * - 128-doc blocks: `codecs/lucene50/Lucene50PostingsFormat.java:397`
  *   (BLOCK_SIZE), format doc `:42-63`.
  * - delta-gap doc encoding + vInt: `Lucene50PostingsWriter.java:214-247`,
  *   `store/DataOutput.java:186-192` (7-bit little-endian continuation).
  * - skip entry per block with last docID + offsets:
  *   `Lucene50SkipWriter.java:46,67-68`.
  * - Norm bytes (`index/NormValuesWriter.java` analog) are INLINED per
  *   posting rather than kept as a separate doc-major table: at 10^12 docs
  *   a norms join/broadcast at query time is impossible, so each posting
  *   carries its 1-byte quantized field length. Same bytes, same scores.
  * - per-block (maxTf, minCacheNormByte) gives a per-block BM25 upper
  *   bound — the block-max WAND refinement (Ding & Suel 2011) of the
  *   reference's heap-threshold pruning
  *   (`search/TopScoreDocCollector.java:71-75`).
  *
  * Var-byte rather than FOR bit-packing is deliberate — SURVEY.md §2.3:
  * the compression scheme doesn't affect rank identity.
  *
  * Layout:
  *   docBlocks: per block — docCount doc-delta varints, docCount tf-1
  *              varints, docCount raw norm bytes.
  *   skipData:  varint numBlocks, then per block —
  *              varint(lastDocId delta vs prev block's lastDocId),
  *              varint(maxTf), raw minCacheNormByte,
  *              varint(blockByteLen), varint(blockDocCount).
  */
object PostingsCodec {

  val BlockSize = 128

  // ---- var-byte primitives (7-bit, little-endian continuation) ----

  final class ByteBuf(initial: Int = 64) {
    var arr: Array[Byte] = new Array[Byte](initial)
    var len: Int = 0
    private def ensure(n: Int): Unit = {
      if (len + n > arr.length) {
        var cap = arr.length * 2
        while (cap < len + n) cap *= 2
        arr = java.util.Arrays.copyOf(arr, cap)
      }
    }
    def writeVLong(v0: Long): Unit = {
      ensure(10)
      var v = v0
      while ((v & ~0x7fL) != 0L) {
        arr(len) = ((v & 0x7f) | 0x80).toByte; len += 1
        v >>>= 7
      }
      arr(len) = v.toByte; len += 1
    }
    def writeVInt(v: Int): Unit = writeVLong(v.toLong & 0xffffffffL)
    def writeByte(b: Byte): Unit = { ensure(1); arr(len) = b; len += 1 }
    def toArray: Array[Byte] = java.util.Arrays.copyOf(arr, len)
  }

  final class ByteReader(val arr: Array[Byte], var pos: Int = 0) {
    def readVLong(): Long = {
      var b = arr(pos); pos += 1
      var v = (b & 0x7fL)
      var shift = 7
      while ((b & 0x80) != 0) {
        b = arr(pos); pos += 1
        v |= (b & 0x7fL) << shift
        shift += 7
      }
      v
    }
    def readVInt(): Int = readVLong().toInt
    def readByte(): Byte = { val b = arr(pos); pos += 1; b }
  }

  /** Unsigned-byte whose NORM_TABLE entry (≈ field length) is smallest,
    * i.e. the shortest doc in a block — gives the block's best-case
    * (smallest) BM25 denominator.
    */
  private def minCacheByte(a: Byte, b: Byte): Byte = {
    val ta = graft.core.Norms.NORM_TABLE(a & 0xff)
    val tb = graft.core.Norms.NORM_TABLE(b & 0xff)
    if (ta <= tb) a else b
  }

  // ---- skip structure ----

  /** Decoded skip data, indexed by block. */
  final class Skips(
      val lastDocs: Array[Long],
      val maxTfs: Array[Int],
      val minNorms: Array[Byte],
      val offsets: Array[Int],
      val docCounts: Array[Int]) {
    def numBlocks: Int = lastDocs.length
    lazy val totalDocs: Int = {
      var s = 0; var i = 0
      while (i < docCounts.length) { s += docCounts(i); i += 1 }
      s
    }
  }

  def readSkips(skipData: Array[Byte]): Skips = {
    val r = new ByteReader(skipData)
    val n = r.readVInt()
    val lastDocs = new Array[Long](n)
    val maxTfs = new Array[Int](n)
    val minNorms = new Array[Byte](n)
    val offsets = new Array[Int](n)
    val docCounts = new Array[Int](n)
    var prevLast = 0L
    var off = 0
    var i = 0
    while (i < n) {
      prevLast += r.readVLong()
      lastDocs(i) = prevLast
      maxTfs(i) = r.readVInt()
      minNorms(i) = r.readByte()
      offsets(i) = off
      off += r.readVInt()
      docCounts(i) = r.readVInt()
      i += 1
    }
    new Skips(lastDocs, maxTfs, minNorms, offsets, docCounts)
  }

  // ---- positions sidecar ----

  /** Encode per-doc position lists into the positions sidecar blob —
    * the IndexOptions.DOCS_AND_FREQS_AND_POSITIONS analog
    * (`Lucene50PostingsFormat.java:42-63`; positions written at
    * `Lucene50PostingsWriter.java:214-247`). Layout:
    *   varint numBlocks, numBlocks varints of per-block payload byteLen,
    *   then the payloads. Per-block payload: for each doc in the block,
    *   tf(doc) position varints — first absolute, then gaps (strictly
    *   ascending within a doc). Per-doc counts come from the tf stream of
    *   the doc blob, so none are repeated here.
    * Blocking mirrors the doc blob (128 docs), so a block of positions is
    * decodable on demand without touching the rest — phrase queries pay
    * for position decode only on conjunction-aligned blocks.
    */
  def encodePositions(positions: Array[Array[Int]]): Array[Byte] = {
    val nBlocks = (positions.length + BlockSize - 1) / BlockSize
    val payload = new ByteBuf(positions.length * 2)
    val lens = new Array[Int](nBlocks)
    var b = 0
    while (b < nBlocks) {
      val start = b * BlockSize
      val end = math.min(start + BlockSize, positions.length)
      val at = payload.len
      var i = start
      while (i < end) {
        val ps = positions(i)
        var prev = 0
        var j = 0
        while (j < ps.length) {
          payload.writeVInt(ps(j) - prev)
          prev = ps(j)
          j += 1
        }
        i += 1
      }
      lens(b) = payload.len - at
      b += 1
    }
    val out = new ByteBuf(payload.len + nBlocks * 4 + 5)
    out.writeVInt(nBlocks)
    lens.foreach(out.writeVInt)
    val head = out.len
    val arr = new Array[Byte](head + payload.len)
    System.arraycopy(out.arr, 0, arr, 0, head)
    System.arraycopy(payload.arr, 0, arr, head, payload.len)
    arr
  }

  /** One doc's positions payload: first position absolute, then gaps —
    * exactly the bytes [[encodePositions]] writes for that doc. Encoding
    * per doc on the MAP side of the build shuffle lets the shuffle carry
    * ~1 byte per position instead of a 4-byte int plus array padding,
    * and the reduce side reassembles the sidecar blob bit-for-bit with
    * [[concatPositionBlocks]] (byte-equality asserted in CodecSpec).
    */
  def encodeDocPositions(ps: Array[Int]): Array[Byte] = {
    val b = new ByteBuf(ps.length + 4)
    var prev = 0
    var j = 0
    while (j < ps.length) { b.writeVInt(ps(j) - prev); prev = ps(j); j += 1 }
    b.toArray
  }

  /** Number of varints in a per-doc payload = the doc's tf (a varint ends
    * at each byte whose continuation bit is clear) — so the shuffle row
    * doesn't need to carry tf separately.
    */
  def countVarints(chunk: Array[Byte]): Int = {
    var n = 0
    var i = 0
    while (i < chunk.length) {
      if ((chunk(i) & 0x80) == 0) n += 1
      i += 1
    }
    n
  }

  /** Assemble the positions sidecar from per-doc pre-encoded payloads;
    * byte-identical to [[encodePositions]] over the decoded arrays.
    */
  def concatPositionBlocks(chunks: Array[Array[Byte]]): Array[Byte] = {
    val nBlocks = (chunks.length + BlockSize - 1) / BlockSize
    val lens = new Array[Int](nBlocks)
    var payloadLen = 0
    var b = 0
    while (b < nBlocks) {
      val end = math.min(b * BlockSize + BlockSize, chunks.length)
      var l = 0
      var i = b * BlockSize
      while (i < end) { l += chunks(i).length; i += 1 }
      lens(b) = l
      payloadLen += l
      b += 1
    }
    val head = new ByteBuf(nBlocks * 4 + 5)
    head.writeVInt(nBlocks)
    lens.foreach(head.writeVInt)
    val out = new Array[Byte](head.len + payloadLen)
    System.arraycopy(head.arr, 0, out, 0, head.len)
    var off = head.len
    var i = 0
    while (i < chunks.length) {
      System.arraycopy(chunks(i), 0, out, off, chunks(i).length)
      off += chunks(i).length
      i += 1
    }
    out
  }

  /** Byte offsets of each block's positions payload within posBlocks. */
  def readPosOffsets(posBlocks: Array[Byte]): Array[Int] = {
    val r = new ByteReader(posBlocks)
    val n = r.readVInt()
    val offs = new Array[Int](n + 1)
    var i = 0
    var acc = 0
    val lens = new Array[Int](n)
    while (i < n) { lens(i) = r.readVInt(); i += 1 }
    offs(0) = r.pos
    i = 0
    while (i < n) { acc = offs(i) + lens(i); offs(i + 1) = acc; i += 1 }
    offs
  }

  // ---- encode ----

  /** Encode one posting list (docs strictly ascending, tfs ≥ 1, one norm
    * byte per doc). @return (docBlocks, skipData)
    */
  def encode(docs: Array[Long], tfs: Array[Int],
      norms: Array[Byte]): (Array[Byte], Array[Byte]) = {
    require(docs.length == tfs.length && docs.length == norms.length
      && docs.length > 0, "postings must be non-empty and aligned")
    val nBlocks = (docs.length + BlockSize - 1) / BlockSize
    val body = new ByteBuf(docs.length * 3)
    val skip = new ByteBuf(nBlocks * 8 + 5)
    skip.writeVInt(nBlocks)
    var prevBlockLast = 0L
    var b = 0
    while (b < nBlocks) {
      val start = b * BlockSize
      val end = math.min(start + BlockSize, docs.length)
      val blockStartLen = body.len
      var prevDoc = prevBlockLast
      var maxTf = 0
      var minNorm = norms(start)
      var i = start
      while (i < end) {
        require(docs(i) > prevDoc || (b == 0 && i == 0 && docs(i) >= 0),
          s"docs not strictly ascending at $i")
        body.writeVLong(docs(i) - prevDoc)
        prevDoc = docs(i)
        i += 1
      }
      i = start
      while (i < end) {
        val tf = tfs(i)
        if (tf > maxTf) maxTf = tf
        body.writeVInt(tf - 1)
        i += 1
      }
      i = start
      while (i < end) {
        body.writeByte(norms(i))
        minNorm = minCacheByte(minNorm, norms(i))
        i += 1
      }
      val last = docs(end - 1)
      skip.writeVLong(last - prevBlockLast)
      skip.writeVInt(maxTf)
      skip.writeByte(minNorm)
      skip.writeVInt(body.len - blockStartLen)
      skip.writeVInt(end - start)
      prevBlockLast = last
      b += 1
    }
    (body.toArray, skip.toArray)
  }

  // ---- decode ----

  final case class PostingList(docs: Array[Long], tfs: Array[Int],
      norms: Array[Byte], positions: Array[Array[Int]] = null)

  /** Full positions decode, aligned with a full `decode` (merge, tests). */
  def decodePositions(posBlocks: Array[Byte], tfs: Array[Int]): Array[Array[Int]] = {
    val offs = readPosOffsets(posBlocks)
    val r = new ByteReader(posBlocks, offs(0))
    val out = new Array[Array[Int]](tfs.length)
    var i = 0
    while (i < tfs.length) {
      val ps = new Array[Int](tfs(i))
      var prev = 0
      var j = 0
      while (j < ps.length) { prev += r.readVInt(); ps(j) = prev; j += 1 }
      out(i) = ps
      i += 1
    }
    out
  }

  /** Full decode (merge, tests, non-WAND paths). */
  def decode(docBlocks: Array[Byte], skipData: Array[Byte]): PostingList = {
    val skips = readSkips(skipData)
    val total = skips.totalDocs
    val docs = new Array[Long](total)
    val tfs = new Array[Int](total)
    val norms = new Array[Byte](total)
    val r = new ByteReader(docBlocks)
    var out = 0
    var b = 0
    var prevBlockLast = 0L
    while (b < skips.numBlocks) {
      val cnt = skips.docCounts(b)
      var prev = prevBlockLast
      var i = 0
      while (i < cnt) {
        prev += r.readVLong()
        docs(out + i) = prev
        i += 1
      }
      i = 0
      while (i < cnt) { tfs(out + i) = r.readVInt() + 1; i += 1 }
      i = 0
      while (i < cnt) { norms(out + i) = r.readByte(); i += 1 }
      out += cnt
      prevBlockLast = skips.lastDocs(b)
      b += 1
    }
    PostingList(docs, tfs, norms)
  }

  /** Streaming iterator with skip-aware `advance` — the DocIdSetIterator
    * analog (`search/DocIdSetIterator.java`) plus block-max metadata.
    */
  final class PostingsIterator(docBlocks: Array[Byte], val skips: Skips,
      posBlocks: Array[Byte] = null) {
    private val r = new ByteReader(docBlocks)
    private var block = -1
    private var inBlock = 0
    private var blockLen = 0
    private var posOffsets: Array[Int] = null
    private var posBlockIdx = -1
    private var blockPositions: Array[Array[Int]] = null
    private val blockDocs = new Array[Long](BlockSize)
    private val blockTfs = new Array[Int](BlockSize)
    private val blockNorms = new Array[Byte](BlockSize)
    var doc: Long = -1L
    var tf: Int = 0
    var norm: Byte = 0

    def cost: Long = skips.totalDocs.toLong

    /** Index of the block the CURRENT doc belongs to (-1 before start). */
    def currentBlock: Int = block

    /** Last doc of block b (for shallow block-boundary reasoning in BMW). */
    def blockLastDoc(b: Int): Long =
      if (b < skips.numBlocks) skips.lastDocs(b) else Long.MaxValue

    def blockMaxTf(b: Int): Int = skips.maxTfs(b)
    def blockMinNorm(b: Int): Byte = skips.minNorms(b)
    def numBlocks: Int = skips.numBlocks

    /** First block whose lastDoc ≥ target (numBlocks if none). */
    def blockFor(target: Long): Int = {
      var lo = math.max(block, 0)
      var hi = skips.numBlocks - 1
      if (skips.lastDocs(hi) < target) return skips.numBlocks
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (skips.lastDocs(mid) < target) lo = mid + 1 else hi = mid
      }
      lo
    }

    private def loadBlock(b: Int): Unit = {
      r.pos = skips.offsets(b)
      val cnt = skips.docCounts(b)
      var prev = if (b == 0) 0L else skips.lastDocs(b - 1)
      var i = 0
      while (i < cnt) {
        prev += r.readVLong()
        blockDocs(i) = prev
        i += 1
      }
      i = 0
      while (i < cnt) { blockTfs(i) = r.readVInt() + 1; i += 1 }
      i = 0
      while (i < cnt) { blockNorms(i) = r.readByte(); i += 1 }
      block = b
      blockLen = cnt
      inBlock = 0
    }

    private def setCurrent(): Unit = {
      doc = blockDocs(inBlock); tf = blockTfs(inBlock)
      norm = blockNorms(inBlock); inBlock += 1
    }

    def hasPositions: Boolean = posBlocks != null && posBlocks.length > 0

    /** Positions of the CURRENT doc. Decodes the current block's positions
      * lazily and memoizes them (a phrase query pays position decode only
      * on conjunction-aligned blocks — the two-phase-iterator economics of
      * `search/ExactPhraseScorer.java:27`).
      */
    def positions(): Array[Int] = {
      require(hasPositions, "posting list has no positions sidecar")
      if (posBlockIdx != block) {
        if (posOffsets == null) posOffsets = readPosOffsets(posBlocks)
        val pr = new ByteReader(posBlocks, posOffsets(block))
        val bp = new Array[Array[Int]](blockLen)
        var i = 0
        while (i < blockLen) {
          val ps = new Array[Int](blockTfs(i))
          var prev = 0
          var j = 0
          while (j < ps.length) { prev += pr.readVInt(); ps(j) = prev; j += 1 }
          bp(i) = ps
          i += 1
        }
        blockPositions = bp
        posBlockIdx = block
      }
      blockPositions(inBlock - 1)
    }

    /** Advance to next doc; false at exhaustion (doc = Long.MaxValue). */
    def nextDoc(): Boolean = {
      if (block >= 0 && inBlock < blockLen) { setCurrent(); true }
      else if (block + 1 < skips.numBlocks) {
        loadBlock(block + 1); setCurrent(); true
      } else {
        doc = Long.MaxValue; tf = 0; norm = 0
        false
      }
    }

    /** Advance to the first doc ≥ target (skip-list jump over blocks). */
    def advance(target: Long): Boolean = {
      if (doc >= target) return doc != Long.MaxValue
      val b = blockFor(target)
      if (b == skips.numBlocks) {
        doc = Long.MaxValue; tf = 0; norm = 0; block = skips.numBlocks
        return false
      }
      if (b != block) loadBlock(b)
      while (blockDocs(inBlock) < target) inBlock += 1
      setCurrent()
      true
    }
  }

  def iterator(docBlocks: Array[Byte], skipData: Array[Byte],
      posBlocks: Array[Byte] = null): PostingsIterator =
    new PostingsIterator(docBlocks, readSkips(skipData), posBlocks)
}
