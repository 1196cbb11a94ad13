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
  * Two block formats, self-describing per blob (rank-identical —
  * SURVEY.md §2.3: the compression scheme doesn't affect scores):
  *
  *   FmtVByte (legacy) docBlocks: per block — docCount doc-delta varints,
  *              docCount tf-1 varints, docCount raw norm bytes.
  *   FmtFor docBlocks: per block — a FOR run of doc gaps, a FOR run of
  *              tf-1 values, docCount raw norm bytes. A FOR run =
  *              width byte (0 = all values equal → one varint — the
  *              all-equal fast path of `ForUtil.java:157-164,237-243`)
  *              else the values bit-packed at the block's own width.
  *   skipData:  [varint 0 + format byte, FmtFor only] varint numBlocks,
  *              then per block — varint(lastDocId delta vs prev block's
  *              lastDocId), varint(maxTf), raw minCacheNormByte,
  *              varint(blockByteLen), varint(blockDocCount).
  */
object PostingsCodec {

  val BlockSize = 128

  // ---- codec formats ----
  //
  // FmtVByte: the original delta-gap + var-byte blocks (round 1-4 blobs).
  // FmtFor:   FOR bit-packing (`codecs/lucene50/ForUtil.java:157-164,
  //           237-243`): per block, gaps and tf-1 values are packed at the
  //           block's own bit width (bitsRequired of the max), with the
  //           reference's all-values-equal fast path (width byte 0 + one
  //           varint). Norm bytes stay raw.
  //
  // The format is SELF-DESCRIBING per blob: FmtVByte skipData begins with
  // varint numBlocks (≥ 1 always — encode rejects empty lists), FmtFor
  // begins with varint 0 + a format byte + varint numBlocks, so readers
  // need no external flag and old indexes stay loadable. Writers pick
  // `defaultFormat` (graft.codec.format / SPARK_GRAFT_CODEC_FORMAT =
  // "vbyte" | "for"); merge re-encodes with the same default.
  val FmtVByte = 0
  val FmtFor = 1

  /** Write-side format. Default: FOR — measured vs var-byte on synthetic
    * lists over a 10M-doc space (`Bench codec`, min-of-5 after JIT warm):
    * full-stream decode 1.05-1.5x faster, advance-heavy sweeps 1.1-5x
    * faster, blobs 15-32% smaller (numbers in BENCH/BASELINE.md). The
    * flag was flipped only after those measurements, per round-4 verdict
    * item 2.
    */
  def defaultFormat: Int =
    sys.props.get("graft.codec.format")
      .orElse(sys.env.get("SPARK_GRAFT_CODEC_FORMAT"))
      .map {
        case "vbyte" => FmtVByte
        case "for" => FmtFor
        case other => sys.error(s"unknown codec format: $other")
      }.getOrElse(FmtFor)

  /** Bits needed for `v` (≥ 1 so a packed width is never the 0 marker). */
  private def bitsRequired(v: Long): Int =
    math.max(64 - java.lang.Long.numberOfLeadingZeros(v), 1)

  /** Pack `cnt` `width`-bit values little-endian-first into `buf`. */
  private def packBits(buf: ByteBuf, vals: Array[Long], cnt: Int,
      width: Int): Unit = {
    var acc = 0L
    var nbits = 0
    var i = 0
    if (width <= 56) {
      // nbits ≤ 7 before each value, so value << nbits fits in 63 bits
      while (i < cnt) {
        acc |= vals(i) << nbits
        nbits += width
        while (nbits >= 8) {
          buf.writeByte((acc & 0xff).toByte); acc >>>= 8; nbits -= 8
        }
        i += 1
      }
    } else {
      while (i < cnt) {
        var v = vals(i)
        var rem = width
        while (rem > 0) {
          val take = math.min(rem, 56)
          acc |= (v & ((1L << take) - 1)) << nbits
          nbits += take
          while (nbits >= 8) {
            buf.writeByte((acc & 0xff).toByte); acc >>>= 8; nbits -= 8
          }
          v = if (take == 64) 0L else v >>> take
          rem -= take
        }
        i += 1
      }
    }
    if (nbits > 0) buf.writeByte((acc & 0xff).toByte)
  }

  /** Unpack `cnt` `width`-bit values; returns the next read position. */
  private def unpackBits(arr: Array[Byte], pos0: Int, out: Array[Long],
      cnt: Int, width: Int): Int = {
    var pos = pos0
    var acc = 0L
    var nbits = 0
    var i = 0
    if (width <= 56) {
      // the run's exact byte length is known up front; the refill loop may
      // peek past it (never past the array) — unused bits are discarded
      val byteEnd = pos0 + ((cnt.toLong * width + 7) >> 3).toInt
      val m = (1L << width) - 1
      while (i < cnt) {
        // bulk refill to ≥ 57 bits, then emit every complete value from
        // the accumulator — amortizes the load branching across values
        while (nbits < 57 && pos < arr.length) {
          acc |= (arr(pos) & 0xffL) << nbits; pos += 1; nbits += 8
        }
        var stop = i + math.max(nbits / width, 1)
        if (stop > cnt) stop = cnt
        while (i < stop) {
          out(i) = acc & m
          acc >>>= width
          nbits -= width
          i += 1
        }
      }
      return byteEnd
    } else {
      while (i < cnt) {
        var v = 0L
        var got = 0
        while (got < width) {
          if (nbits == 0) { acc = arr(pos) & 0xffL; pos += 1; nbits = 8 }
          val take = math.min(width - got, nbits)
          v |= (acc & ((1L << take) - 1)) << got
          acc >>>= take
          nbits -= take
          got += take
        }
        out(i) = v
        i += 1
      }
    }
    pos
  }

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

  /** Decoded skip data, indexed by block; `fmt` = the blob's codec. */
  final class Skips(
      val lastDocs: Array[Long],
      val maxTfs: Array[Int],
      val minNorms: Array[Byte],
      val offsets: Array[Int],
      val docCounts: Array[Int],
      val fmt: Int = FmtVByte) {
    def numBlocks: Int = lastDocs.length
    lazy val totalDocs: Int = {
      var s = 0; var i = 0
      while (i < docCounts.length) { s += docCounts(i); i += 1 }
      s
    }
  }

  def readSkips(skipData: Array[Byte]): Skips = {
    val r = new ByteReader(skipData)
    val first = r.readVInt()
    // varint 0 = format marker (a legacy blob's leading numBlocks is ≥ 1)
    val fmt = if (first == 0) r.readByte().toInt else FmtVByte
    val n = if (first == 0) r.readVInt() else first
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
    new Skips(lastDocs, maxTfs, minNorms, offsets, docCounts, fmt)
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

  // ---- payloads sidecar ----

  /** Sentinel for "no payload at this position" — the reference's null
    * payload (`index/PostingsEnum.java getPayload` may return null;
    * PayloadScoreQuery's collector SKIPS such positions). Encoded as the
    * canonical NaN bit pattern; [[hasPayload]] tests it.
    */
  val NoPayload: Float = Float.NaN

  @inline def hasPayload(p: Float): Boolean = !java.lang.Float.isNaN(p)

  /** One doc's per-occurrence payload floats, aligned with its positions
    * (the `..._AND_PAYLOADS` IndexOptions analog,
    * `codecs/lucene50/Lucene50PostingsFormat.java:42-63` — the reference
    * interleaves payload bytes with the position stream; here they ride a
    * third sidecar blob with the SAME block header as positions, so
    * [[concatPositionBlocks]] assembles it from per-doc chunks unchanged
    * and per-block lazy decode mirrors `positions()`). 4-byte
    * little-endian IEEE-754 per position; canonical-NaN bits = absent.
    */
  def encodeDocPayloads(pays: Array[Float]): Array[Byte] = {
    val out = new Array[Byte](pays.length * 4)
    var i = 0
    while (i < pays.length) {
      val bits = java.lang.Float.floatToIntBits(pays(i))
      val o = i * 4
      out(o) = bits.toByte
      out(o + 1) = (bits >>> 8).toByte
      out(o + 2) = (bits >>> 16).toByte
      out(o + 3) = (bits >>> 24).toByte
      i += 1
    }
    out
  }

  private def readPayloadAt(arr: Array[Byte], o: Int): Float =
    java.lang.Float.intBitsToFloat(
      (arr(o) & 0xff) | ((arr(o + 1) & 0xff) << 8) |
        ((arr(o + 2) & 0xff) << 16) | ((arr(o + 3) & 0xff) << 24))

  /** Full payloads decode, aligned with a full `decode` (merge, tests). */
  def decodePayloads(payBlocks: Array[Byte], tfs: Array[Int]): Array[Array[Float]] = {
    val offs = readPosOffsets(payBlocks)
    var pos = offs(0)
    val out = new Array[Array[Float]](tfs.length)
    var i = 0
    while (i < tfs.length) {
      val ps = new Array[Float](tfs(i))
      var j = 0
      while (j < ps.length) { ps(j) = readPayloadAt(payBlocks, pos); pos += 4; j += 1 }
      out(i) = ps
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

  /** Write one array of non-negative values as a FOR-packed run: width
    * byte (0 = all equal → one varint, the reference's 1-byte-ish fast
    * path `ForUtil.java:157-164`), else packed at bitsRequired(max).
    */
  private def writeForRun(body: ByteBuf, vals: Array[Long], cnt: Int): Unit = {
    var allEq = true
    var max = vals(0)
    var i = 1
    while (i < cnt) {
      if (vals(i) != vals(0)) allEq = false
      if (vals(i) > max) max = vals(i)
      i += 1
    }
    if (allEq) { body.writeByte(0); body.writeVLong(vals(0)) }
    else {
      val w = bitsRequired(max)
      body.writeByte(w.toByte)
      packBits(body, vals, cnt, w)
    }
  }

  /** Encode one posting list (docs strictly ascending, tfs ≥ 1, one norm
    * byte per doc) in `fmt` (default: [[defaultFormat]]).
    * @return (docBlocks, skipData)
    */
  def encode(docs: Array[Long], tfs: Array[Int],
      norms: Array[Byte]): (Array[Byte], Array[Byte]) =
    encode(docs, tfs, norms, defaultFormat)

  def encode(docs: Array[Long], tfs: Array[Int], norms: Array[Byte],
      fmt: Int): (Array[Byte], Array[Byte]) = {
    require(docs.length == tfs.length && docs.length == norms.length
      && docs.length > 0, "postings must be non-empty and aligned")
    val nBlocks = (docs.length + BlockSize - 1) / BlockSize
    val body = new ByteBuf(docs.length * 3)
    val skip = new ByteBuf(nBlocks * 8 + 5)
    if (fmt != FmtVByte) {
      skip.writeVInt(0) // format marker: legacy numBlocks is never 0
      skip.writeByte(fmt.toByte)
    }
    skip.writeVInt(nBlocks)
    val gapBuf = new Array[Long](BlockSize)
    val tfBuf = new Array[Long](BlockSize)
    var prevBlockLast = 0L
    var b = 0
    while (b < nBlocks) {
      val start = b * BlockSize
      val end = math.min(start + BlockSize, docs.length)
      val cnt = end - start
      val blockStartLen = body.len
      var prevDoc = prevBlockLast
      var maxTf = 0
      var minNorm = norms(start)
      var i = start
      while (i < end) {
        require(docs(i) > prevDoc || (b == 0 && i == 0 && docs(i) >= 0),
          s"docs not strictly ascending at $i")
        if (fmt == FmtVByte) body.writeVLong(docs(i) - prevDoc)
        else gapBuf(i - start) = docs(i) - prevDoc
        prevDoc = docs(i)
        i += 1
      }
      if (fmt != FmtVByte) writeForRun(body, gapBuf, cnt)
      i = start
      while (i < end) {
        val tf = tfs(i)
        if (tf > maxTf) maxTf = tf
        if (fmt == FmtVByte) body.writeVInt(tf - 1)
        else tfBuf(i - start) = (tf - 1).toLong
        i += 1
      }
      if (fmt != FmtVByte) writeForRun(body, tfBuf, cnt)
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
      skip.writeVInt(cnt)
      prevBlockLast = last
      b += 1
    }
    (body.toArray, skip.toArray)
  }

  /** Decode one FOR run into `out` (docs: raw gaps; caller prefix-sums). */
  private def readForRun(r: ByteReader, out: Array[Long], cnt: Int): Unit = {
    val w = r.readByte() & 0xff
    if (w == 0) {
      val v = r.readVLong()
      var i = 0
      while (i < cnt) { out(i) = v; i += 1 }
    } else r.pos = unpackBits(r.arr, r.pos, out, cnt, w)
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
    val runBuf = new Array[Long](BlockSize)
    var out = 0
    var b = 0
    var prevBlockLast = 0L
    while (b < skips.numBlocks) {
      val cnt = skips.docCounts(b)
      var prev = prevBlockLast
      var i = 0
      if (skips.fmt == FmtVByte) {
        while (i < cnt) {
          prev += r.readVLong()
          docs(out + i) = prev
          i += 1
        }
        i = 0
        while (i < cnt) { tfs(out + i) = r.readVInt() + 1; i += 1 }
      } else {
        readForRun(r, runBuf, cnt)
        while (i < cnt) { prev += runBuf(i); docs(out + i) = prev; i += 1 }
        readForRun(r, runBuf, cnt)
        i = 0
        while (i < cnt) { tfs(out + i) = runBuf(i).toInt + 1; i += 1 }
      }
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
      posBlocks: Array[Byte] = null, payBlocks: Array[Byte] = null) {
    private val r = new ByteReader(docBlocks)
    private var block = -1
    private var inBlock = 0
    private var blockLen = 0
    private var posOffsets: Array[Int] = null
    private var posBlockIdx = -1
    private var blockPositions: Array[Array[Int]] = null
    private var payOffsets: Array[Int] = null
    private var payBlockIdx = -1
    private var blockPayloads: Array[Array[Float]] = null
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

    private val runBuf = new Array[Long](BlockSize)

    private def loadBlock(b: Int): Unit = {
      r.pos = skips.offsets(b)
      val cnt = skips.docCounts(b)
      var prev = if (b == 0) 0L else skips.lastDocs(b - 1)
      var i = 0
      if (skips.fmt == FmtVByte) {
        while (i < cnt) {
          prev += r.readVLong()
          blockDocs(i) = prev
          i += 1
        }
        i = 0
        while (i < cnt) { blockTfs(i) = r.readVInt() + 1; i += 1 }
      } else {
        readForRun(r, runBuf, cnt)
        while (i < cnt) { prev += runBuf(i); blockDocs(i) = prev; i += 1 }
        readForRun(r, runBuf, cnt)
        i = 0
        while (i < cnt) { blockTfs(i) = runBuf(i).toInt + 1; i += 1 }
      }
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

    def hasPayloads: Boolean = payBlocks != null && payBlocks.length > 0

    /** Per-occurrence payloads of the CURRENT doc, aligned with
      * [[positions]] (NaN = no payload at that occurrence). Lazily
      * decodes the current block's payloads and memoizes — same
      * economics as `positions()`.
      */
    def payloads(): Array[Float] = {
      require(hasPayloads, "posting list has no payloads sidecar")
      if (payBlockIdx != block) {
        if (payOffsets == null) payOffsets = readPosOffsets(payBlocks)
        var o = payOffsets(block)
        val bp = new Array[Array[Float]](blockLen)
        var i = 0
        while (i < blockLen) {
          val ps = new Array[Float](blockTfs(i))
          var j = 0
          while (j < ps.length) { ps(j) = readPayloadAt(payBlocks, o); o += 4; j += 1 }
          bp(i) = ps
          i += 1
        }
        blockPayloads = bp
        payBlockIdx = block
      }
      blockPayloads(inBlock - 1)
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
      posBlocks: Array[Byte] = null,
      payBlocks: Array[Byte] = null): PostingsIterator =
    new PostingsIterator(docBlocks, readSkips(skipData), posBlocks, payBlocks)
}
