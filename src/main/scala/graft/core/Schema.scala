package graft.core

/** Row types of the engine. The corpus shape is the BASELINE.json
  * input_hint verbatim; derived shapes mirror FIXTURES.md §2 and the
  * reference's per-segment structures (postings / norms / stats,
  * SURVEY.md §1.2).
  */

/** One source-code file — the input table shape (input_hint). */
final case class CodeFile(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String)

/** Doc-side table: deterministic docId + norm byte + content sha256.
  * docId = row_number over orderBy(repo, path, commit) — parallelism
  * independent because BM25 ties break by docID asc
  * (`lucene/core/src/java/org/apache/lucene/search/HitQueue.java:76-81`).
  */
final case class DocMeta(
    docId: Long,
    repo: String,
    path: String,
    commit: String,
    lang: String,
    length: Int,
    normByte: Byte,
    contentSha256: String)

/** Logical posting (pre-segment form): term → (docId, term frequency). */
final case class Posting(term: String, docId: Long, tf: Int)

/** Per-term statistics (the reference's TermStatistics:
  * `lucene/core/src/java/org/apache/lucene/search/TermStatistics.java`).
  */
final case class TermStats(term: String, df: Long, totalTermFreq: Long)

/** Per-field collection statistics (CollectionStatistics analog). */
final case class CollStats(docCount: Long, sumTotalTermFreq: Long) {
  /** avgdl exactly as the reference computes it:
    * `(float)(sumTotalTermFreq / (double) docCount)`
    * (`BM25Similarity.java:89-97`).
    */
  def avgFieldLength: Float =
    if (sumTotalTermFreq <= 0) 1f
    else (sumTotalTermFreq / docCount.toDouble).toFloat
}

/** One encoded posting-list segment row: the Lucene segment analog.
  * `docBlocks` = delta-gap + var-byte docIds and tfs in 128-doc blocks;
  * `skipData` = per-block (lastDocId, maxTf, byteOffset) enabling
  * block-max WAND (skip-list analog,
  * `codecs/lucene50/Lucene50SkipWriter.java:46-68`).
  */
final case class SegmentPosting(
    bucket: Int,
    term: String,
    salt: Int,
    df: Int,
    maxTf: Int,
    docBlocks: Array[Byte],
    skipData: Array[Byte],
    posBlocks: Array[Byte],  // positions sidecar; empty when positions off
    payBlocks: Array[Byte])  // payloads sidecar; empty when payloads off

/** Per-partition lineage row (north rule): replaces `segments_N` +
  * CRC footers (`codecs/CodecUtil.java:367-413`). `inputSha256` is the
  * sha256 over the sorted per-row content sha256s of the partition.
  */
final case class LineageRow(
    snapshotId: String,
    bucket: Int,
    segmentId: String,
    docCount: Long,
    postingCount: Long,
    bytesWritten: Long,
    inputSha256: String)

/** A scored hit. */
final case class Hit(docId: Long, score: Double)

object Sha256 {
  def hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(64)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }
}
