package graft.index

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Index replication — the reference replicator module's law
  * (`lucene/replicator/src/java/org/apache/lucene/replicator/
  * ReplicationClient.java:66`, `IndexReplicationHandler.java:43`):
  * a replica pulls only the files it lacks from the publisher's current
  * revision, and the COMMIT file is moved into place LAST, so a torn or
  * interrupted sync never exposes a half-revision — readers on the
  * replica see the complete old revision until the new one is whole.
  *
  * This engine's revisions are write-once by construction: every
  * writeIndex / merge / streaming batch emits parquet parts with fresh
  * unique names, and `manifest.json` is the commit point (the same
  * two-phase convention the builder itself uses). So the reference's
  * name-based delta is sound here too: copy data files absent from the
  * replica (or size-mismatched — a torn previous pull), then the
  * manifests, then delete replica-only files from revisions the
  * publisher dropped (`IndexReplicationHandler.cleanupOldIndexFiles`).
  *
  * Works on a single snapshot dir or a whole streaming index dir
  * (`snap=N` sub-snapshots): a new batch replicates as exactly its own
  * files — delta-sized, not index-sized, which is the point at 10¹²
  * files. Driver-side file walking is metadata-only (no content passes
  * through the driver beyond the copy streams; in a cluster deployment
  * the copies are object-store server-side copies).
  */
object Replicator {

  final case class SyncReport(copied: Seq[String], deleted: Seq[String],
      bytesCopied: Long)

  def sync(srcDir: String, dstDir: String): SyncReport = {
    val src = Paths.get(srcDir)
    val dst = Paths.get(dstDir)
    require(Files.isDirectory(src), s"no such index dir: $srcDir")
    Files.createDirectories(dst)

    def walk(root: Path): Map[String, Path] =
      Files.walk(root).iterator().asScala
        .filter(p => Files.isRegularFile(p))
        .map(p => root.relativize(p).toString -> p)
        .toMap

    val srcFiles = walk(src)
    val dstFiles = walk(dst)

    def isCommitFile(rel: String): Boolean =
      rel == "manifest.json" || rel.endsWith("/manifest.json")

    val stale = srcFiles.collect {
      case (rel, p) if dstFiles.get(rel)
        .exists(q => Files.size(q) != Files.size(p)) => rel
    }.toSet
    val missing = (srcFiles.keySet -- dstFiles.keySet) ++ stale
    // data first, commit files last — the replication law; both halves
    // sorted for a deterministic, spec-assertable order
    val ordered = missing.toSeq.sortBy(r => (isCommitFile(r), r))

    var bytes = 0L
    ordered.foreach { rel =>
      val from = srcFiles(rel)
      val to = dst.resolve(rel)
      Files.createDirectories(to.getParent)
      Files.copy(from, to, StandardCopyOption.REPLACE_EXISTING)
      bytes += Files.size(from)
    }

    // drop replica-only files AFTER the new revision is whole
    val gone = (dstFiles.keySet -- srcFiles.keySet).toSeq.sorted
    gone.foreach { rel =>
      Files.deleteIfExists(dst.resolve(rel))
      // prune now-empty snapshot dirs so dropped revisions disappear
      var parent = dst.resolve(rel).getParent
      while (parent != null && parent != dst &&
        Files.isDirectory(parent) && !Files.list(parent).iterator().hasNext) {
        Files.delete(parent)
        parent = parent.getParent
      }
    }
    SyncReport(ordered, gone, bytes)
  }
}
