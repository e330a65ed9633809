package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** A [[FileIndex]] serving only the zonemap-surviving subset of an
  * underlying listing, partition-aware by delegation: `listFiles`
  * forwards partition/data filters to the underlying index (so
  * Catalyst partition pruning — static AND dynamic — keeps composing)
  * and then drops pruned files from each [[PartitionDirectory]],
  * preserving the directory's partition values. This replaces the
  * round-10 `InMemoryFileIndex` rebuild, which could not represent a
  * partitioned listing (leaf files as roots lose partition values).
  *
  * `keep` holds fully-qualified file path strings exactly as the
  * underlying index renders them (`FileStatus.getPath.toString`, the
  * same strings `inputFiles` yields — and the same strings
  * IndexManager's per-file shard hash is keyed by).
  */
final class ZonemapPrunedFileIndex(underlying: FileIndex,
                                   keep: Set[String]) extends FileIndex {

  /** `inputFiles` strings and `listFiles` Path renderings disagree
    * twice over: scheme shape (`file:///x` vs `file:/x`) AND encoding —
    * listing strings are URI-ENCODED (an escaped partition dir
    * `r=o%27brien` prints as `r=o%2527brien`) while FileStatus paths
    * render single-encoded. Comparing `Path(s).toString` against
    * `p.toString` therefore silently drops every file under an escaped
    * partition dir from listFiles (r12 bug: a zonemap-pruned point
    * SELECT into such a partition returned EMPTY). Canonicalize BOTH
    * sides to the decoded on-disk path: FsPaths.fromListing for the
    * listing strings, `toUri.getPath` for the runtime Paths. */
  private val keepNorm: Set[String] =
    keep.map(s => graft.engine.FsPaths.fromListing(s).toUri.getPath)

  private def kept(p: Path): Boolean = keepNorm(p.toUri.getPath)

  override def rootPaths: Seq[Path] = underlying.rootPaths

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    underlying.listFiles(partitionFilters, dataFilters)
      .map(pd => pd.copy(files = pd.files.filter(f => kept(f.getPath))))
      .filter(_.files.nonEmpty)

  override def inputFiles: Array[String] =
    underlying.inputFiles.filter(s =>
      keepNorm(graft.engine.FsPaths.fromListing(s).toUri.getPath))

  override def refresh(): Unit = underlying.refresh()

  /** Kept-files size, so join-strategy stats see the pruned scan (a
    * 1-of-200-files point lookup should broadcast). The underlying
    * index caches its listing, so this is an in-memory sum. */
  override lazy val sizeInBytes: Long =
    underlying.listFiles(Nil, Nil).iterator
      .flatMap(_.files).filter(f => kept(f.getPath))
      .map(_.getLen).sum

  override def partitionSchema: StructType = underlying.partitionSchema

  override def metadataOpsTimeNs: Option[Long] =
    underlying.metadataOpsTimeNs
}
