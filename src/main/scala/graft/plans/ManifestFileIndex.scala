package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** A [[FileIndex]] serving exactly one commit-log manifest's file set
  * (table-RELATIVE paths, the manifest's own representation): the
  * underlying listing may contain retired files a copy-on-write commit
  * left in place, or fresh files from a commit newer than the resolved
  * manifest — both are invisible through this index, which is what
  * gives a statement snapshot isolation against writers in OTHER
  * processes. Same delegation discipline as [[ZonemapPrunedFileIndex]]
  * (partition pruning — static and dynamic — composes through
  * listFiles), matching in decoded-URI-path space on the TABLE-relative
  * suffix so partition-dir escaping cannot desync the comparison. */
final class ManifestFileIndex(underlying: FileIndex, tableLocation: Path,
                              keepRels: Set[String]) extends FileIndex {

  private val basePath = tableLocation.toUri.getPath.stripSuffix("/")

  private def kept(p: Path): Boolean = {
    val s = p.toUri.getPath
    s.startsWith(basePath + "/") && keepRels(s.substring(basePath.length + 1))
  }

  override def rootPaths: Seq[Path] = underlying.rootPaths

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    underlying.listFiles(partitionFilters, dataFilters)
      .map(pd => pd.copy(files = pd.files.filter(f => kept(f.getPath))))
      .filter(_.files.nonEmpty)

  override def inputFiles: Array[String] =
    underlying.inputFiles.filter(s =>
      kept(graft.engine.FsPaths.fromListing(s)))

  override def refresh(): Unit = underlying.refresh()

  override lazy val sizeInBytes: Long =
    underlying.listFiles(Nil, Nil).iterator
      .flatMap(_.files).filter(f => kept(f.getPath))
      .map(_.getLen).sum

  override def partitionSchema: StructType = underlying.partitionSchema

  override def metadataOpsTimeNs: Option[Long] =
    underlying.metadataOpsTimeNs
}
