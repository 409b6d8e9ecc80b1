package graft.fs

import java.net.URI

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}

/** A local filesystem that COUNTS getFileStatus calls against DATA files
  * (`data/bucket=N/...`) — the probe for "table sizing is a manifest
  * aggregate, not a per-file HEAD storm": autoRebucket's sizing path must
  * drive this counter to ZERO (round-11 weak #2). Registered as scheme
  * `countfs` (`fs.countfs.impl`); paths map 1:1 onto the local FS. */
class CountingFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("countfs:///")
  override def getScheme: String = "countfs"

  override def getFileStatus(f: Path): FileStatus = {
    if (f.toString.contains("/data/bucket="))
      CountingFileSystem.dataFileStats.incrementAndGet()
    super.getFileStatus(f)
  }
}

object CountingFileSystem {
  val dataFileStats = new java.util.concurrent.atomic.AtomicLong(0L)
}
