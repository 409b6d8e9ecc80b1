package graft.fs

import java.net.URI

import org.apache.hadoop.fs.{FSDataOutputStream, FileAlreadyExistsException, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** OBJECT-STORE SEMANTICS SHIM — a local filesystem wearing S3's contract,
  * for adversarial validation of the commit protocol
  * (`graft.ops.VersionedTableImpl`). Registered as scheme `objstore`
  * (`fs.objstore.impl`); paths map 1:1 onto the local filesystem.
  *
  * What it deliberately BREAKS (matching the S3A documentation of real
  * object-store behavior):
  *
  *  - **rename is not atomic and not exclusive**: implemented as
  *    object-by-object copy then delete-source, exactly like S3A. A reader
  *    listing the destination mid-rename sees a PARTIAL copy; a rename
  *    onto an existing destination silently merges/overwrites instead of
  *    failing. Any protocol step that leans on atomic rename corrupts
  *    under this FS — which is the point.
  *
  * What it KEEPS (what real stores now provide):
  *
  *  - **single-object PUT is atomic**: each file copy lands whole or not
  *    at all (writes go to a hidden temp name, then a java.io atomic move).
  *  - **create-exclusive is atomic**: `create(path, overwrite = false)`
  *    models a conditional PUT (S3 `If-None-Match`, GCS
  *    `ifGenerationMatch=0`, ABFS `If-None-Match: *`) — serialized under
  *    one lock so exactly one concurrent creator wins. This is the
  *    primitive the conditional-create commit mode builds its commit
  *    point on, and the analogue of the reference's DynamoDB
  *    conditional-write lease (KCLScheduler.java:105).
  */
class ObjectStoreFileSystem extends RawLocalFileSystem {

  override def getUri: URI = URI.create("objstore:///")
  override def getScheme: String = "objstore"

  /** Conditional-PUT exclusivity is CROSS-PROCESS: a real store's
    * `If-None-Match` arbitration lives in the store, not in any client
    * JVM, so the shim's serialization must too. A `java.nio.channels.
    * FileLock` on a per-directory lock file gives exactly that on a local
    * mount (advisory, cross-process); the JVM monitor around it both
    * serializes same-JVM racers (overlapping FileLocks in one JVM throw
    * OverlappingFileLockException instead of blocking) and keeps the old
    * in-JVM semantics. Until round 12 the lock was JVM-only, so the
    * cross-process commit suite could only run on the local FS's real
    * O_EXCL — now it runs against the shim itself. */
  private val putLock = new Object

  private def withStoreLock[T](near: Path)(body: => T): T = putLock.synchronized {
    val lockFile = pathToFile(new Path(near.getParent, ".condput.lock"))
    Option(lockFile.getParentFile).foreach(_.mkdirs())
    val ch = java.nio.channels.FileChannel.open(lockFile.toPath,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    try {
      val l = ch.lock() // blocks on OTHER processes' holders
      try body finally l.release()
    } finally ch.close()
  }

  /** Conditional PUT, atomic WITH CONTENT: a real store's
    * `If-None-Match` PUT uploads the whole body and the object appears
    * complete or not at all — there is no instant where an empty or
    * half-written object is visible under the destination key. Emulated
    * by buffering to a hidden temp and materializing via one
    * java.io ATOMIC_MOVE at close(), with the exclusivity re-checked
    * under the lock at the materialization point (two buffering racers
    * resolve to one winner; the loser's close throws
    * FileAlreadyExistsException — an IOException, the signal every
    * caller already treats as a lost conditional PUT). A plain Hadoop
    * create(overwrite=false) would make an EMPTY file visible before the
    * first write — semantics no object store has, and exactly the torn
    * window the commit protocol must not be validated against. */
  private def conditionalPut(f: Path,
      mk: Path => FSDataOutputStream): FSDataOutputStream = {
    withStoreLock(f) {
      if (exists(f))
        throw new FileAlreadyExistsException(s"$f exists (conditional PUT failed)")
    }
    val tmp = new Path(f.getParent,
      s".condput-${java.util.UUID.randomUUID().toString.replace("-", "")}")
    val inner = mk(tmp)
    val self = this
    new FSDataOutputStream(new java.io.OutputStream {
      override def write(b: Int): Unit = inner.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        inner.write(b, off, len)
      override def flush(): Unit = inner.flush()
      override def close(): Unit = {
        inner.close()
        withStoreLock(f) {
          if (self.exists(f)) {
            self.delete(tmp, false)
            throw new FileAlreadyExistsException(
              s"$f exists (conditional PUT lost at materialization)")
          }
          java.nio.file.Files.move(
            java.nio.file.Paths.get(pathToFile(tmp).getPath),
            java.nio.file.Paths.get(pathToFile(f).getPath),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        }
      }
    }, null)
  }

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    if (overwrite) super.create(f, true, bufferSize, replication, blockSize, progress)
    else conditionalPut(f,
      t => super.create(t, false, bufferSize, replication, blockSize, progress))

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    if (overwrite)
      super.create(f, permission, true, bufferSize, replication, blockSize, progress)
    else conditionalPut(f,
      t => super.create(t, permission, false, bufferSize, replication, blockSize, progress))

  /** S3A-style rename: recursive copy (each object atomic, the whole
    * operation not), then delete the source. Existing destinations are
    * merged into / overwritten, never a failure. */
  override def rename(src: Path, dst: Path): Boolean = {
    if (!exists(src)) return false
    copyInto(src, dst)
    delete(src, true)
    true
  }

  private def copyInto(src: Path, dst: Path): Unit = {
    val st = getFileStatus(src)
    if (st.isDirectory) {
      mkdirs(dst)
      // children land one PUT at a time — the non-atomic window readers
      // of a renamed directory actually face on an object store
      listStatus(src).foreach(c =>
        copyInto(c.getPath, new Path(dst, c.getPath.getName)))
    } else {
      val in = open(src)
      try {
        // atomic single-object PUT: write whole, then one java.io move
        val tmp = new Path(dst.getParent,
          s".put-${java.util.UUID.randomUUID().toString.replace("-", "")}")
        val out = super.create(tmp, true, 65536, 1.toShort,
          getDefaultBlockSize(dst), null)
        try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
        finally out.close()
        java.nio.file.Files.move(
          java.nio.file.Paths.get(pathToFile(tmp).getPath),
          java.nio.file.Paths.get(pathToFile(dst).getPath),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      } finally in.close()
    }
  }
}
