package graft.fs

import java.io.IOException
import java.net.URI
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** SCRIPTED fault injection (round-15 "Next round" #2's targeted half):
  * where [[FlakyFileSystem]] rolls probabilistic faults to find the crash
  * points nobody chose, this shim fires EXACT faults at EXACT paths so a
  * single adversarial schedule — "the pointer PUT's response is lost AND
  * the next N read-backs fail" — can be pinned as a deterministic
  * red-green test. Same [[ObjectStoreFileSystem]] semantics underneath.
  *
  * Scripting is by path SUBSTRING with a remaining-count per rule:
  *  - [[ScriptedFaultFileSystem.failOpens]] — `open` throws a plain
  *    IOException (a degraded read path: 5xx/timeout — presence UNKNOWN);
  *  - [[ScriptedFaultFileSystem.failOpensFnf]] — `open` throws
  *    FileNotFoundException (the store answered: positively absent —
  *    models an eventually-consistent or lying listing);
  *  - [[ScriptedFaultFileSystem.loseCreateResponses]] — `create`
  *    COMPLETES (the object materializes at close) and then the close
  *    throws: a conditional PUT that landed with the 200 lost.
  */
object ScriptedFaultFileSystem {
  val failOpens = new ConcurrentHashMap[String, AtomicInteger]()
  val failOpensFnf = new ConcurrentHashMap[String, AtomicInteger]()
  val loseCreateResponses = new ConcurrentHashMap[String, AtomicInteger]()
  /** `create` REQUEST lost: throws before anything materializes. */
  val failCreates = new ConcurrentHashMap[String, AtomicInteger]()
  /** Total scripted faults actually fired (for test sanity checks). */
  val fired = new java.util.concurrent.atomic.AtomicLong(0L)

  def reset(): Unit = {
    failOpens.clear(); failOpensFnf.clear(); loseCreateResponses.clear()
    failCreates.clear()
    fired.set(0L)
  }

  def script(m: ConcurrentHashMap[String, AtomicInteger],
      pathSubstring: String, count: Int): Unit =
    m.put(pathSubstring, new AtomicInteger(count))

  /** Consume one fault budget for `path` if any rule matches. */
  private[fs] def take(m: ConcurrentHashMap[String, AtomicInteger],
      path: String): Boolean = {
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (path.contains(e.getKey) && e.getValue.get() > 0 &&
          e.getValue.getAndDecrement() > 0) {
        fired.incrementAndGet()
        return true
      }
    }
    false
  }
}

class ScriptedFaultFileSystem extends ObjectStoreFileSystem {
  import ScriptedFaultFileSystem._

  override def getUri: URI = URI.create("scripted:///")
  override def getScheme: String = "scripted"

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    if (take(failOpensFnf, f.toString))
      throw new java.io.FileNotFoundException(
        s"scripted: open($f) — object positively absent")
    if (take(failOpens, f.toString))
      throw new IOException(s"scripted: open($f) — read path degraded")
    super.open(f, bufferSize)
  }

  private def loseResponse(f: Path,
      mk: () => FSDataOutputStream): FSDataOutputStream = {
    if (take(failCreates, f.toString))
      throw new IOException(s"scripted: create($f) request lost")
    // decide BEFORE create so the budget is consumed exactly once per
    // materialized object, then throw only after close applied the effect
    val lose = take(loseCreateResponses, f.toString)
    val inner = mk()
    if (!lose) inner
    else new FSDataOutputStream(new java.io.OutputStream {
      override def write(b: Int): Unit = inner.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        inner.write(b, off, len)
      override def flush(): Unit = inner.flush()
      override def close(): Unit = {
        inner.close()
        throw new IOException(
          s"scripted: create($f) response lost (object materialized)")
      }
    }, null)
  }

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    loseResponse(f, () =>
      super.create(f, overwrite, bufferSize, replication, blockSize, progress))

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    loseResponse(f, () => super.create(f, permission, overwrite, bufferSize,
      replication, blockSize, progress))
}
