package graft.fs

import java.io.IOException
import java.net.URI

import org.apache.hadoop.fs.{FileStatus, FSDataOutputStream, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** The marker every injected fault carries: harnesses (and the soak's
  * continuous reader) retry exactly these and nothing else, so a REAL
  * protocol failure can never hide behind the injection. */
class FlakyIOException(msg: String) extends IOException(msg)

/** FAULT-INJECTING object store (round-13 "Next round" #1): the
  * [[ObjectStoreFileSystem]] semantics shim, with rename / create /
  * delete / listStatus failing pseudo-randomly in one of two modes:
  *
  *  - **request lost** — the fault fires BEFORE the operation: nothing
  *    happened, the caller sees an IOException (a 5xx/timeout on the
  *    request path);
  *  - **response lost** — the operation COMPLETED server-side and the
  *    fault fires on the way back (a 5xx/timeout on the response path).
  *    This is the adversarial half: the caller must disambiguate
  *    "failed" from "succeeded, unreported" — the exact ambiguity that
  *    made the old publish path delete a committed pointer's data dir.
  *    For `create` the response-lost fault fires at `close()` AFTER the
  *    object materialized, modeling a conditional PUT that landed with
  *    the 200 lost.
  *
  * Listing faults are request-lost only (no side effect to lose).
  * Decisions are a pure hash of (seed, op, path, per-(op,path) call
  * ordinal) — deterministic for a fixed call sequence, independent of
  * wall clock. Injection happens only at the OUTERMOST entry per thread:
  * the shim's internals (copy-rename child PUTs, conditional-PUT
  * cleanup) keep their documented atomicity, so callers always see clean
  * before/after faults, never a shim half-primitive. True TORN states
  * (partial directory copies) are the crash matrix's job (TxnSpec), not
  * this shim's.
  */
object FlakyFileSystem {
  @volatile private var rateMillionths: Int = 0
  @volatile private var seed: Long = 0L
  val injected = new java.util.concurrent.atomic.AtomicLong(0L)
  private val ordinals =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()

  /** Arm injection at `rate` (0..1) with a fixed seed; resets ordinals
    * so a run's decision sequence is reproducible. */
  def arm(newSeed: Long, rate: Double): Unit = {
    seed = newSeed
    ordinals.clear()
    injected.set(0L)
    rateMillionths = math.round(rate * 1e6).toInt
  }

  def disarm(): Unit = rateMillionths = 0

  /** 0 = no fault, 1 = request lost, 2 = response lost. */
  private[fs] def roll(op: String, path: String): Int = {
    val r = rateMillionths
    if (r <= 0) return 0
    val n = ordinals.computeIfAbsent(s"$op|$path",
      _ => new java.util.concurrent.atomic.AtomicLong()).incrementAndGet()
    val h = scala.util.hashing.MurmurHash3.stringHash(s"$seed|$op|$path|$n")
    if ((h & 0x7fffffff) % 1000000 >= r) 0
    else {
      injected.incrementAndGet()
      if (((h >>> 16) & 1) == 1) 2 else 1
    }
  }

  def isInjected(t: Throwable): Boolean = t match {
    case null => false
    case _: FlakyIOException => true
    case other => isInjected(other.getCause) ||
      other.getSuppressed.exists(isInjected)
  }
}

class FlakyFileSystem extends ObjectStoreFileSystem {
  import FlakyFileSystem._

  override def getUri: URI = URI.create("flaky:///")
  override def getScheme: String = "flaky"

  /** Re-entrance depth: >0 means we are inside another intercepted op on
    * this thread (the shim's own internals) — pass straight through. */
  private val depth = new ThreadLocal[Integer] {
    override def initialValue(): Integer = 0
  }

  private def guarded[T](op: String, f: Path)(body: => T): T = {
    if (depth.get() > 0) return body
    val mode = roll(op, f.toString)
    if (mode == 1)
      throw new FlakyIOException(s"injected: $op($f) request lost")
    depth.set(1)
    val out =
      try body
      finally depth.set(0)
    if (mode == 2)
      throw new FlakyIOException(
        s"injected: $op($f) response lost (effect applied)")
    out
  }

  override def rename(src: Path, dst: Path): Boolean =
    guarded("rename", src)(super.rename(src, dst))

  override def delete(f: Path, recursive: Boolean): Boolean =
    guarded("delete", f)(super.delete(f, recursive))

  override def listStatus(f: Path): Array[FileStatus] = {
    // request-lost only: a listing has no effect whose response can lose
    if (depth.get() == 0 && roll("list", f.toString) != 0)
      throw new FlakyIOException(s"injected: list($f) request lost")
    super.listStatus(f)
  }

  /** Wrap a create so (a) the shim's conditional-PUT close — which runs
    * LATER, outside any [[guarded]] scope — still passes depth-guarded
    * through our own delete/rename overrides, and (b) a response-lost
    * fault fires only AFTER the object materialized. */
  private def createGuarded(f: Path,
      mk: () => FSDataOutputStream): FSDataOutputStream = {
    if (depth.get() > 0) return mk()
    val mode = roll("create", f.toString)
    if (mode == 1)
      throw new FlakyIOException(s"injected: create($f) request lost")
    depth.set(1)
    val inner =
      try mk()
      finally depth.set(0)
    new FSDataOutputStream(new java.io.OutputStream {
      override def write(b: Int): Unit = inner.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        inner.write(b, off, len)
      override def flush(): Unit = inner.flush()
      override def close(): Unit = {
        depth.set(1)
        try inner.close()
        finally depth.set(0)
        if (mode == 2)
          throw new FlakyIOException(
            s"injected: create($f) response lost at close (object materialized)")
      }
    }, null)
  }

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    createGuarded(f, () =>
      super.create(f, overwrite, bufferSize, replication, blockSize, progress))

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    createGuarded(f, () => super.create(f, permission, overwrite, bufferSize,
      replication, blockSize, progress))
}
