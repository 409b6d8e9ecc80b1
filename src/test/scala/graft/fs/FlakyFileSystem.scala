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
  * delete / listStatus / open failing pseudo-randomly in one of two
  * modes:
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
  * Listing and open faults are request-lost only (no side effect to
  * lose). An independent LATENCY axis ([[FlakyFileSystem.armLatency]])
  * stalls ops for a deterministic random delay instead — half before
  * the effect, half after it — so timing-sensitive protocol windows
  * (claim staleness, takeover) race real skew, not just instant faults.
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

  // -------- the LATENCY axis (round-15 stretch): random DELAY instead of
  // loss, so claim staleness, takeover, and the commit loop's backoffs
  // race real timing skew. A delayed op always COMPLETES — the adversary
  // here is the clock, not the effect. Composes with loss injection.
  @volatile private var latMillionths: Int = 0
  @volatile private var latMinMs: Int = 0
  @volatile private var latSpanMs: Int = 1
  val delayed = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Arm injection with a fixed seed; resets ordinals so a run's decision
    * sequence is reproducible. `rate` (0..1) applies to EFFECTFUL ops
    * (rename/create/delete) and listings; `readRate` to `open`. Reads get
    * their own knob because a composite maintenance pass (optimize =
    * repair + compact + analyze + vacuum) performs an order of magnitude
    * more opens than effectful ops — at the effect rate, no whole-pass
    * retry budget converges, which stresses the harness's patience, not
    * the protocol. Defaults to a quarter of `rate`. */
  def arm(newSeed: Long, rate: Double, readRate: Double = -1.0): Unit = {
    seed = newSeed
    ordinals.clear()
    injected.set(0L)
    rateMillionths = math.round(rate * 1e6).toInt
    readRateMillionths =
      if (readRate >= 0) math.round(readRate * 1e6).toInt
      else rateMillionths / 4
  }

  def disarm(): Unit = { rateMillionths = 0; readRateMillionths = 0 }
  @volatile private var readRateMillionths: Int = 0

  /** Arm latency injection: each store op independently stalls with
    * probability `rate` for a deterministic delay in [minMs, maxMs] —
    * half the stalls BEFORE the effect (slow request), half AFTER it
    * (slow response: the effect is visible to racers while the caller
    * still thinks it is in flight — the half that races staleness). */
  def armLatency(newSeed: Long, rate: Double, minMs: Int, maxMs: Int): Unit = {
    seed = newSeed
    delayed.set(0L)
    latMinMs = minMs
    latSpanMs = math.max(1, maxMs - minMs + 1)
    latMillionths = math.round(rate * 1e6).toInt
  }

  def disarmLatency(): Unit = latMillionths = 0

  /** (delayMs, afterEffect): 0 delay = no stall this call. */
  private[fs] def latRoll(op: String, path: String): (Long, Boolean) = {
    val r = latMillionths
    if (r <= 0) return (0L, false)
    val n = ordinals.computeIfAbsent(s"lat|$op|$path",
      _ => new java.util.concurrent.atomic.AtomicLong()).incrementAndGet()
    val h = scala.util.hashing.MurmurHash3.stringHash(s"lat|$seed|$op|$path|$n")
    if ((h & 0x7fffffff) % 1000000 >= r) (0L, false)
    else {
      delayed.incrementAndGet()
      (latMinMs + ((h >>> 8) & 0x7fffff) % latSpanMs, ((h >>> 4) & 1) == 1)
    }
  }

  /** 0 = no fault, 1 = request lost, 2 = response lost. */
  private[fs] def roll(op: String, path: String): Int = {
    val r = if (op == "open") readRateMillionths else rateMillionths
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
    val (lat, after) = latRoll(op, f.toString)
    if (lat > 0 && !after) Thread.sleep(lat)
    val mode = roll(op, f.toString)
    if (mode == 1)
      throw new FlakyIOException(s"injected: $op($f) request lost")
    depth.set(1)
    val out =
      try body
      finally depth.set(0)
    if (lat > 0 && after) Thread.sleep(lat)
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
    if (depth.get() == 0) {
      val (lat, _) = latRoll("list", f.toString)
      if (lat > 0) Thread.sleep(lat)
      if (roll("list", f.toString) != 0)
        throw new FlakyIOException(s"injected: list($f) request lost")
    }
    super.listStatus(f)
  }

  override def open(f: Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream = {
    // READ faults (round-15 "Next round" #2), request-lost only: a read
    // has no effect whose response can lose. The injected exception is
    // NOT a FileNotFoundException — it models a degraded read path (5xx/
    // timeout), which the commit protocol must treat as "presence
    // unknown", never as "positively absent" (the publish read-back
    // distinction this round's Versioned fix encodes).
    if (depth.get() == 0) {
      val (lat, _) = latRoll("open", f.toString)
      if (lat > 0) Thread.sleep(lat)
      if (roll("open", f.toString) != 0)
        throw new FlakyIOException(s"injected: open($f) request lost")
    }
    super.open(f, bufferSize)
  }

  /** Wrap a create so (a) the shim's conditional-PUT close — which runs
    * LATER, outside any [[guarded]] scope — still passes depth-guarded
    * through our own delete/rename overrides, and (b) a response-lost
    * fault fires only AFTER the object materialized. */
  private def createGuarded(f: Path,
      mk: () => FSDataOutputStream): FSDataOutputStream = {
    if (depth.get() > 0) return mk()
    val (lat, latAfter) = latRoll("create", f.toString)
    if (lat > 0 && !latAfter) Thread.sleep(lat)
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
        // slow response: the object is live while the caller still waits
        if (lat > 0 && latAfter) Thread.sleep(lat)
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
