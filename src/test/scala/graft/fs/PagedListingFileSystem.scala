package graft.fs

import java.net.URI

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem, RemoteIterator}

/** A local filesystem that distinguishes FULL-ARRAY directory listings
  * (`listStatus` — one giant array per million-file bucket dir) from
  * PAGINATED ones (`listStatusIterator` — what S3A/ABFS stream in pages)
  * against data bucket dirs (`data/bucket=N`). The vacuum listing path
  * must drive `fullListings` to ZERO while the iterator counter moves:
  * that is the mechanical proof it streams pages on a real object store
  * instead of materializing a directory-sized array in one task
  * (round-12 minor #1). The iterator served here really pages (capped
  * batches over the underlying array), so `maxBatch` additionally pins
  * the shape a store-backed iterator would have. Registered as scheme
  * `pagedfs` (`fs.pagedfs.impl`); paths map 1:1 onto the local FS. */
class PagedListingFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("pagedfs:///")
  override def getScheme: String = "pagedfs"

  private def isBucketDir(f: Path): Boolean =
    f.toString.contains("/data/bucket=")

  override def listStatus(f: Path): Array[FileStatus] = {
    if (isBucketDir(f)) PagedListingFileSystem.fullListings.incrementAndGet()
    super.listStatus(f)
  }

  override def listStatusIterator(f: Path): RemoteIterator[FileStatus] = {
    if (!isBucketDir(f)) return super.listStatusIterator(f)
    PagedListingFileSystem.iteratorListings.incrementAndGet()
    val all = super.listStatus(f) // backing store; served out in pages
    new RemoteIterator[FileStatus] {
      private var served = 0
      private var page: Array[FileStatus] = Array.empty
      private var inPage = 0
      def hasNext: Boolean = inPage < page.length || served < all.length
      def next(): FileStatus = {
        if (inPage >= page.length) {
          val n = math.min(PagedListingFileSystem.PageSize, all.length - served)
          page = java.util.Arrays.copyOfRange(all, served, served + n)
          served += n
          inPage = 0
          PagedListingFileSystem.maxBatch.accumulateAndGet(n, math.max)
        }
        val st = page(inPage); inPage += 1; st
      }
    }
  }
}

object PagedListingFileSystem {
  val PageSize = 7 // deliberately tiny so even small fixtures multi-page
  val fullListings = new java.util.concurrent.atomic.AtomicLong(0L)
  val iteratorListings = new java.util.concurrent.atomic.AtomicLong(0L)
  val maxBatch = new java.util.concurrent.atomic.AtomicLong(0L)
  def reset(): Unit = { fullListings.set(0); iteratorListings.set(0); maxBatch.set(0) }
}
