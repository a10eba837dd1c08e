package graft

import java.nio.file.{Files, Path, Paths}

/** Content-keyed /tmp staging dirs for fixtures derived from a corpus
  * file.
  *
  * Keyed by (path, size, mtime) — NOT path alone — so a corpus
  * regenerated in place gets a fresh dir and can never be served stale
  * derived data: a path-only key survives an in-place rewrite and keeps
  * replaying the old bytes (or the old physical schema) forever. The
  * dir name embeds a separate path hash so older generations of the
  * SAME source can be recognized and reaped.
  */
object Staging {

  /** `/tmp/<prefix>_<md5(path)>_<generation key>`, created unless
    * `create=false` (stagers that ATOMIC_MOVE a build dir onto the final
    * name need the target absent), with stale sibling generations of the
    * same source reaped best-effort.
    *
    * The generation key hashes (path, size, mtime) PLUS the file's
    * first and last 4 KiB: a same-length regeneration landing in the
    * same mtime millisecond would otherwise key the old dir and replay
    * stale fixtures — and for parquet the footer (schema + stats) lives
    * in the tail block, so any physical-type change is always captured.
    *
    * Reaping trade-off, explicit: a concurrent process still streaming
    * from a PRIOR generation (possible only when the corpus is
    * regenerated in place mid-query) loses its files and fails fast.
    * That transient, retryable failure is accepted in exchange for
    * never serving stale derived data — the silent-wrong-answer class
    * this helper exists to kill.
    */
  def dirFor(prefix: String, src: Path, create: Boolean = true): Path = {
    val pathKey = Digest.md5Hex(src.toString, 8)
    val genKey  = Digest.md5Hex(s"$src|${sourceSignature(src)}", 8)
    val dir = Paths.get(s"/tmp/${prefix}_${pathKey}_$genKey")
    reapStale(s"${prefix}_$pathKey", dir)
    if (create) Files.createDirectories(dir)
    dir
  }

  /** Content signature of a source that may be a single file (the
    * driver's corpus shape) or a multi-part dataset DIRECTORY (e.g.
    * ScaleTrend's generated corpus): files sign as
    * size|mtime|edge-digest; directories sign as the sorted child
    * (name, size, mtime) listing — part files are immutable once
    * written, so the listing changes iff the dataset was rewritten.
    */
  private def sourceSignature(src: Path): String =
    if (Files.isDirectory(src)) {
      val listing = Files.list(src)
      try {
        val it = listing.sorted().iterator()
        val sb = new StringBuilder
        while (it.hasNext) {
          val p = it.next()
          sb.append(p.getFileName).append('|').append(Files.size(p))
            .append('|').append(Files.getLastModifiedTime(p).toMillis).append(',')
        }
        sb.toString
      } finally listing.close()
    } else
      s"${Files.size(src)}|${Files.getLastModifiedTime(src).toMillis}|${edgeDigest(src)}"

  /** md5 of the file's first and last 4 KiB — an 8 KiB read regardless
    * of file size.
    */
  private def edgeDigest(src: Path): String = {
    val ch = java.nio.channels.FileChannel.open(src)
    try {
      val sz   = ch.size()
      val head = java.nio.ByteBuffer.allocate(math.min(4096L, sz).toInt)
      ch.read(head, 0L)
      val tail = java.nio.ByteBuffer.allocate(math.min(4096L, sz).toInt)
      ch.read(tail, math.max(0L, sz - 4096L))
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(head.array())
      md.update(tail.array())
      md.digest().take(8).map("%02x".format(_)).mkString
    } finally ch.close()
  }

  /** Delete sibling generations `<family>_<16-hex-gen>` other than
    * `keep`. The exact-shape match (not a prefix glob) means a stager's
    * in-flight `*_build_*` sibling is never reaped from under it.
    * Purely best-effort: concurrent deletion races are swallowed — a
    * stale gen that survives one reap is removed by the next caller.
    */
  private def reapStale(family: String, keep: Path): Unit =
    try {
      val gen = (family + "_[0-9a-f]{16}").r
      val listing = Files.list(Paths.get("/tmp"))
      try listing
        .filter(p => gen.matches(p.getFileName.toString) && p != keep)
        .forEach(deleteRecursively)
      finally listing.close()
    } catch { case _: Exception => () }

  def deleteRecursively(p: Path): Unit =
    try {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    } catch { case _: Exception => () }

  /** Create a `_READY`-style marker, tolerating the check-then-create
    * race: a concurrent run creating it first means the fixture is
    * complete either way.
    */
  def touchMarker(marker: Path): Unit =
    try Files.createFile(marker)
    catch { case _: java.nio.file.FileAlreadyExistsException => () }
}
