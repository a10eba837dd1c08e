package graft.sources

import java.nio.file.{Files, Path, StandardCopyOption}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.DataFrame

/** Stage an "arriving batch" as N single-file parquet slices with
  * STRICTLY INCREASING mtimes, so a `maxFilesPerTrigger=1` file stream
  * replays them as N deterministically-ordered micro-batches (the file
  * source dequeues oldest-first) — the arrival order an oracle can
  * replay as sequential admit rounds. Shared by the streaming
  * index-maintenance queries (q202 document bands, q203 embedding
  * postings).
  *
  * Built once per corpus generation behind a marker (content-keyed
  * staging dir via [[graft.Staging.dirFor]], the repo-wide fixture
  * pattern); slice files land under temp names and ATOMIC_MOVE in
  * before the marker does, so a concurrent stager can never observe a
  * half-written fixture.
  */
object SliceStager {

  /** @param prefix  staging-dir prefix (also the reap namespace)
    * @param src     corpus file the fixture derives from (content key)
    * @param slices  number of ordered slices
    * @param sliceDf slice index => the rows of that slice
    * @return        directory path to feed `readStream.parquet`
    */
  def stage(prefix: String, src: Path, slices: Int, sliceDf: Int => DataFrame): String = {
    val dir    = graft.Staging.dirFor(prefix, src.toAbsolutePath.normalize)
    val marker = dir.resolve("_READY")
    if (!Files.exists(marker)) {
      val nonce =
        ProcessHandle.current().pid().toString + "_" + Thread.currentThread().getId
      (0 until slices).foreach { g =>
        val build = dir.resolve(s"_build_${nonce}_$g")
        sliceDf(g).coalesce(1).write.mode("overwrite").parquet(build.toString)
        val part = Files.list(build)
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .findFirst().orElseThrow()
        val dest = dir.resolve(s"slice_$g.parquet")
        Files.move(part, dest,
          StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
        // fixed epoch + g minutes: order is a property of the fixture,
        // not of when it was staged (maxFileAge is relative to the
        // NEWEST file, so ancient absolute times are fine)
        Files.setLastModifiedTime(dest, FileTime.fromMillis(1700000000000L + g * 60000L))
        Files.walk(build).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.deleteIfExists(p))
      }
      val mt = dir.resolve(s"_READY.$nonce")
      Files.write(mt, Array.emptyByteArray)
      Files.move(mt, marker,
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    }
    dir.toString
  }
}
