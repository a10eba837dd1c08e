package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Content-keyed staging: same path + changed bytes ⇒ different dir,
  * stale generations reaped, markers race-tolerant.
  */
class StagingSpec extends AnyFunSuite {

  test("dir key tracks content: rewriting the source yields a new dir and reaps the old") {
    val src = Files.createTempFile("graft_staging_src_", ".bin")
    Files.write(src, Array[Byte](1, 2, 3))
    val d1 = Staging.dirFor("graft_spec_stage", src)
    assert(Files.isDirectory(d1))

    // same content → same dir, still present
    assert(Staging.dirFor("graft_spec_stage", src) === d1)

    // rewrite in place (different size so the key must change even if
    // the filesystem's mtime granularity swallows the timestamp delta)
    Files.write(src, Array[Byte](1, 2, 3, 4))
    val d2 = Staging.dirFor("graft_spec_stage", src)
    assert(d2 !== d1, "regenerated source must key a fresh staging dir")
    assert(Files.isDirectory(d2))
    assert(!Files.exists(d1), "the stale generation must be reaped")

    Staging.deleteRecursively(d2)
    Files.deleteIfExists(src)
  }

  test("reap never touches in-flight build siblings (non-generation names)") {
    val src = Files.createTempFile("graft_staging_src2_", ".bin")
    Files.write(src, Array[Byte](9))
    val d1 = Staging.dirFor("graft_spec_stage2", src)
    // a concurrent stager's temp build dir shares the family prefix but
    // is not a bare <family>_<16-hex> name — it must survive the reap
    val build = d1.resolveSibling(d1.getFileName.toString + "_build_tmp")
    Files.createDirectories(build)
    Files.write(src, Array[Byte](9, 9))
    Staging.dirFor("graft_spec_stage2", src)
    assert(Files.isDirectory(build), "in-flight build dirs must not be reaped")
    Staging.deleteRecursively(build)
    Files.deleteIfExists(src)
  }

  test("touchMarker tolerates the marker already existing") {
    val dir = Files.createTempDirectory("graft_spec_marker_")
    val m = dir.resolve("_READY")
    Staging.touchMarker(m)
    Staging.touchMarker(m) // second call must not throw
    assert(Files.exists(m))
    Staging.deleteRecursively(dir)
  }
}
