package graft

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.TableSwap

/** Every crash state the two-move swap can leave must recover to a
  * consistent live table (the reingest durability contract).
  */
class TableSwapSpec extends AnyFunSuite {

  private def mk(dir: Path, name: String, marker: String): Path = {
    val p = dir.resolve(name)
    Files.createDirectories(p)
    Files.writeString(p.resolve("data"), marker)
    p
  }

  private def marker(p: Path): String = Files.readString(p.resolve("data"))

  private def fresh(): (Path, String) = {
    val dir = Files.createTempDirectory("swap")
    (dir, dir.resolve("t").toString)
  }

  test("clean state: no action") {
    val (dir, path) = fresh()
    mk(dir, "t", "live")
    assert(TableSwap.recoverSwap(path).isEmpty)
    assert(marker(dir.resolve("t")) == "live")
  }

  test("stale staging and leftover old drop when live is intact") {
    val (dir, path) = fresh()
    mk(dir, "t", "live"); mk(dir, "t.staging", "s"); mk(dir, "t.old", "o")
    assert(TableSwap.recoverSwap(path).isDefined)
    assert(marker(dir.resolve("t")) == "live")
    assert(!Files.exists(dir.resolve("t.staging")))
    assert(!Files.exists(dir.resolve("t.old")))
  }

  test("crash between moves rolls FORWARD to the completed staging") {
    val (dir, path) = fresh()
    mk(dir, "t.staging", "new"); mk(dir, "t.old", "old")
    assert(TableSwap.recoverSwap(path).isDefined)
    assert(marker(dir.resolve("t")) == "new")
    assert(!Files.exists(dir.resolve("t.old")))
  }

  test("crash before staging completes rolls BACK to old") {
    val (dir, path) = fresh()
    mk(dir, "t.old", "old")
    assert(TableSwap.recoverSwap(path).isDefined)
    assert(marker(dir.resolve("t")) == "old")
  }

  test("swap replaces live and cleans up; interrupted writer is recoverable") {
    val (dir, path) = fresh()
    mk(dir, "t", "v1")
    TableSwap.swap(path)(staging => { mk(dir, "t.staging", "v2"); () })
    assert(marker(dir.resolve("t")) == "v2")
    assert(!Files.exists(dir.resolve("t.staging")))
    assert(!Files.exists(dir.resolve("t.old")))
    // a writer crash (staging half-written, live untouched) recovers to v2
    mk(dir, "t.staging", "half")
    assert(TableSwap.recoverSwap(path).contains("dropped stale .staging"))
    assert(marker(dir.resolve("t")) == "v2")
  }
}
