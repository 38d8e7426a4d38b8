package graft.core

import java.nio.file.{Files, Paths}

class FitCacheSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def tempDataDir(): String = {
    val d = Files.createTempDirectory("graft-fitcache")
    Files.writeString(d.resolve("part-0.parquet"), "aaaa")
    d.toString
  }

  test("second lookup serves the cached model without refitting") {
    val cache = new FitCache[java.lang.Integer]
    val dir = tempDataDir()
    var fits = 0
    def fit(): java.lang.Integer = { fits += 1; Integer.valueOf(fits) }
    assert(cache.getOrFit("m", dir)(fit()) == 1)
    assert(cache.getOrFit("m", dir)(fit()) == 1)
    assert(fits == 1)
  }

  test("regenerating the dataset dir invalidates the entry (content fingerprint)") {
    val cache = new FitCache[java.lang.Integer]
    val dir = tempDataDir()
    var fits = 0
    def fit(): java.lang.Integer = { fits += 1; Integer.valueOf(fits) }
    assert(cache.getOrFit("m", dir)(fit()) == 1)
    // regenerate: different size is enough (mtime granularity can be 1s)
    Files.writeString(Paths.get(dir, "part-0.parquet"), "bbbbbbbb")
    assert(cache.getOrFit("m", dir)(fit()) == 2, "stale model served after regen")
    assert(fits == 2)
  }

  test("distinct keys over one dir do not collide; non-dir keys degrade gracefully") {
    val cache = new FitCache[String]
    val dir = tempDataDir()
    assert(cache.getOrFit(("a", 1), dir)("A") == "A")
    assert(cache.getOrFit(("a", 2), dir)("B") == "B")
    // a key that is not a path: fingerprint degrades to a constant
    assert(cache.getOrFit("x", "not/a/real/dir")("C") == "C")
    assert(cache.getOrFit("x", "not/a/real/dir")("never") == "C")
  }

  test("concurrent misses race safely: every caller gets ONE winning instance") {
    val cache = new FitCache[java.lang.Long]
    val dir = tempDataDir()
    val fits = new java.util.concurrent.atomic.AtomicLong(0)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val threads = (1 to 8).map(_ => new Thread(() =>
      results.add(cache.getOrFit("race", dir) {
        Thread.sleep(20) // widen the race window; fit runs OUTSIDE the lock
        java.lang.Long.valueOf(fits.incrementAndGet())
      })))
    threads.foreach(_.start()); threads.foreach(_.join())
    // several threads may have fitted (deterministic fits make that safe),
    // but putIfAbsent guarantees every caller observed the SAME instance
    val distinct = results.toArray(Array.empty[java.lang.Long]).distinct
    assert(distinct.length == 1, s"divergent instances: ${distinct.toSeq}")
    assert(fits.get() >= 1)
  }

  test("fingerprint is stable across walks and sensitive to names/sizes") {
    val dir = tempDataDir()
    val f1 = FitCache.fingerprint(dir)
    assert(f1 == FitCache.fingerprint(dir))
    Files.writeString(Paths.get(dir, "part-1.parquet"), "x")
    assert(FitCache.fingerprint(dir) != f1)
    assert(FitCache.fingerprint("missing/dir") == 0L)
  }
}
