package graft.core

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Process-wide fit-once/serve-many model caches for the ANN family
  * (e3/e5/e6/e9/st11): real retrieval deployments fit rarely and serve
  * many query batches, so the benched/registered shape should pay the fit
  * once per dataset, not once per run.
  *
  * Two hazards a naive `ConcurrentHashMap.computeIfAbsent` cache has, both
  * fixed here:
  *  - a path-only key silently serves stale models if the dataset dir is
  *    regenerated with different contents within one JVM — so the key
  *    folds in a cheap content [[FitCache.fingerprint]] (file names,
  *    sizes, mtimes) of the data directory;
  *  - `computeIfAbsent` runs the multi-round Spark fit while holding the
  *    map bin lock, blocking unrelated keys that hash to the same bin —
  *    so the fit runs OUTSIDE any lock and races resolve via
  *    `putIfAbsent` (safe because every fit in this repo is
  *    deterministic: a double-fit returns an identical model and one
  *    copy wins).
  */
final class FitCache[M <: AnyRef] {
  private val models = new java.util.concurrent.ConcurrentHashMap[Any, M]()

  /** Serve the cached model for (`key`, content-of-`dataDir`), fitting on
    * miss. `fit` is by-name and evaluated outside the map's locks.
    */
  def getOrFit(key: Any, dataDir: String)(fit: => M): M = {
    val k = (key, FitCache.fingerprint(dataDir))
    val hit = models.get(k)
    if (hit != null) hit
    else {
      val fitted = fit
      val prev = models.putIfAbsent(k, fitted)
      if (prev != null) prev else fitted
    }
  }

  /** Test hook: simulate a fresh JVM (a driver restart) by dropping every
    * in-memory entry, so the next getOrFit exercises the cold path.
    */
  private[graft] def clear(): Unit = models.clear()
}

object FitCache {

  /** Content fingerprint of a data directory: FNV-1a over the sorted
    * (relative path, size, mtime) triples of every regular file under it.
    * Cheap (a directory walk, no data reads — sf0.1 is ~100 files) and
    * sufficient: parquet writers never rewrite a file in place without
    * changing its size or mtime. A non-existent path (key that isn't a
    * directory) hashes to a constant, degrading to path-only keying.
    */
  def fingerprint(dir: String): Long = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) return 0L
    val walk = Files.walk(p)
    try {
      val entries = walk.iterator().asScala
        .filter(f => Files.isRegularFile(f))
        .map(f => (p.relativize(f).toString, Files.size(f),
          Files.getLastModifiedTime(f).toMillis))
        .toVector.sorted
      entries.foldLeft(0xcbf29ce484222325L) { case (h0, (n, sz, mt)) =>
        var h = h0
        val s = s"$n|$sz|$mt"
        var i = 0
        while (i < s.length) { h = (h ^ s.charAt(i)) * 0x100000001b3L; i += 1 }
        h
      }
    } finally walk.close()
  }
}
