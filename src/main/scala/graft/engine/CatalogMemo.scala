package graft.engine

/** Catalog-scoped build memo for pay-the-shuffle-once layouts (q37's
  * bucketed tables, s05's IVF index): "this catalog already holds the
  * layout for this source data".
  *
  * Two hazards drive the shape:
  *   - IDENTITY. An `identityHashCode(sharedState)` key (the earlier
  *     form) can alias: identity hashes may be reused after a
  *     SharedState is GC'd, so a fresh catalog in a long-lived JVM
  *     could read "already laid out" and fail with table-not-found —
  *     and Int-keyed entries accumulate forever. Keying a
  *     `WeakHashMap` on the SharedState REFERENCE makes entries
  *     identity-correct and lets them die with the session.
  *   - CONTENT. A memo keyed only on the source *path* goes stale if
  *     the files under an unchanged path are rewritten mid-process —
  *     a hit would probe a stale on-disk index. [[CatalogMemo.contentKey]]
  *     folds the source files' (count, max mtime, total bytes) into
  *     the key, so a rewritten dataset at the same path misses and
  *     rebuilds.
  *
  * Usage contract (the q37/s05 success-only discipline): `get` before
  * building; on a miss, `invalidate` → build → `put`, so a partial
  * build (second write throws) retries next call instead of silently
  * serving half a layout.
  */
final class CatalogMemo[V] {
  // WeakHashMap compares keys with equals(); SharedState doesn't
  // override it, so this is reference identity, which is the point.
  private val m = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[AnyRef, (String, V)]())

  /** The memoized value, iff one was recorded for this catalog AND the
    * recorded content key still matches (same path, same files).
    */
  def get(catalog: AnyRef, contentKey: String): Option[V] =
    Option(m.get(catalog)).filter(_._1 == contentKey).map(_._2)

  def invalidate(catalog: AnyRef): Unit = { m.remove(catalog); () }

  def put(catalog: AnyRef, contentKey: String, v: V): Unit = {
    m.put(catalog, (contentKey, v)); ()
  }
}

object CatalogMemo {
  /** Content identity of a source directory: path plus a recursive
    * (file count, max mtime, total bytes) fold. Not cryptographic —
    * it catches the realistic rewrite (new part files, new timestamps,
    * different sizes), and the listing cost is the same O(files) walk
    * any Spark read of the directory performs. A same-millisecond
    * same-size in-place overwrite can still alias; callers needing
    * stronger guarantees should version their paths (the standard
    * data-lake discipline).
    */
  def contentKey(dir: String): String = {
    def walk(f: java.io.File): (Long, Long, Long) =
      if (f.isFile) (1L, f.lastModified, f.length)
      else Option(f.listFiles).getOrElse(Array.empty[java.io.File])
        .foldLeft((0L, 0L, 0L)) { case ((c, mt, b), child) =>
          val (c2, mt2, b2) = walk(child)
          (c + c2, math.max(mt, mt2), b + b2)
        }
    val (c, mt, b) = walk(new java.io.File(dir))
    s"$dir|$c|$mt|$b"
  }
}
