package graft.db

/** JVM-global catalog of compiled [[DocSelector]]s, keyed by (Spark
  * application, qualified DB folder, snapshot version, canonicalized
  * predicate, shape knobs) — the selector analogue of [[BlockCache]].
  *
  * Why: compiling a selector costs one or two Catalyst jobs (predicate
  * scan + collect/run-write). A serving process that builds the same
  * selector per request — or two [[VectorDB]] instances over the same
  * folder compiling the same predicate — was paying that repeatedly and,
  * in the file-backed shape, writing duplicate run files. The catalog
  * makes repeated compiles of one (folder, snapshot, predicate) return
  * the SAME handle: refcounted while held, kept WARM at refcount zero
  * (that is the rebuild-skip), and freed when its snapshot version is
  * superseded by a commit (immediately if unreferenced, else at last
  * release — in-flight filtered searches keep their ids).
  *
  * Predicates are keyed by their canonical SQL text
  * ([[VectorDB.predKeyOf]]): two `Column`s that render to the same SQL
  * share an entry; semantically-equal-but-differently-written predicates
  * conservatively get separate entries (correct, just unshared).
  *
  * Entries are per Spark application (broadcast ids die with their
  * SparkContext); acquiring under a new application drops the dead
  * application's entries for that folder.
  */
private[graft] object SelectorCatalog {

  /** Identity of one compiled selector: where, against which snapshot,
    * which predicate, and which physical-shape knobs (a different
    * `maxBroadcast`/`runSize` is a different physical object).
    */
  final case class Key(cache: BlockCache.Key, version: String,
                       pred: String, maxBroadcast: Int, runSize: Int)

  /** One cataloged selector. The compile runs OUTSIDE the catalog's
    * global lock, memoized per entry (`lazy val`): two threads racing
    * on the SAME key block each other only on this entry's initializer
    * (one compiles, the other adopts the result), while compiles for
    * DIFFERENT keys — other predicates, other folders — proceed fully
    * in parallel. A failed compile is not cached: Scala re-attempts a
    * lazy initializer whose previous attempt threw, and the failing
    * acquirer removes its provisional entry. `built` guards teardown:
    * freeing an entry whose compile never ran must not trigger one.
    */
  private final class Entry(buildFn: () => DocSelector) {
    var refs: Int = 0
    var superseded: Boolean = false
    @volatile var built: Boolean = false
    lazy val sel: DocSelector = {
      val s = buildFn()
      built = true
      // Only after `built` is visible may the in-flight registration
      // drop: [[liveRunDirsFor]] samples `building` BEFORE the entry
      // scan, so any sweep that misses the dir here must observe the
      // built entry (write order built→remove, read order
      // building→entries).
      s.idSet match {
        case r: RunIdSet => doneBuilding(r.dir)
        case _           =>
      }
      s
    }
    def freeIfBuilt(): Unit = if (built) sel.freeBacking()
  }

  private val entries = new java.util.concurrent.ConcurrentHashMap[Key, Entry]()

  /** Run dirs whose cataloged build is IN FLIGHT: the run files and
    * manifest land (keyed to the pre-commit snapshot version) before
    * the owning entry flips `built`, so without this set a concurrent
    * commit's orphan sweep could delete a dir the about-to-return
    * [[DocSelector]] references (ADVICE r10). Registered by
    * `VectorDB.buildSelector` before the first run write; dropped when
    * the entry is built (above) or the build fails.
    */
  private val building =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private[graft] def registerBuilding(dir: String): Unit = building.add(dir)
  private[graft] def doneBuilding(dir: String): Unit = building.remove(dir)

  /** Get-or-build the shared selector for `key`; the caller owns one
    * reference and must release it (via [[DocSelector.release]] —
    * exactly once per acquire). A warm entry (refcount zero, version
    * still current) is a hit: that is the skipped rebuild. The build
    * itself runs outside the catalog lock — see [[Entry]].
    */
  def acquire(key: Key)(build: => DocSelector): DocSelector = {
    val e = synchronized {
      // Entries left by a PREVIOUS Spark application over this folder
      // can never be valid again (their broadcasts died with the
      // context); drop them so restarted sessions don't accumulate
      // dead handles.
      val it0 = entries.entrySet().iterator()
      while (it0.hasNext) {
        val en = it0.next()
        if (en.getKey.cache.folder == key.cache.folder &&
            en.getKey.cache.app != key.cache.app) it0.remove()
      }
      val ex = entries.get(key)
      if (ex != null) { ex.refs += 1; ex }
      else {
        val ne = new Entry(() => build)
        ne.refs = 1
        entries.put(key, ne)
        ne
      }
    }
    try e.sel
    catch {
      case t: Throwable =>
        synchronized {
          e.refs -= 1
          if (e.refs <= 0 && !e.built) entries.remove(key, e)
        }
        throw t
    }
  }

  /** Drop one reference. The entry stays warm at refcount zero while
    * its snapshot is current; a superseded entry frees its backing
    * (broadcast / run files) at the last release.
    */
  def release(key: Key): Unit = synchronized {
    val e = entries.get(key)
    if (e != null) {
      e.refs -= 1
      if (e.refs <= 0 && e.superseded) {
        entries.remove(key)
        e.freeIfBuilt()
      }
    }
  }

  /** A commit installed `newVersion` for this folder: every cataloged
    * selector compiled against an older snapshot is stale (its id set
    * no longer equals the predicate's matches). Unreferenced stale
    * entries free now; held ones free at last release. Called from
    * [[BlockCache.invalidate]] — the single funnel every commit path
    * (COW, MOR, compaction, cross-JVM marker adoption) goes through.
    */
  def invalidateFolder(cache: BlockCache.Key, newVersion: String): Unit =
    synchronized {
      val it = entries.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey.cache == cache && e.getKey.version != newVersion) {
          e.getValue.superseded = true
          if (e.getValue.refs <= 0) {
            it.remove()
            e.getValue.freeIfBuilt()
          }
        }
      }
    }

  /** Free every unreferenced entry for `folder` regardless of version —
    * the explicit "give the memory back" hook for a service that is
    * done with a folder but keeps the JVM up. Held entries are left
    * alone (marked superseded, so they free at last release).
    */
  def clear(folder: String): Unit = synchronized {
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.cache.folder == folder) {
        e.getValue.superseded = true
        if (e.getValue.refs <= 0) {
          it.remove()
          e.getValue.freeIfBuilt()
        }
      }
    }
  }

  /** Run directories backing LIVE entries for `folder` (held or warm,
    * any version) — the writer's orphan sweep must not touch these:
    * a held superseded entry keeps its files until last release.
    */
  private[graft] def liveRunDirsFor(folder: String): Set[String] =
    synchronized {
      val b = Set.newBuilder[String]
      // Sample in-flight builds FIRST, built entries second: a build
      // flips `built` before deregistering, so a dir absent from this
      // snapshot is either long gone or already a built entry below.
      // All folders' in-flight dirs are included (raw vs qualified
      // folder strings don't compare reliably) — an extra live dir
      // only makes the sweep skip it, never delete.
      building.forEach { d => b += d }
      entries.forEach { (k, e) =>
        if (k.cache.folder == folder && e.built) e.sel.idSet match {
          case r: RunIdSet => b += r.dir
          case _ =>
        }
      }
      b.result()
    }

  /** Test hook: drop a folder's entries WITHOUT freeing their backing —
    * simulates a fresh JVM whose catalog is empty while the previous
    * JVM's run files (and manifests) are still on the shared FS.
    */
  private[graft] def forgetForTest(folder: String): Unit = synchronized {
    val it = entries.keySet().iterator()
    while (it.hasNext) if (it.next().cache.folder == folder) it.remove()
  }

  /** Test hook: number of live entries (any version) for a folder. */
  private[graft] def liveFor(folder: String): Int = synchronized {
    var n = 0
    val it = entries.keySet().iterator()
    while (it.hasNext) if (it.next().cache.folder == folder) n += 1
    n
  }

  /** Test hook: refcount of `key`, 0 if absent. */
  private[graft] def refsFor(key: Key): Int = synchronized {
    val e = entries.get(key)
    if (e == null) 0 else e.refs
  }
}
