package graft.util

import org.apache.spark.sql.SparkSession

/** Build-once / read-back parquet caches keyed by a content
  * fingerprint of their source files — the layout pattern behind
  * [[graft.graph.MemoryGraph.persisted]] and the dedup index: derive
  * an expensive artifact from raw tables ONCE, persist it
  * partitioned the way downstream joins want it, and serve every
  * later session from disk.
  *
  * Safety properties (same as the graph cache):
  *   - fingerprint = source file names + sizes + mtimes → a
  *     regenerated corpus never serves a stale index;
  *   - creation writes to a tmp dir and atomic-renames into place →
  *     no torn reads, and a lost creation race falls back to the
  *     winner's complete copy;
  *   - per-session weak memo → one read per (session, key), no leak
  *     across session shutdowns.
  */
object DiskCache {

  private val memo = new java.util.WeakHashMap[SparkSession,
    scala.collection.concurrent.TrieMap[String, Any]]()

  /** Content fingerprint of a set of source files/directories. */
  def fingerprint(sources: Seq[String]): String = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val parts = sources.flatMap { src =>
      val p = Paths.get(src)
      if (!Files.exists(p)) Seq(s"$src:absent")
      else {
        val walk = Files.walk(p)
        try walk.iterator().asScala
          .filter(Files.isRegularFile(_))
          .map(f => s"${p.relativize(f)}:${Files.size(f)}:${
            Files.getLastModifiedTime(f).toMillis}")
          .toList.sorted
        finally walk.close()
      }
    }
    val md = java.security.MessageDigest.getInstance("SHA-1")
    md.update((sources.mkString(",") + "\n" + parts.mkString("\n"))
      .getBytes("UTF-8"))
    md.digest().map("%02x".format(_)).mkString.take(16)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.iterator().asScala.toList.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }

  /** Serve `read(base)` over a cache at
    * target/<kind>/<version>/<tag>-<fingerprint(sources)>, building it
    * first via `build(tmpBase)` if any `subs` subdir lacks _SUCCESS.
    * `build` must write each listed sub as parquet under the tmp base
    * it is given. */
  def cached[T](s: SparkSession, kind: String, version: String,
                sources: Seq[String], tag: String, subs: Seq[String])
               (build: String => Unit)(read: String => T): T = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val perSession = memo.synchronized {
      var m = memo.get(s)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[String, Any]
        memo.put(s, m)
      }
      m
    }
    val fp = fingerprint(sources)
    val key = s"$kind/$version/$tag-$fp"
    perSession.getOrElseUpdate(key, {
      val basePath = Paths.get(sys.props("user.dir"), "target", kind,
        version, tag.replaceAll("[^A-Za-z0-9.]", "_") + "-" + fp)
      val base = basePath.toString
      def ready = subs.forall(sub =>
        Files.exists(Paths.get(base, sub, "_SUCCESS")))
      if (!ready) {
        val tmp = base + ".tmp-" +
          java.util.UUID.randomUUID().toString.take(8)
        build(tmp)
        try Files.move(Paths.get(tmp), basePath,
          StandardCopyOption.ATOMIC_MOVE)
        catch { case e: java.nio.file.FileSystemException =>
          deleteRecursively(Paths.get(tmp))
          // The move losing to a concurrent winner is fine — but ONLY
          // if the winner's complete copy is actually there. Any other
          // move failure (cross-device tmp, permissions, a stale
          // half-built target) must fail HERE at the seam, not later
          // as an opaque parquet path error from read(base).
          if (!ready) throw new IllegalStateException(
            s"DiskCache: failed to install built artifact at $base " +
              "and no complete winner is present (target exists but " +
              s"lacks ${subs.map(_ + "/_SUCCESS").mkString(", ")})", e)
        }
      }
      read(base)
    }).asInstanceOf[T]
  }
}
