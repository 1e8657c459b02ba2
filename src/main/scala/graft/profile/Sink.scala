package graft.profile

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Terminal JSON sink with the reference's retry/backoff and
  * atomic-upsert semantics (SURVEY.md §2.1 S13; reference:
  * storage/supabase_storage.py:85-133 — 3 attempts with backoff; the
  * object-storage client itself is out of scope in this zero-egress
  * build, so the local implementation is write-temp-then-rename). */
object Sink {

  /** Run `f` with up to `attempts` tries and linear backoff. */
  def withRetries[T](attempts: Int = 3, backoffMs: Long = 100)(f: () => T): T = {
    var last: Throwable = null
    var i = 0
    while (i < attempts) {
      try return f()
      catch {
        case e: Throwable =>
          last = e
          i += 1
          if (i < attempts) Thread.sleep(backoffMs * i)
      }
    }
    throw last
  }

  /** Atomic JSON upsert: write to a temp sibling, rename over the
    * target (readers never observe partial content). */
  def upsertJson(path: String, json: String): Unit = withRetries() { () =>
    val target = Paths.get(path)
    if (target.getParent != null) Files.createDirectories(target.getParent)
    val tmp = Paths.get(path + ".tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Snapshot + stable dual-publish (S14,
    * datasets/noticias_agricolas/sync.py:252-274): versioned dated copy
    * plus the stable path. */
  def dualPublish(baseDir: String, name: String, dateIso: String, json: String): Unit = {
    val Array(y, m, d) = dateIso.take(10).split("-")
    upsertJson(s"$baseDir/snapshots/$y/$m/$d/$name", json)
    upsertJson(s"$baseDir/$name", json)
  }
}
