package graft.util

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Per-process scratch directories for harness-registered standing indexes
  * (the IVF index, the band index). Keyed by PID so concurrent runs (a bench
  * and a verify) never race one's overwrite against the other's read, and
  * removed by a JVM shutdown hook so repeated runs don't accumulate orphaned
  * directories under java.io.tmpdir. In production these are explicit
  * warehouse paths with their own lifecycle, not tmpdirs.
  */
object TmpDirs {

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      registered.forEach(deleteRecursively(_))))

  /** A per-process directory `<tmpdir>/<prefix>_p<pid>`, registered for
    * recursive deletion at JVM exit. Idempotent per prefix. */
  def perProcessDir(prefix: String): String = {
    hookInstalled
    val dir =
      s"${System.getProperty("java.io.tmpdir")}/${prefix}_p${ProcessHandle.current().pid()}"
    registered.add(dir)
    dir
  }

  private def deleteRecursively(dir: String): Unit = {
    val root = Paths.get(dir)
    if (Files.exists(root)) {
      try
        Files.walk(root).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => { val _ = Files.deleteIfExists(p) })
      catch { case _: java.io.IOException => () } // best-effort cleanup
    }
  }
}
