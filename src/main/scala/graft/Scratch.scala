package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Harness-owned scratch space for operators that need a filesystem side
  * effect (parquet sink round-trip, file-stream input dirs). One fixed
  * directory per operator name, wiped and recreated on each invocation —
  * repeated Verify/Bench runs reuse the same paths instead of accumulating
  * unbounded /tmp garbage (ADVICE r1). Concurrency contract (r14: Verify
  * dumps run on a thread pool): every `name` belongs to exactly ONE
  * operator and each operator runs at most once per pass, so per-name
  * reuse cannot race; cross-operator memoized builds serialize through
  * their ConcurrentHashMap.computeIfAbsent owners.
  */
object Scratch {
  private val base: Path = Paths.get(
    sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft-scratch")

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }

  /** A clean (empty, existing) scratch directory for `name`. */
  def dir(name: String): String = {
    val d = base.resolve(name)
    deleteRecursively(d)
    Files.createDirectories(d)
    d.toString
  }

  /** Cheap content fingerprint of dataset files — (size, mtime) per file,
    * directories walked one level. Folded into JVM-wide memo keys (trained
    * codebooks, persisted signature artifacts) so regenerating the data
    * under a path invalidates the cache instead of serving stale results
    * (ADVICE r3).
    */
  def fingerprint(paths: String*): String = paths.map { p =>
    val f = new java.io.File(p)
    val fs = if (f.isDirectory) f.listFiles().sortBy(_.getName).toSeq else Seq(f)
    fs.map(c => s"${c.getName}:${c.length}:${c.lastModified}").mkString(",")
  }.mkString("|")
}
