package graft.util

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Shared filesystem helpers for staging/cleanup paths. */
object FileUtils {

  /** Recursive delete; closes the walk stream (it holds a directory fd
    * until closed).
    */
  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
}
