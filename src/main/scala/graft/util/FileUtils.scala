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

  /** The single `part-*.parquet` file of a one-partition Spark write;
    * closes the listing stream (Files.list holds a directory fd until
    * closed — leaked fds accumulate across the hundreds of staged
    * writes a Bench/Verify session performs).
    */
  def firstParquet(dir: Path): Path = {
    val listing = Files.list(dir)
    try listing.filter(p => p.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    finally listing.close()
  }

  /** Recursive copy (regular files + directories; attributes not
    * preserved — consumers treat staged fixtures as content-addressed).
    */
  def copyRecursively(from: Path, to: Path): Unit = {
    val walk = Files.walk(from)
    try walk.forEach { src =>
      val dst = to.resolve(from.relativize(src))
      if (Files.isDirectory(src)) Files.createDirectories(dst)
      else {
        Files.createDirectories(dst.getParent)
        Files.copy(src, dst,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    } finally walk.close()
  }

  /** Directory children, materialized so the stream can be closed. */
  def listDir(p: Path): Seq[Path] = {
    val listing = Files.list(p)
    try {
      val b = Seq.newBuilder[Path]
      listing.forEach(c => b += c)
      b.result()
    } finally listing.close()
  }
}
