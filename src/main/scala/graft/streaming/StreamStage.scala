package graft.streaming

import java.nio.file.{Files, Path, Paths}

/** Resolves the directory a file-stream source should monitor for a
  * testdata table. The file stream source monitors a DIRECTORY (its
  * production shape). A Spark-written table is already a directory of
  * part files — monitor it in place. The driver testdata tables are
  * single parquet FILES; those are staged into a per-(sf, table)
  * directory with a hard link (fallback: copy) once.
  * (Files.copy on a directory copies only the empty dir entry, so
  * staging a directory-shaped table would silently yield an empty
  * stream — the round-6 sf0.3 bug.)
  */
object StreamStage {

  /** Path to monitor for `dir/<table>.parquet`. Single-file tables are
    * staged under graft-stream/<dirHash>/stage/<table>/<stamp>, keyed
    * on (size XOR mtime) so a regenerated source file (new inode,
    * same path) gets a fresh staging dir instead of silently reusing
    * a hard link to the old content. Stale stamp siblings under the
    * TABLE's own stage dir are swept before staging, so regenerations
    * don't leak tmp dirs while other tables' stagings (different
    * stamps by construction) stay untouched; the dirHash root also
    * hosts sink dirs like win_parquet — stage/ keeps the sweep away
    * from them. Legacy flat-layout graft-stream/<dirHash>-<stamp>
    * orphans are swept too. */
  def monitoredPath(dir: String, table: String): String = {
    val srcPath = Paths.get(s"$dir/$table.parquet")
    if (Files.isDirectory(srcPath)) srcPath.toString
    else {
      val stamp = java.lang.Long.toHexString(
        Files.size(srcPath) ^
          Files.getLastModifiedTime(srcPath).toMillis)
      val root = Paths.get(sys.props("java.io.tmpdir"), "graft-stream")
      val dirHash = Integer.toHexString(dir.hashCode)
      val tableRoot = root.resolve(dirHash).resolve("stage").resolve(table)
      val streamDir = tableRoot.resolve(stamp)
      val target = streamDir.resolve(s"$table.parquet")
      if (!Files.exists(target)) {
        sweep(tableRoot, _.getFileName.toString != stamp)
        // transitional layouts left by earlier builds: flat
        // <dirHash>-<stamp> at the root, and bare-hex stamp dirs
        // directly under stage/. A live table dir must never match:
        // exclude every known table name (ADVICE r7 — an 8-16-char
        // all-hex table name like 'deadbeef' would otherwise have its
        // staging swept whenever another table stages).
        sweep(root, _.getFileName.toString.startsWith(dirHash + "-"))
        sweep(tableRoot.getParent, p => {
          val n = p.getFileName.toString
          n.matches("[0-9a-f]{8,16}") && !graft.Tables.names.contains(n)
        })
        Files.createDirectories(streamDir)
        try Files.createLink(target, srcPath)
        catch { case _: Exception => Files.copy(srcPath, target) }
      }
      streamDir.toString
    }
  }

  private def rmTree(p: Path): Unit = {
    val walk = Files.walk(p)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(Files.deleteIfExists(_))
    finally walk.close()
  }

  private def sweep(parent: Path, stale: Path => Boolean): Unit =
    if (Files.isDirectory(parent)) {
      val ls = Files.list(parent)
      try ls.filter(p => stale(p)).forEach(rmTree(_))
      finally ls.close()
    }
}
