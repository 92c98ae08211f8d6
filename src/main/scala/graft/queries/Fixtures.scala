package graft.queries

/** Fixture-fork helpers shared by the query registrations (r18).
  *
  * Several gate fixtures derive from an identical deterministic base
  * artifact (a z-ordered layout, a persisted index) and then apply one
  * gate-specific lifecycle op. Re-building the base per fixture re-ran
  * the same deterministic computation several times per sweep; instead
  * the base builds once per sf dir and each fixture FILE-COPIES it into
  * a private directory before mutating it. Gate content is unchanged:
  * every gate over these fixtures states a content property (rollup
  * hashes, pruning losslessness) that is insensitive to file
  * boundaries, and a copy is bit-identical anyway. */
private[queries] object Fixtures {
  /** Recursive file copy of a fixture directory. The walk stream is
    * closed explicitly (it holds an open directory handle per level —
    * leaked once per fixture fork otherwise). */
  def copyDir(src: String, dst: String): Unit = {
    val s = java.nio.file.Paths.get(src)
    val t = java.nio.file.Paths.get(dst)
    val walk = java.nio.file.Files.walk(s)
    try walk.forEach { from =>
      val to = t.resolve(s.relativize(from))
      if (java.nio.file.Files.isDirectory(from))
        java.nio.file.Files.createDirectories(to)
      else
        java.nio.file.Files.copy(from, to,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally walk.close()
  }
}
