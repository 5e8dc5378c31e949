package graft.util

/** Recursive directory delete — the one implementation of the
  * walk + reverse-order + deleteIfExists idiom the benches, demo
  * queries, and specs previously each carried a copy of (r18 review).
  * Missing roots are a no-op.
  */
object Dirs {
  def rmTree(root: String): Unit = {
    val p = java.nio.file.Paths.get(root)
    if (java.nio.file.Files.exists(p))
      scala.util.Using.resource(java.nio.file.Files.walk(p)) { w =>
        w.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
      }
  }
}
