package graft.util

/** Filesystem helpers shared by every nonce-work-dir site (the layout
  * queries, the streaming ingest/near-dup entries, the pretrain build,
  * and their specs) — one body, so a hardening fix can never silently
  * miss a copy (the `listFiles()`-returns-null guard had to be patched
  * into several hand-rolled copies before this existed).
  */
object Dirs {

  /** Best-effort recursive delete: `listFiles()` returns null on IO or
    * permission errors — cleanup degrades to deleting what it can see,
    * never an NPE.
    */
  def deleteRecursively(p: java.io.File): Unit = {
    if (p.isDirectory) Option(p.listFiles()).foreach(_.foreach(deleteRecursively))
    p.delete(); ()
  }
}
