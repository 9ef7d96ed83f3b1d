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

  /** Nonce-keyed work dir scope: creates a fresh
    * `tmpdir/<prefix><12-hex-nonce>` name (never colliding with a
    * concurrent driver round on the same corpus — the reason these dirs
    * are nonce-keyed at all), runs `f` on it, and deletes the tree on
    * every exit path. Wrapping the WHOLE body — staging writes included —
    * is deliberate: a failure while staging must not leak the dir either.
    */
  def withNonceDir[A](prefix: String)(f: java.io.File => A): A = {
    val root = new java.io.File(sys.props("java.io.tmpdir"),
      s"$prefix${java.util.UUID.randomUUID().toString.take(12)}")
    try f(root) finally deleteRecursively(root)
  }
}
