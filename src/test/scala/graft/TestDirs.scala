package graft

/** Shared tmpdir bookkeeping for the specs that assert nonce-work-dir
  * cleanup (the Dirs.withNonceDir sites): snapshot the matching dir
  * names before the exercise, diff after. One body, one prefix
  * parameter — the PretrainBuild/NearDupStream copies had already
  * started to drift.
  *
  * The snapshot/diff tolerates nonce dirs that PREDATE the test (a
  * concurrent driver round's in-flight dir). A concurrent round that
  * STARTS mid-test can still collide with the diff — accepted residual:
  * one driver round per corpus is the documented operating norm, and
  * the check stays strict for the leak it exists to catch.
  */
object TestDirs {
  def nonceDirs(prefix: String): Set[String] =
    Option(new java.io.File(sys.props("java.io.tmpdir")).listFiles())
      .getOrElse(Array.empty)
      .collect { case f if f.getName.startsWith(prefix) => f.getName }
      .toSet
}
