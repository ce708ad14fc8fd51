package graft.catalog

/** Committed-fixture path resolution, shared by every fixture-driven
  * catalog family (PQ codebooks in [[Vectors]], the GA4 nested day in
  * [[Events]]): repo-relative when the JVM runs from the repo root (sbt
  * runMain, Verify, Bench), absolute fallback for harnesses with another
  * cwd. [[abs]] is what DuckDB oracle SQL embeds, so the oracle arm and
  * the Spark arm resolve the SAME location on any checkout. */
object Fixtures {

  /** First existing candidate for `rel` (e.g. "fixtures/pq"), else the
    * relative form (a later read fails with the honest path in the
    * message). */
  def dir(rel: String): String =
    Seq(rel, s"/root/repo/$rel")
      .find(p => new java.io.File(p).isDirectory)
      .getOrElse(rel)

  /** [[dir]] as an absolute path — the form oracle SQL embeds. */
  def abs(rel: String): String = new java.io.File(dir(rel)).getAbsolutePath
}
