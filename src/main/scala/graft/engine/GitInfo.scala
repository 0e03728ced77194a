package graft.engine

/** Run-provenance capture (SURVEY O14; reference Git_Config_Manager,
  * yaetos/git_utils.py:8-49): record which commit/branch produced an
  * output, written as a sidecar next to the data. Capture degrades to
  * None outside a git checkout (the reference's is_git_controlled
  * check) — provenance is best-effort, never a job failure.
  */
object GitInfo {

  private def run(dir: String, args: String*): Option[String] =
    try {
      val p = new ProcessBuilder(("git" +: args): _*)
        .directory(new java.io.File(dir))
        .redirectErrorStream(false)
        .start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8").trim
      if (p.waitFor() == 0) Some(out) else None
    } catch { case _: java.io.IOException => None }

  def isGitControlled(dir: String): Boolean =
    run(dir, "rev-parse", "--is-inside-work-tree").contains("true")

  /** branch / last_commit / is_dirty for the checkout at `dir` (the
    * reference captures the same trio; diffs are summarized to a flag —
    * shipping full diff text in a sidecar leaks more than it documents).
    */
  def capture(dir: String): Option[Map[String, String]] =
    if (!isGitControlled(dir)) None
    else for {
      branch <- run(dir, "describe", "--all", "--always")
      commit <- run(dir, "rev-parse", "HEAD")
      diff <- run(dir, "status", "--porcelain")
    } yield Map(
      "branch" -> branch,
      "last_commit" -> commit,
      "is_dirty" -> (diff.nonEmpty).toString)

  /** Write the capture as a small JSON sidecar (reference save_yaml →
    * conf/git_config.yml; JSON here so no YAML writer is needed and the
    * driver-side tooling can json.load it).
    */
  def writeSidecar(repoDir: String, outPath: String): Boolean =
    capture(repoDir) match {
      case Some(m) =>
        val json = m.toSeq.sortBy(_._1)
          .map { case (k, v) =>
            s""""$k": "${v.replace("\\", "\\\\").replace("\"", "\\\"")}""""
          }
          .mkString("{", ", ", "}")
        val p = java.nio.file.Paths.get(outPath)
        Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
        java.nio.file.Files.writeString(p, json)
        true
      case None => false
    }
}
