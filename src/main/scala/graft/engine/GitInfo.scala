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

  /** The capture as a JSON document (reference save_yaml →
    * conf/git_config.yml; JSON here so no YAML writer is needed and the
    * driver-side tooling can json.load it).
    */
  def captureJson(repoDir: String): Option[String] =
    capture(repoDir).map(_.toSeq.sortBy(_._1)
      .map { case (k, v) =>
        s""""$k": "${v.replace("\\", "\\\\").replace("\"", "\\\"")}""""
      }
      .mkString("{", ", ", "}"))

  /** Write the capture as a small JSON sidecar to a LOCAL path. */
  def writeSidecar(repoDir: String, outPath: String): Boolean =
    captureJson(repoDir) match {
      case Some(json) =>
        val p = java.nio.file.Paths.get(outPath)
        Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
        java.nio.file.Files.writeString(p, json)
        true
      case None => false
    }

  /** Write the sidecar next to a written dataset through the Hadoop
    * filesystem of the target path — works for any scheme the sink can
    * write to (local, hdfs, s3a, ...), unlike a java.nio path.
    */
  def writeSidecarHadoop(repoDir: String, dataDir: String,
                         conf: org.apache.hadoop.conf.Configuration): Boolean =
    captureJson(repoDir) match {
      case Some(json) =>
        // Path-derived filesystem: raw path strings with spaces etc. are
        // legal here, where a java.net.URI constructor would throw
        val dir = new org.apache.hadoop.fs.Path(dataDir)
        val fs = dir.getFileSystem(conf)
        val out = fs.create(
          new org.apache.hadoop.fs.Path(dir, "_git_info.json"), true)
        try out.write(json.getBytes("UTF-8")) finally out.close()
        true
      case None => false
    }
}
