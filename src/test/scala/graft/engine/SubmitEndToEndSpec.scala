package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** O8 end-to-end: [[Submit.buildCommand]]'s output actually LAUNCHES —
  * the compiled classes jar up, a real `spark-submit` subprocess runs
  * `graft.Runner` against the demo manifest's two-job DAG, and the
  * report parquet lands on disk. This is the one test that exercises
  * the cluster seam with a real launcher instead of asserting command
  * strings (the string-level contract stays in SubmitSpec).
  */
class SubmitEndToEndSpec extends AnyFunSuite {

  private def jarUpClasses(classesDir: java.io.File,
                           jar: java.io.File): Unit = {
    val out = new java.util.jar.JarOutputStream(
      new java.io.FileOutputStream(jar))
    def walk(f: java.io.File, prefix: String): Unit =
      f.listFiles().foreach { c =>
        val name = s"$prefix${c.getName}"
        if (c.isDirectory) walk(c, s"$name/")
        else {
          out.putNextEntry(new java.util.jar.JarEntry(name))
          java.nio.file.Files.copy(c.toPath, out)
          out.closeEntry()
        }
      }
    try walk(classesDir, "") finally out.close()
  }

  test("spark-submit runs the demo YAML DAG through the Runner") {
    val submit = new java.io.File("/opt/spark/bin/spark-submit")
    assume(submit.canExecute, "no spark-submit in this image")
    val classes = new java.io.File("target/scala-2.13/classes")
    assume(classes.isDirectory, "compiled classes not found (run sbt compile)")
    val work = java.nio.file.Files.createTempDirectory("graft_submit").toFile
    val jar = new java.io.File(work, "graft.jar")
    jarUpClasses(classes, jar)
    val outRoot = new java.io.File(work, "demo_out")
    // a scratch manifest copy pointing out_root into this test's tmp dir
    val manifest = new java.io.File(work, "jobs.yml")
    val src = scala.io.Source.fromFile("conf/jobs.yml")
    val yml = try src.mkString finally src.close()
    val w = new java.io.PrintWriter(manifest)
    try w.write(yml.replace("out_root: /tmp/graft_demo",
      s"out_root: ${outRoot.getAbsolutePath}")) finally w.close()

    // the command comes from the O8 seam itself
    val cmd = Submit.buildCommand(jar.getAbsolutePath, Map(
      "spark_submit_keys" -> "class--master--conf",
      "class" -> "graft.Runner",
      "master" -> "local[2]",
      "conf" -> "spark.ui.enabled=false",
      "spark_app_keys" -> "manifest--job_name--dependencies--mode",
      "manifest" -> manifest.getAbsolutePath,
      "job_name" -> "report",
      "dependencies" -> Submit.flagOnly,
      "mode" -> "dev"))
    assert(cmd.head == "spark-submit" && cmd.contains("--dependencies"))
    val pb = new ProcessBuilder(
      (submit.getAbsolutePath +: cmd.tail).toArray: _*)
    pb.redirectErrorStream(true)
    pb.directory(new java.io.File("."))
    val p = pb.start()
    val log = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val done = p.waitFor(300, java.util.concurrent.TimeUnit.SECONDS)
    assert(done, s"spark-submit did not finish:\n${log.takeRight(4000)}")
    assert(p.exitValue() == 0,
      s"spark-submit exited ${p.exitValue()}:\n${log.takeRight(4000)}")
    // the DAG wrote the report under {{out_root}}/report/{{now}}
    val reportRuns = new java.io.File(outRoot, "report").listFiles()
    assert(reportRuns != null && reportRuns.nonEmpty,
      s"no report output under $outRoot:\n${log.takeRight(2000)}")
    val files = reportRuns.head.listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".parquet")),
      s"report run dir holds no parquet: ${files.mkString(", ")}")
  }
}
