package graft.engine

import graft.core.Secrets
import org.scalatest.funsuite.AnyFunSuite
import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.Base64

/** Loopback SMTP server covering the full client dialogue (EHLO with a
  * multiline reply, AUTH LOGIN, MAIL/RCPT/DATA with dot-stuffing, QUIT).
  */
class NotifySpec extends AnyFunSuite {

  private class FakeSmtp extends Thread {
    val server = new ServerSocket(0, 1, java.net.InetAddress.getLoopbackAddress)
    val port: Int = server.getLocalPort
    @volatile var from: String = _
    @volatile var rcpt: List[String] = Nil
    @volatile var authUser: String = _
    @volatile var authPass: String = _
    @volatile var body: String = _
    setDaemon(true)

    override def run(): Unit = {
      val s = server.accept()
      val in = new BufferedReader(new InputStreamReader(s.getInputStream, StandardCharsets.UTF_8))
      val out = new OutputStreamWriter(s.getOutputStream, StandardCharsets.UTF_8)
      def reply(t: String): Unit = { out.write(t + "\r\n"); out.flush() }
      def b64d(t: String) = new String(Base64.getDecoder.decode(t), StandardCharsets.UTF_8)
      reply("220 fake ready")
      var line = in.readLine()
      while (line != null) {
        line match {
          case l if l.startsWith("EHLO") =>
            reply("250-fake greets you"); reply("250 AUTH LOGIN")
          case "AUTH LOGIN" =>
            reply("334 VXNlcm5hbWU6")
            authUser = b64d(in.readLine())
            reply("334 UGFzc3dvcmQ6")
            authPass = b64d(in.readLine())
            reply("235 ok")
          case l if l.startsWith("MAIL FROM:") =>
            from = l.stripPrefix("MAIL FROM:<").stripSuffix(">"); reply("250 ok")
          case l if l.startsWith("RCPT TO:") =>
            rcpt :+= l.stripPrefix("RCPT TO:<").stripSuffix(">"); reply("250 ok")
          case "DATA" =>
            reply("354 go")
            val sb = new StringBuilder
            var dl = in.readLine()
            while (dl != ".") {
              sb.append(if (dl.startsWith("..")) dl.substring(1) else dl).append("\n")
              dl = in.readLine()
            }
            body = sb.toString
            reply("250 queued")
          case "QUIT" => reply("221 bye")
          case _ => reply("500 what")
        }
        line = in.readLine()
      }
      s.close(); server.close()
    }
  }

  test("sendMessage speaks SMTP end-to-end with auth and dot-stuffing") {
    val fake = new FakeSmtp
    fake.start()
    val cfg = Files.createTempFile("graft_conn", ".cfg")
    Files.writeString(cfg,
      s"""# graft connections
         |[email_notify]
         |sender_email = pipeline@example.com
         |password = hunter2
         |starttls = false
         |smtp_server = 127.0.0.1
         |port = ${fake.port}
         |""".stripMargin)
    val creds = Secrets.retrieve(storage = "local", localPath = cfg.toString)
    val msg = Notify.failureMessage("nightly_orders", "boom") +
      "\n.hidden leading dot line"
    val sent = Notify.sendMessage(msg, Seq("oncall@example.com"),
      creds, "email_notify")
    fake.join(5000)
    assert(sent == Seq("oncall@example.com"))
    assert(fake.from == "pipeline@example.com")
    assert(fake.rcpt == List("oncall@example.com"))
    assert(fake.authUser == "pipeline@example.com" && fake.authPass == "hunter2")
    assert(fake.body.contains("Subject: [Data Pipeline Failure] nightly_orders"))
    assert(fake.body.contains("boom"))
    // dot-stuffing round-tripped: the leading-dot line survives un-doubled
    assert(fake.body.contains("\n.hidden leading dot line"))
  }

  test("no recipients: message is skipped, not an error") {
    assert(Notify.sendMessage("m", Nil, Map.empty, "email_notify") == Nil)
  }
}

class SecretsSpec extends AnyFunSuite {

  test("cfg parse: sections, separators, comments, lower-cased keys") {
    val creds = Secrets.parse(
      """; top comment
        |[db]
        |User = admin
        |password: s3cr=t:x
        |# comment
        |
        |[api]
        |token = abc
        |""".stripMargin)
    assert(Secrets.get(creds, "db", "user") == "admin")
    // value keeps everything after the FIRST separator
    assert(Secrets.get(creds, "db", "password") == "s3cr=t:x")
    assert(Secrets.get(creds, "api", "token") == "abc")
    intercept[RuntimeException](Secrets.get(creds, "db", "missing"))
    intercept[RuntimeException](Secrets.get(creds, "nope", "user"))
  }

  test("retrieve dispatches: local file vs remote fetcher; no silent default") {
    val cfg = Files.createTempFile("graft_sec", ".cfg")
    Files.writeString(cfg, "[s]\nk = local_v\n")
    assert(Secrets.get(Secrets.retrieve("local", cfg.toString), "s", "k") == "local_v")
    val remote = Secrets.retrieve("s3", remoteFetch = id => s"[s]\nk = from_$id\n",
      remoteId = "vault1")
    assert(Secrets.get(remote, "s", "k") == "from_vault1")
    intercept[RuntimeException](Secrets.retrieve("s3"))
  }
}

class SubmitSpec extends AnyFunSuite {

  test("buildCommand orders submit args, launcher, then app args") {
    val cmd = Submit.buildCommand("jobs/report.jar", Map(
      "spark_submit_keys" -> "deploy-mode--num-executors--verbose",
      "deploy-mode" -> "cluster",
      "num-executors" -> "100",
      "verbose" -> Submit.flagOnly,
      "spark_app_keys" -> "job_name--mode",
      "job_name" -> "report",
      "mode" -> "prod"))
    assert(cmd == Seq("spark-submit", "--deploy-mode=cluster",
      "--num-executors=100", "--verbose", "jobs/report.jar",
      "--job_name=report", "--mode=prod"))
  }

  test("a key named in the lists but absent from params fails loudly") {
    val e = intercept[RuntimeException](Submit.buildCommand("a.jar",
      Map("spark_submit_keys" -> "missing-thing")))
    assert(e.getMessage.contains("missing-thing"))
  }
}

class GitInfoSpec extends AnyFunSuite {

  test("capture records branch/commit/dirty in a fresh repo; sidecar is JSON") {
    val dir = Files.createTempDirectory("graft_git").toString
    def git(args: String*): Unit = {
      val p = new ProcessBuilder(
        (Seq("git", "-c", "user.email=t@t", "-c", "user.name=t") ++ args): _*)
        .directory(new java.io.File(dir)).start()
      assert(p.waitFor() == 0, s"git ${args.mkString(" ")} failed")
    }
    assert(!GitInfo.isGitControlled(Files.createTempDirectory("graft_nogit").toString))
    git("init", "-q")
    Files.writeString(java.nio.file.Paths.get(dir, "f.txt"), "x")
    git("add", "f.txt")
    git("commit", "-q", "-m", "init")
    val info = GitInfo.capture(dir).get
    assert(info("last_commit").matches("[0-9a-f]{40}"))
    assert(info("is_dirty") == "false")
    Files.writeString(java.nio.file.Paths.get(dir, "f.txt"), "changed")
    assert(GitInfo.capture(dir).get.apply("is_dirty") == "true")
    val side = s"$dir/out/_git_info.json"
    assert(GitInfo.writeSidecar(dir, side))
    val json = Files.readString(java.nio.file.Paths.get(side))
    assert(json.startsWith("{") && json.contains("\"last_commit\""))
  }
}
