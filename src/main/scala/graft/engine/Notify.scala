package graft.engine

import graft.core.Secrets
import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.util.Base64

/** Run-notification email (SURVEY K13; reference send_msg /
  * send_job_failure_email / send_email, yaetos/etl_utils.py:732-755 and
  * :1531-1536).
  *
  * The transport is a from-scratch minimal SMTP client (EHLO, optional
  * STARTTLS, optional AUTH LOGIN, MAIL/RCPT/DATA with dot-stuffing) —
  * small enough to own, and testable against a loopback server in a
  * zero-egress environment. Credentials come from a [section] of the
  * Secrets cfg exactly like the reference (`sender_email`, `password`,
  * `smtp_server`, `port`).
  */
object Notify {

  /** The reference's failure-notification template
    * (yaetos/etl_utils.py:754-755), minus the AWS-specific tail.
    */
  def failureMessage(jobName: String, error: String): String =
    s"Subject: [Data Pipeline Failure] $jobName\n\n" +
      s"A Data pipeline named '$jobName' failed.\nError message:\n$error\n\n" +
      "Please check the run logs."

  /** Send `message` to each recipient using creds from `credsSection` of
    * `creds` (reference send_msg). Returns the recipients actually sent
    * to; empty recipients logs-and-skips like the reference rather than
    * failing the job over a notification.
    *
    * STARTTLS defaults ON whenever a password is configured (sending AUTH
    * credentials over plaintext is never right against a real server);
    * a loopback/test relay without auth stays plaintext. Override with an
    * explicit `starttls = true|false` key in the creds section.
    */
  def sendMessage(message: String, recipients: Seq[String],
                  creds: Secrets.Creds, credsSection: String,
                  transport: SmtpTransport = Smtp): Seq[String] = {
    if (recipients.isEmpty) {
      System.err.println(s"[notify] no recipients configured; message:\n$message")
      Nil
    } else {
      val host = Secrets.get(creds, credsSection, "smtp_server")
      val port = Secrets.get(creds, credsSection, "port").toInt
      val sender = Secrets.get(creds, credsSection, "sender_email")
      val password = creds(credsSection).get("password").filter(_.nonEmpty)
      val startTls = creds(credsSection).get("starttls")
        .map(_.toBoolean).getOrElse(password.isDefined)
      recipients.foreach { r =>
        transport.send(host, port, sender, Seq(r), message,
          user = password.map(_ => sender), password = password,
          startTls = startTls)
      }
      recipients
    }
  }

  trait SmtpTransport {
    def send(host: String, port: Int, from: String, to: Seq[String],
             message: String, user: Option[String], password: Option[String],
             startTls: Boolean = false): Unit
  }

  /** Minimal RFC 5321 client. Plaintext by default (loopback/test relays);
    * `startTls = true` upgrades the socket before AUTH for real servers —
    * matching the reference's `starttls()` + `login()` + `sendmail()`.
    */
  object Smtp extends SmtpTransport {

    def send(host: String, port: Int, from: String, to: Seq[String],
             message: String, user: Option[String], password: Option[String],
             startTls: Boolean = false): Unit = {
      var socket: Socket = new Socket(host, port)
      try {
        var in = new BufferedReader(new InputStreamReader(
          socket.getInputStream, StandardCharsets.UTF_8))
        var out = new OutputStreamWriter(
          socket.getOutputStream, StandardCharsets.UTF_8)

        // multiline replies: "250-..." continues, "250 ..." terminates
        def expect(codes: Int*): Unit = {
          var line = in.readLine()
          require(line != null && line.length >= 3, s"connection closed by $host")
          while (line.length > 3 && line.charAt(3) == '-') {
            line = in.readLine()
            require(line != null && line.length >= 3,
              s"connection closed by $host mid-reply")
          }
          val code = line.substring(0, 3).toInt
          require(codes.contains(code), s"SMTP $host: expected $codes, got: $line")
        }
        def cmd(s: String, codes: Int*): Unit = {
          out.write(s + "\r\n"); out.flush(); expect(codes: _*)
        }

        expect(220)
        cmd("EHLO graft", 250)
        if (startTls) {
          cmd("STARTTLS", 220)
          val ctx = javax.net.ssl.SSLContext.getDefault
          val tls = ctx.getSocketFactory.createSocket(socket, host, port, true)
            .asInstanceOf[javax.net.ssl.SSLSocket]
          // Hostname verification: chain validation alone lets an active
          // MITM with ANY valid certificate read the AUTH credentials —
          // the cert must also MATCH `host` (same rule HTTPS uses).
          val params = tls.getSSLParameters
          params.setEndpointIdentificationAlgorithm("HTTPS")
          tls.setSSLParameters(params)
          tls.startHandshake()
          socket = tls
          in = new BufferedReader(new InputStreamReader(
            socket.getInputStream, StandardCharsets.UTF_8))
          out = new OutputStreamWriter(socket.getOutputStream, StandardCharsets.UTF_8)
          cmd("EHLO graft", 250) // fresh session after TLS
        }
        (user, password) match {
          case (Some(u), Some(p)) =>
            def b64(s: String) =
              Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))
            cmd("AUTH LOGIN", 334)
            cmd(b64(u), 334)
            cmd(b64(p), 235)
          case _ => ()
        }
        cmd(s"MAIL FROM:<$from>", 250)
        to.foreach(r => cmd(s"RCPT TO:<$r>", 250))
        cmd("DATA", 354)
        // normalize newlines and dot-stuff leading periods (RFC 5321 §4.5.2)
        val stuffed = message.replace("\r\n", "\n").split("\n", -1)
          .map(l => if (l.startsWith(".")) "." + l else l)
          .mkString("\r\n")
        out.write(stuffed + "\r\n.\r\n"); out.flush(); expect(250)
        cmd("QUIT", 221)
      } finally socket.close()
    }
  }
}
