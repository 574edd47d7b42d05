package graft.pipeline

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.Base64

import graft.pipeline.ZoomRunner.{JobReport, Notifier}

/** SMTP success/error notification — the reference's mail transport
  * (/root/reference/mailer.py) re-expressed with the transport pluggable
  * and the message build pure.
  *
  * The reference opens `smtplib.SMTP_SSL("smtp.gmail.com", 465)`, logs in
  * with env-var credentials, and sends a multipart message: subject
  * `"<job> - Success|Error"`, a plain-text body, and `data/app.log`
  * attached when present (mailer.py:23-62). Here:
  *
  *  - [[SmtpNotifier]] renders that exact message shape from a
  *    [[ZoomRunner.JobReport]] and hands the RFC 5322 bytes to an
  *    [[SmtpTransport]] — message semantics are spec-testable without a
  *    network (recording transport), and `notify` never throws (the
  *    [[ZoomRunner.Notifier]] contract: a dead mail server must not fail
  *    an otherwise-green pipeline run — the reference gets this wrong by
  *    crashing in `notify`, see main.py:352-360 running it bare);
  *  - [[SocketSmtpTransport]] is a minimal RFC 5321 client over
  *    `java.net.Socket` / JDK TLS (EHLO, optional AUTH LOGIN, MAIL FROM,
  *    RCPT TO, DATA with dot-stuffing, QUIT) — plain JDK, no added
  *    dependencies, exercised in-process against a loopback fake server.
  */
object Mailer {

  /** Wire-level seam: deliver one already-rendered message. */
  trait SmtpTransport {
    def sendMail(from: String, to: Seq[String], message: String): Unit
  }

  /** RFC 5322 multipart message mirroring mailer.py:42-54: plain-text
    * body part, then the log attachment when `logFile` exists (including
    * the reference's `filename= ` space quirk, mailer.py:42).
    * Deterministic: fixed boundary, CRLF line endings, UTF-8.
    */
  def renderMessage(report: JobReport, from: String, to: Seq[String],
                    logFile: Option[Path]): String = {
    val b = "----=_graft_boundary"
    val sb = new StringBuilder
    def line(s: String): Unit = sb.append(s).append("\r\n")
    line(s"From: $from")
    line(s"To: ${to.mkString(", ")}")
    line(s"Subject: ${report.subjectLine}")
    line("MIME-Version: 1.0")
    line(s"""Content-Type: multipart/mixed; boundary="$b"""")
    line("")
    line(s"--$b")
    line("Content-Type: text/plain; charset=utf-8")
    line("")
    report.bodyText.split("\n", -1).foreach(line)
    logFile.filter(Files.exists(_)).foreach { p =>
      line(s"--$b")
      line("Content-Type: text/plain; charset=utf-8")
      line(s"Content-Disposition: attachment; filename= $p")
      line("")
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        .split("\n", -1).foreach(line)
    }
    line(s"--$b--")
    sb.result()
  }

  /** The mailer.py notify() analog: render + send, swallow-and-log
    * transport failures.
    */
  class SmtpNotifier(transport: SmtpTransport, from: String, to: Seq[String],
                     logFile: Option[Path] = None) extends Notifier {
    override def notify(report: JobReport): Unit =
      try transport.sendMail(from, to, renderMessage(report, from, to, logFile))
      catch {
        case e: Exception =>
          org.apache.log4j.Logger.getLogger(getClass)
            .error(s"notification send failed: ${e.getMessage}")
      }
  }

  /** Minimal synchronous SMTP client (RFC 5321). `useTls` wraps the
    * socket with the JDK's default SSLSocketFactory — the SMTPS :465 mode
    * the reference uses; STARTTLS upgrade is intentionally out of scope
    * (deployments terminating TLS elsewhere use `useTls = false`).
    * `credentials` triggers AUTH LOGIN (base64 user/pass exchange).
    */
  class SocketSmtpTransport(host: String, port: Int,
                            credentials: Option[(String, String)] = None,
                            useTls: Boolean = false,
                            timeoutMs: Int = 10000) extends SmtpTransport {
    override def sendMail(from: String, to: Seq[String], message: String): Unit = {
      require(to.nonEmpty, "at least one recipient")
      val socket =
        if (useTls)
          javax.net.ssl.SSLSocketFactory.getDefault.createSocket(host, port)
        else new Socket(host, port)
      socket.setSoTimeout(timeoutMs)
      try {
        val in = new BufferedReader(
          new InputStreamReader(socket.getInputStream, StandardCharsets.UTF_8))
        val out = new OutputStreamWriter(socket.getOutputStream, StandardCharsets.UTF_8)
        def expect(codes: Int*): Unit = {
          // multi-line replies: "250-..." continues, "250 ..." ends
          var line = in.readLine()
          while (line != null && line.length >= 4 && line.charAt(3) == '-')
            line = in.readLine()
          val code = Option(line).filter(_.length >= 3)
            .map(_.substring(0, 3).toInt)
            .getOrElse(throw new java.io.IOException("connection closed by server"))
          if (!codes.contains(code))
            throw new java.io.IOException(s"unexpected SMTP reply: $line")
        }
        def send(cmd: String, okCodes: Int*): Unit = {
          out.write(cmd + "\r\n"); out.flush(); expect(okCodes: _*)
        }
        expect(220)
        send("EHLO graft", 250)
        credentials.foreach { case (user, pass) =>
          val b64 = (s: String) =>
            Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))
          send("AUTH LOGIN", 334)
          send(b64(user), 334)
          send(b64(pass), 235)
        }
        send(s"MAIL FROM:<$from>", 250)
        to.foreach(rcpt => send(s"RCPT TO:<$rcpt>", 250, 251))
        send("DATA", 354)
        // dot-stuffing (RFC 5321 §4.5.2): leading '.' doubled so a body
        // line can never terminate DATA early
        message.split("\r\n", -1).foreach { l =>
          out.write((if (l.startsWith(".")) "." + l else l) + "\r\n")
        }
        send(".", 250)
        send("QUIT", 221)
      } finally socket.close()
    }
  }
}
