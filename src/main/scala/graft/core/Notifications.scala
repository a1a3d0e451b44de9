package graft.core

import com.fasterxml.jackson.databind.ObjectMapper

/** The two notification targets users actually configure (reference
  * core/notification_target.py — `SlackWebhookNotificationTarget` :295,
  * `BasicSMTPNotificationTarget` :363): payload construction is pure and
  * fully unit-testable; the wire transport is an injectable function so a
  * test (or an offline deployment) swaps it without touching payload logic.
  */
object Notifications {

  /** Event severity → reference NotificationStatus values. */
  final val Progress = "progress"
  final val Success = "success"
  final val Failure = "failure"
  final val Warning = "warning"

  private val mapper = new ObjectMapper()

  private def emoji(status: String): String = status match {
    case Success => "✅"            // check mark
    case Failure => "❌"            // cross mark
    case Warning => "⚠️"      // warning sign
    case _       => "⏳"            // hourglass (progress)
  }

  /** Slack Block Kit payload (reference BaseSlackNotificationTarget.send
    * :237-285: header, status context, divider, message section, optional
    * preformatted detail, trailing divider + version context). Returns the
    * exact JSON body a webhook POST carries. */
  def slackPayload(status: String, msg: String, detail: Option[String] = None,
                   fields: Seq[(String, String)] = Nil): String = {
    val root = mapper.createObjectNode()
    root.put("text", msg)
    val blocks = root.putArray("blocks")

    val header = blocks.addObject()
    header.put("type", "header")
    val ht = header.putObject("text")
    ht.put("type", "plain_text"); ht.put("text", s"${emoji(status)} Graft Notification")
    ht.put("emoji", true)

    val ctx = blocks.addObject()
    ctx.put("type", "context")
    val ce = ctx.putArray("elements").addObject()
    ce.put("type", "mrkdwn"); ce.put("text", s"*Status:* `$status`")

    blocks.addObject().put("type", "divider")

    val section = blocks.addObject()
    section.put("type", "section")
    val st = section.putObject("text")
    st.put("type", "mrkdwn"); st.put("text", s"*Message*: $msg")

    if (fields.nonEmpty) {
      val fs = blocks.addObject()
      fs.put("type", "section")
      val fa = fs.putArray("fields")
      fields.foreach { case (k, v) =>
        val f = fa.addObject()
        f.put("type", "mrkdwn"); f.put("text", s"*$k*: `$v`")
      }
    }
    detail.foreach { d =>
      val pre = blocks.addObject()
      pre.put("type", "section")
      val pt = pre.putObject("text")
      pt.put("type", "mrkdwn"); pt.put("text", s"```$d```")
    }

    blocks.addObject().put("type", "divider")
    mapper.writeValueAsString(root)
  }

  /** RFC-5322 message text (reference BasicSMTPNotificationTarget
    * .send_text_message :371-389: Subject/To/From headers + text content). */
  def mimeMessage(sender: String, recipients: Seq[String], subject: String,
                  body: String): String = {
    val b = new StringBuilder
    b.append(s"From: $sender\r\n")
    b.append(s"To: ${recipients.mkString(",")}\r\n")
    b.append(s"Subject: $subject\r\n")
    b.append("MIME-Version: 1.0\r\n")
    b.append("Content-Type: text/plain; charset=utf-8\r\n")
    b.append("Content-Transfer-Encoding: 8bit\r\n")
    b.append("\r\n")
    b.append(body)
    b.append("\r\n")
    b.toString
  }

  /** Default webhook transport: JDK HttpClient POST (no extra deps). */
  def httpPost(url: String, jsonBody: String): Unit = {
    val client = java.net.http.HttpClient.newHttpClient()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(jsonBody))
      .build()
    client.send(req, java.net.http.HttpResponse.BodyHandlers.discarding())
    ()
  }
}

/** Slack webhook target: every lifecycle event composes a Block Kit payload
  * and hands it to `transport(url, json)` (reference
  * SlackWebhookNotificationTarget :295). */
final class SlackWebhookNotificationTarget(
    url: String,
    transport: (String, String) => Unit = Notifications.httpPost)
  extends NotificationTarget {
  import Notifications._

  private def send(status: String, msg: String, detail: Option[String] = None,
                   fields: Seq[(String, String)] = Nil): Unit =
    transport(url, slackPayload(status, msg, detail, fields))

  override def notifyApplyStart(env: String, planId: String): Unit =
    send(Progress, s"Plan apply started for environment `$env` (plan $planId).")
  override def notifyApplyEnd(env: String, planId: String): Unit =
    send(Success, s"Plan apply finished for environment `$env` (plan $planId).")
  override def notifyApplyFailure(env: String, planId: String, error: Throwable): Unit =
    send(Failure, s"Plan apply failed for environment `$env` (plan $planId).",
      detail = Option(error.getMessage))
  override def notifyRunStart(env: String): Unit =
    send(Progress, s"Run started for environment `$env`.")
  override def notifyRunEnd(env: String): Unit =
    send(Success, s"Run finished for environment `$env`.")
  override def notifyRunFailure(env: String, error: Throwable): Unit =
    send(Failure, s"Run failed for environment `$env`.",
      detail = Option(error.getMessage))
  override def notifyAuditFailure(model: String, audit: String, message: String,
                                  blocking: Boolean): Unit =
    send(if (blocking) Failure else Warning, s"Audit failure.",
      detail = Some(message),
      fields = Seq("Audit" -> audit, "Model" -> model))
}

/** SMTP target: events become RFC-5322 messages handed to
  * `transport(host, port, mime)` (reference BasicSMTPNotificationTarget
  * :363; the reference only mails FAILURE/WARNING-worthy text, and so does
  * this target — start/success events are no-ops by default, matching
  * `notify_user` semantics where email is the escalation channel). */
final class SmtpNotificationTarget(
    host: String,
    port: Int = 465,
    sender: String,
    recipients: Seq[String],
    subject: String = "Graft Notification",
    notifyOnSuccess: Boolean = false,
    transport: (String, Int, String) => Unit) extends NotificationTarget {
  import Notifications._

  private def send(body: String): Unit =
    transport(host, port, mimeMessage(sender, recipients, subject, body))

  override def notifyApplyEnd(env: String, planId: String): Unit =
    if (notifyOnSuccess) send(s"Plan apply finished for environment '$env' (plan $planId).")
  override def notifyApplyFailure(env: String, planId: String, error: Throwable): Unit =
    send(s"Plan apply failed for environment '$env' (plan $planId):\n${Option(error.getMessage).getOrElse(error.toString)}")
  override def notifyRunEnd(env: String): Unit =
    if (notifyOnSuccess) send(s"Run finished for environment '$env'.")
  override def notifyRunFailure(env: String, error: Throwable): Unit =
    send(s"Run failed for environment '$env':\n${Option(error.getMessage).getOrElse(error.toString)}")
  override def notifyAuditFailure(model: String, audit: String, message: String,
                                  blocking: Boolean): Unit =
    send(s"Audit '$audit' failed for model '$model' (${if (blocking) "blocking" else "non-blocking"}):\n$message")
}
