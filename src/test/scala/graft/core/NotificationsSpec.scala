package graft.core

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** Slack / SMTP notification targets: exact payloads per event kind,
  * construct-and-assert with captured transports (no network), and fan-out
  * through the dispatcher. */
class NotificationsSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  private def slackCapture(): (collection.mutable.Buffer[(String, String)], SlackWebhookNotificationTarget) = {
    val sent = collection.mutable.Buffer[(String, String)]()
    (sent, new SlackWebhookNotificationTarget("https://hooks.example/T/B/x",
      (url, body) => sent += (url -> body)))
  }

  test("slack: plan-apply failure payload has header/status/message/detail blocks") {
    val (sent, t) = slackCapture()
    t.notifyApplyFailure("prod", "plan_42", new RuntimeException("boom: table missing"))
    assert(sent.size == 1 && sent.head._1 == "https://hooks.example/T/B/x")
    val root = mapper.readTree(sent.head._2)
    assert(root.get("text").asText ==
      "Plan apply failed for environment `prod` (plan plan_42).")
    val blocks = root.get("blocks")
    val types = (0 until blocks.size).map(blocks.get(_).get("type").asText)
    assert(types == Seq("header", "context", "divider", "section", "section", "divider"))
    assert(blocks.get(0).get("text").get("text").asText.endsWith("Graft Notification"))
    assert(blocks.get(1).get("elements").get(0).get("text").asText == "*Status:* `failure`")
    assert(blocks.get(3).get("text").get("text").asText ==
      "*Message*: Plan apply failed for environment `prod` (plan plan_42).")
    assert(blocks.get(4).get("text").get("text").asText == "```boom: table missing```")
  }

  test("slack: audit failure carries audit/model fields; blocking drives status") {
    val (sent, t) = slackCapture()
    t.notifyAuditFailure("mart.orders", "not_null", "3 null rows in o_id", blocking = true)
    t.notifyAuditFailure("mart.orders", "unique_values", "dup keys", blocking = false)
    val blocking = mapper.readTree(sent(0)._2)
    val warning = mapper.readTree(sent(1)._2)
    assert(blocking.get("blocks").get(1).get("elements").get(0).get("text").asText
      == "*Status:* `failure`")
    assert(warning.get("blocks").get(1).get("elements").get(0).get("text").asText
      == "*Status:* `warning`")
    val fields = blocking.get("blocks").get(4).get("fields")
    assert(fields.get(0).get("text").asText == "*Audit*: `not_null`")
    assert(fields.get(1).get("text").asText == "*Model*: `mart.orders`")
    // detail block follows the fields section
    assert(blocking.get("blocks").get(5).get("text").get("text").asText
      == "```3 null rows in o_id```")
  }

  test("slack: success/progress events emit well-formed JSON with right status") {
    val (sent, t) = slackCapture()
    t.notifyApplyStart("dev", "p1"); t.notifyApplyEnd("dev", "p1")
    t.notifyRunStart("dev"); t.notifyRunEnd("dev")
    val statuses = sent.map(s => mapper.readTree(s._2)
      .get("blocks").get(1).get("elements").get(0).get("text").asText)
    assert(statuses.toSeq == Seq("*Status:* `progress`", "*Status:* `success`",
      "*Status:* `progress`", "*Status:* `success`"))
  }

  test("smtp: run failure becomes an RFC-5322 message; success is opt-in") {
    val sent = collection.mutable.Buffer[(String, Int, String)]()
    val t = new SmtpNotificationTarget("mail.example", 465, "graft@example.com",
      Seq("oncall@example.com", "team@example.com"),
      transport = (h, p, m) => sent += ((h, p, m)))
    t.notifyRunFailure("prod", new RuntimeException("executor lost"))
    t.notifyRunEnd("prod") // success: not mailed by default
    assert(sent.size == 1)
    val (host, port, mime) = sent.head
    assert(host == "mail.example" && port == 465)
    val lines = mime.split("\r\n")
    assert(lines(0) == "From: graft@example.com")
    assert(lines(1) == "To: oncall@example.com,team@example.com")
    assert(lines(2) == "Subject: Graft Notification")
    assert(mime.contains("\r\n\r\nRun failed for environment 'prod':\nexecutor lost\r\n"))
  }

  test("smtp: audit failure message states model, audit, and blocking-ness") {
    val sent = collection.mutable.Buffer[String]()
    val t = new SmtpNotificationTarget("mail.example", 25, "a@b.c", Seq("x@y.z"),
      transport = (_, _, m) => sent += m)
    t.notifyAuditFailure("mart.m", "accepted_values", "2 rows outside", blocking = false)
    assert(sent.head.contains(
      "Audit 'accepted_values' failed for model 'mart.m' (non-blocking):\n2 rows outside"))
  }

  test("dispatcher fans out to slack+smtp and survives a throwing target") {
    val slackSent = collection.mutable.Buffer[(String, String)]()
    val mailSent = collection.mutable.Buffer[String]()
    val bad = new NotificationTarget {
      override def notifyRunFailure(env: String, error: Throwable): Unit =
        throw new IllegalStateException("target down")
    }
    val d = new NotificationDispatcher(() => Seq(
      bad,
      new SlackWebhookNotificationTarget("u", (u, b) => slackSent += (u -> b)),
      new SmtpNotificationTarget("h", 25, "s@e", Seq("r@e"),
        transport = (_, _, m) => mailSent += m)))
    d.notifyRunFailure("prod", new RuntimeException("x"))
    assert(slackSent.size == 1 && mailSent.size == 1)
  }

  test("audit failure on an owned model routes to the owner's own targets") {
    // reference scheduler.py:924-926: AUDIT_FAILURE is additionally routed
    // to the failing model's `owner` via their per-user targets
    // (core/user.py + NotificationTargetManager.notify_user)
    val spark = graft.SparkTestSession.spark
    val ctx = new graft.GraftContext(spark,
      graft.SparkTestSession.tmpDir("notif-owner"), concurrency = 2)
    ctx.addExternal("raw.orders", "/root/testdata/sf0.001/orders.parquet")
    val danaSeen = collection.mutable.Buffer[(String, String, Boolean)]()
    val ravSeen = collection.mutable.Buffer[(String, String, Boolean)]()
    def capture(buf: collection.mutable.Buffer[(String, String, Boolean)]) =
      new NotificationTarget {
        override def notifyAuditFailure(model: String, audit: String,
                                        message: String, blocking: Boolean): Unit =
          buf += ((model, audit, blocking))
      }
    ctx.addUser(User("dana", email = Some("dana@example.com"),
      notificationTargets = Seq(capture(danaSeen))))
    ctx.addUser(User("rav", roles = Seq(UserRole.RequiredApprover),
      notificationTargets = Seq(capture(ravSeen))))
    // global channel target still sees everything
    val globalSeen = collection.mutable.Buffer[(String, String, Boolean)]()
    ctx.addNotificationTarget(capture(globalSeen))
    ctx.addModel(Model(
      name = "mart.owned",
      body = SqlBody("SELECT o_orderkey, o_totalprice FROM raw.orders"),
      kind = ModelKind.Full,
      owner = Some("dana"),
      audits = Seq("accepted_range_non_blocking" ->
        Map("column" -> "o_totalprice", "max_v" -> "0"))))
    ctx.apply(ctx.plan("prod", 0L, 86400000L))
    assert(danaSeen.toSeq == Seq(("mart.owned", "accepted_range", false)))
    assert(ravSeen.isEmpty)           // not the owner: nothing routed
    assert(globalSeen.nonEmpty)       // global channel unaffected
    assert(ctx.requiredApprovers.map(_.username) == Seq("rav"))
  }
}
