package graft.core

/** Notification hook surface (reference core/notification_target.py:
  * NotificationEvent :57, BaseNotificationTarget :70 — `notify_` methods per
  * event, each target opting into the events it cares about). Override the
  * events of interest; every method defaults to a no-op so a target is a
  * one-liner. Targets must not throw — a failing notifier must never fail
  * the plan/run it is reporting on, so the dispatcher swallows and logs. */
trait NotificationTarget {
  def notifyApplyStart(env: String, planId: String): Unit = ()
  def notifyApplyEnd(env: String, planId: String): Unit = ()
  def notifyApplyFailure(env: String, planId: String, error: Throwable): Unit = ()
  def notifyRunStart(env: String): Unit = ()
  def notifyRunEnd(env: String): Unit = ()
  def notifyRunFailure(env: String, error: Throwable): Unit = ()
  def notifyAuditFailure(model: String, audit: String, message: String,
                         blocking: Boolean): Unit = ()
}

/** The reference's BasicSMTPNotificationTarget / console analog: every event
  * as a line on stderr — the default observable target and the template for
  * user-defined ones (a Slack/webhook target overrides the same methods). */
final class ConsoleNotificationTarget extends NotificationTarget {
  private def log(status: String, msg: String): Unit =
    System.err.println(s"[graft][$status] $msg")
  override def notifyApplyStart(env: String, planId: String): Unit =
    log("INFO", s"plan apply started: env '$env' plan $planId")
  override def notifyApplyEnd(env: String, planId: String): Unit =
    log("SUCCESS", s"plan apply finished: env '$env' plan $planId")
  override def notifyApplyFailure(env: String, planId: String, error: Throwable): Unit =
    log("FAILURE", s"plan apply failed: env '$env' plan $planId: ${error.getMessage}")
  override def notifyRunStart(env: String): Unit =
    log("INFO", s"run started: env '$env'")
  override def notifyRunEnd(env: String): Unit =
    log("SUCCESS", s"run finished: env '$env'")
  override def notifyRunFailure(env: String, error: Throwable): Unit =
    log("FAILURE", s"run failed: env '$env': ${error.getMessage}")
  override def notifyAuditFailure(model: String, audit: String, message: String,
                                  blocking: Boolean): Unit =
    log(if (blocking) "FAILURE" else "WARNING", s"audit $audit failed for $model: $message")
}

/** Fan-out dispatcher: never lets one target's exception break another
  * target or the caller. */
private[graft] final class NotificationDispatcher(
    targets: () => Seq[NotificationTarget]) extends NotificationTarget {
  private def each(f: NotificationTarget => Unit): Unit = targets().foreach { t =>
    try f(t)
    catch { case e: Exception =>
      System.err.println(s"[graft] WARN notification target ${t.getClass.getSimpleName} threw: ${e.getMessage}")
    }
  }
  override def notifyApplyStart(env: String, planId: String): Unit =
    each(_.notifyApplyStart(env, planId))
  override def notifyApplyEnd(env: String, planId: String): Unit =
    each(_.notifyApplyEnd(env, planId))
  override def notifyApplyFailure(env: String, planId: String, error: Throwable): Unit =
    each(_.notifyApplyFailure(env, planId, error))
  override def notifyRunStart(env: String): Unit = each(_.notifyRunStart(env))
  override def notifyRunEnd(env: String): Unit = each(_.notifyRunEnd(env))
  override def notifyRunFailure(env: String, error: Throwable): Unit =
    each(_.notifyRunFailure(env, error))
  override def notifyAuditFailure(model: String, audit: String, message: String,
                                  blocking: Boolean): Unit =
    each(_.notifyAuditFailure(model, audit, message, blocking))
}
