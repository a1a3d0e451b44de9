package graft.core

/** A user's role (reference core/user.py UserRole): required approvers gate
  * production deploys in the CICD bot. */
sealed trait UserRole
object UserRole {
  case object RequiredApprover extends UserRole
}

/** User registry entry for notification routing and approvals (reference
  * core/user.py User): per-user notification targets let lifecycle events be
  * routed to the person who owns the failing model rather than (only) the
  * global channel — `model.owner` is matched against `username`.
  *
  * The reference validates that an SMTP target's recipients equal the user's
  * email; same rule here, enforced at construction. */
final case class User(
    username: String,
    email: Option[String] = None,
    slackUsername: Option[String] = None,
    githubUsername: Option[String] = None,
    roles: Seq[UserRole] = Nil,
    notificationTargets: Seq[NotificationTarget] = Nil) {
  require(username.nonEmpty, "username must be non-empty")
  def isRequiredApprover: Boolean = roles.contains(UserRole.RequiredApprover)
}
