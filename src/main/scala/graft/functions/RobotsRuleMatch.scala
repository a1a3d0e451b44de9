package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** REP (robots.txt) rule-path matching as a native expression with a
  * LINEAR-TIME wildcard matcher: `*` spans any character run, a trailing
  * `$` anchors at the path end, everything else is literal, and the rule
  * matches as a PREFIX when unanchored. A regex translation is the
  * obvious implementation and a denial-of-service bug: both the rule (a
  * crawled site's robots.txt) and the path are attacker-controlled, and
  * java.util.regex backtracks exponentially on star-heavy rules (a
  * 24-star rule hung a thread for 25+ s in measurement). The two-pointer
  * glob walk below is O(|path|·|rule|) worst case with zero allocation —
  * the same reason Google's reference parser ships a hand-rolled
  * matcher. */
case class RobotsRuleMatch(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!left.dataType.isInstanceOf[StringType] ||
        !right.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (path: string, rule: string), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def prettyName: String = "robots_rule_match"

  override protected def nullSafeEval(path: Any, rule: Any): Any =
    RobotsMatcher.matches(path.asInstanceOf[UTF8String],
      rule.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, r) =>
      s"${ev.value} = graft.functions.RobotsMatcher.matches($p, $r);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsRuleMatch =
    copy(left = newLeft, right = newRight)
}

/** The runtime behind [[RobotsRuleMatch]] — a top-level object so codegen
  * calls it through the static-forwarder mirror class. */
object RobotsMatcher {

  def matches(path: UTF8String, rule: UTF8String): Boolean = {
    val s = path.toString
    val r0 = rule.toString
    val anchored = r0.nonEmpty && r0.charAt(r0.length - 1) == '$'
    val core = if (anchored) r0.substring(0, r0.length - 1) else r0
    // unanchored REP rules are prefixes: prefix-match(core) ≡
    // full-match(core + "*") — one matcher serves both forms
    glob(if (anchored) core else core + "*", s)
  }

  /** Iterative glob full-match (`*` = any run, everything else literal):
    * the classic two-pointer walk with single-level star backtracking —
    * O(|s|·|p|) worst case, no recursion, no allocation, no exponential
    * blowup whatever the inputs. */
  private[functions] def glob(p: String, s: String): Boolean = {
    var i = 0 // position in s
    var j = 0 // position in p
    var star = -1 // index of the most recent '*' in p
    var mark = 0 // s-position where that star's span currently ends
    while (i < s.length) {
      if (j < p.length && p.charAt(j) == '*') { star = j; mark = i; j += 1 }
      else if (j < p.length && p.charAt(j) == s.charAt(i)) { i += 1; j += 1 }
      else if (star >= 0) { mark += 1; i = mark; j = star + 1 }
      else return false
    }
    while (j < p.length && p.charAt(j) == '*') j += 1
    j == p.length
  }
}
