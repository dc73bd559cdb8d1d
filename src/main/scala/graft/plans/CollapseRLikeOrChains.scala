package graft.plans

import graft.functions.MultiMatch
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression, Literal, Not, Or, RLike}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: rewrite a disjunction of >= 4 `rlike` tests on the
  * SAME input into one [[graft.functions.MultiMatch]] pass —
  *
  *   `s rlike p1 OR s rlike p2 OR ... OR s rlike pN`
  *     ==>  `multi_match(s, p1..pN) != 0`
  *
  * One traversal of the pattern set with a shared compiled `Pattern[]`
  * instead of N independent RLike evaluations (the reference's
  * classifier shape — 10 error + 4 warning patterns — hits this
  * exactly). Null semantics are preserved: a null input yields null
  * through both forms. Only fires when every leaf is an RLike with a
  * literal pattern and all inputs are semantically equal, so arbitrary
  * user predicates are never disturbed.
  *
  * Registered by [[GraftExtensions]] via `injectOptimizerRule` — an
  * example of extending Catalyst where the declarative surface is kept
  * (users still write `rlike` chains) and the physical cost is fixed by
  * a rewrite, not by changing call sites.
  */
object CollapseRLikeOrChains extends Rule[LogicalPlan] {

  private val minPatterns = 4
  private val maxPatterns = 63 // MultiMatch bitmask width

  /** Collect `(input, patterns)` iff the whole Or-tree is rlikes of one
    * input with literal patterns (left-to-right order preserved).
    */
  private def collect(e: Expression): Option[(Expression, Seq[String])] = e match {
    case Or(l, r) =>
      for {
        (cl, pl) <- collect(l)
        (cr, pr) <- collect(r)
        if cl.semanticEquals(cr)
      } yield (cl, pl ++ pr)
    case RLike(child, Literal(p: UTF8String, StringType)) =>
      Some((child, Seq(p.toString)))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case or @ Or(_, _) =>
        collect(or) match {
          case Some((child, pats))
              if pats.size >= minPatterns && pats.size <= maxPatterns =>
            Not(EqualTo(MultiMatch(child, pats), Literal(0L)))
          case _ => or
        }
    }
}
