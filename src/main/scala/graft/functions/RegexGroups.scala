package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ALL capture groups of one regex in ONE pass: `find()` the pattern
  * (the `rlike`/`regexp_extract` substring semantics) and return the
  * group values as `array<string>`, or null when the pattern does not
  * match.
  *
  * Why custom (SURVEY.md §2.9): projecting an n-group parse with n
  * `regexp_extract` calls executes the regex n times per line (plus
  * once more for the match filter) — the log-parse projection (P1, the
  * reference's core operation) pays 7 regex runs per line. This runs
  * it once; whole-stage codegen's subexpression elimination shares the
  * single array across the per-field `element_at` projections.
  *
  * For matched lines `element_at(groups, i)` equals
  * `regexp_extract(line, pattern, i)` (pinned by spec); a group that
  * participated in no alternative is null (regexp_extract would give
  * "", a shape our anchored parse pattern never produces).
  */
case class RegexGroups(child: Expression, pattern: String)
    extends UnaryExpression {

  @transient private lazy val compiled = java.util.regex.Pattern.compile(pattern)

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "regex_groups"

  override def nullSafeEval(input: Any): Any =
    RegexGroups.groups(compiled, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the compiled Pattern rides along as a reference object — compiled
    // once per task, like the built-in RLike
    val patternRef = ctx.addReferenceObj("graftRegexPattern", compiled,
      classOf[java.util.regex.Pattern].getName)
    nullSafeCodeGen(ctx, ev, input =>
      s"""
         |${ev.value} = graft.functions.RegexGroups.groups($patternRef, $input);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): RegexGroups =
    copy(child = newChild)
}

object RegexGroups {

  /** Shared by interpreted eval and generated code; null when no match. */
  def groups(p: java.util.regex.Pattern, s: UTF8String): GenericArrayData = {
    val m = p.matcher(s.toString)
    if (!m.find()) return null
    val n = m.groupCount()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val g = m.group(i + 1)
      out(i) = if (g == null) null else UTF8String.fromString(g)
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, pattern: String): Column =
    ColumnBridge.column(RegexGroups(ColumnBridge.expression(c), pattern))
}
