package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: rewrite the whitespace token count
  *
  * {{{ size(split(text, ' ')) }}}
  *
  * into the array-free [[TokenCount]] byte scan. `split(text, ' ')`
  * materializes every token as a UTF8String plus an array per row;
  * when the only consumer is `size`, all of that allocation exists to
  * produce one integer — the single most common scalar in the corpus
  * operator bank (quality gates, curriculum, token budgets, shard
  * balance, fertility all start from it).
  *
  * Equivalence notes:
  *  - tokens = (number of 0x20 bytes) + 1 exactly, because split with
  *    limit −1 keeps trailing empty strings and the separator is the
  *    single-char non-metacharacter regex " " (a literal space);
  *    UTF-8 multi-byte sequences can never contain 0x20.
  *  - only the EXACT single-space separator rewrites — any other
  *    pattern may be a real regex;
  *  - only `legacySizeOfNull = false` rewrites (both forms are then
  *    null iff the input is null; the legacy −1-on-null contract
  *    would change results).
  */
object RewriteTokenCount extends Rule[LogicalPlan] {

  private val SpaceByte: Byte = 0x20

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Size(StringSplit(str, Literal(sep: UTF8String, StringType),
        Literal(-1, IntegerType)), false)
        if sep.numBytes() == 1 && sep.getByte(0) == SpaceByte =>
      TokenCount(str)
  }
}
