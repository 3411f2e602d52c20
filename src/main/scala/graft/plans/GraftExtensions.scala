package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, If, IsNaN, IsNull, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.ops.{ArrayDotProduct, Clamp}

/** Optimizer rule: a Clamp whose constant bounds are degenerate
  * (lo >= hi) always evaluates to hi for finite input — rewrite it away.
  * (Catalyst's ConstantFolding handles the all-literal case; this handles
  * non-literal `x`, which ConstantFolding cannot.) Semantics preserved for
  * the full input domain: null → null and NaN → NaN (Math.min/max
  * propagate NaN, so the original expression does too).
  */
object SimplifyDegenerateClamp extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Clamp(x, Literal(lo: Double, DoubleType), Literal(hi: Double, DoubleType))
        if lo >= hi =>
      val folded = If(IsNaN(x), x, Literal(hi, DoubleType))
      if (x.nullable) If(IsNull(x), Literal(null, DoubleType), folded) else folded
  }
}

/** Session-extension installer (SparkSessionExtensions — the engine's
  * plug-in surface, SURVEY §4.2): registers the graft_clamp function for
  * every session built with these extensions (`.withExtensions(new
  * GraftExtensions)` or `spark.sql.extensions=graft.plans.GraftExtensions`)
  * and injects the degenerate-clamp optimizer rule. This is the packaged
  * form of what graft.ops.Custom does per-session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_clamp"),
      new ExpressionInfo(classOf[Clamp].getName, "graft_clamp"),
      (args: Seq[Expression]) => Clamp(args(0), args(1), args(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => ArrayDotProduct(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[graft.functions.UnicodeNormalize].getName, "graft_nfc"),
      (args: Seq[Expression]) => graft.functions.UnicodeNormalize(args(0), "NFC")))
    ext.injectFunction((
      FunctionIdentifier("graft_nfkc"),
      new ExpressionInfo(classOf[graft.functions.UnicodeNormalize].getName, "graft_nfkc"),
      (args: Seq[Expression]) => graft.functions.UnicodeNormalize(args(0), "NFKC")))
    ext.injectFunction((
      FunctionIdentifier("graft_bpe"),
      new ExpressionInfo(classOf[graft.functions.BpeEncode].getName, "graft_bpe"),
      (args: Seq[Expression]) => graft.functions.BpeEncode(args(0), args(1))))
    ext.injectOptimizerRule(_ => SimplifyDegenerateClamp)
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    // catalog CTAS → Snapshot.publish through the staged-commit protocol
    // (see GraftCtasRule) — a resolution rule, so the V2 write path that
    // would bypass the format's atomicity never engages
    ext.injectResolutionRule(_ => GraftCtasRule)
    // mapped-read view expansion: snapshot states raw parquet cannot
    // express (rename/drop mapping, generated-column fill) serve the
    // logical read's plan — see GraftMappedReadRule
    ext.injectResolutionRule(_ => GraftMappedReadRule)
    // the PARSER extension point: one added statement (GRAFT SNAPSHOT
    // HISTORY), everything else delegated verbatim — see GraftSqlParser
    ext.injectParser((session, delegate) =>
      new GraftSqlParser(session, delegate))
  }
}
