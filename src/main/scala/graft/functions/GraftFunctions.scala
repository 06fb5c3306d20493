package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration for graft's native Catalyst expressions.
  *
  * Two routes to the same registry entries:
  *  - config route: `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (the standard `SparkSessionExtensions` injection point);
  *  - runtime route: `GraftFunctions.ensureRegistered(spark)` for
  *    sessions built without the config (tests, tools) — idempotent,
  *    so hot paths may call it unconditionally.
  *
  * After either, `call_function("graft_dot", a, b)` (or SQL
  * `graft_dot(a, b)`) resolves to the codegen'd expression.
  */
object GraftFunctions {

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("graft_dot"),
        new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
        (children: Seq[Expression]) => {
          require(children.size == 2, "graft_dot takes exactly 2 arguments")
          DotProduct(children(0), children(1))
        }),
      (FunctionIdentifier("graft_pq_encode"),
        new ExpressionInfo(classOf[PqEncode].getName, "graft_pq_encode"),
        (children: Seq[Expression]) => {
          require(children.size == 2, "graft_pq_encode takes exactly 2 arguments")
          PqEncode(children(0), children(1))
        }),
      (FunctionIdentifier("graft_minhash_sig"),
        new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash_sig"),
        (children: Seq[Expression]) => {
          require(children.size == 3, "graft_minhash_sig takes exactly 3 arguments")
          MinHashSig(children(0), children(1), children(2))
        }),
      (FunctionIdentifier("graft_simhash64"),
        new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
        (children: Seq[Expression]) => {
          require(children.size == 1, "graft_simhash64 takes exactly 1 argument")
          SimHash64(children(0))
        }),
      (FunctionIdentifier("graft_shingle3_hash"),
        new ExpressionInfo(classOf[Shingle3Hash].getName, "graft_shingle3_hash"),
        (children: Seq[Expression]) => {
          require(children.size == 1, "graft_shingle3_hash takes exactly 1 argument")
          Shingle3Hash(children(0))
        }),
      (FunctionIdentifier("graft_ngram_hash"),
        new ExpressionInfo(classOf[NgramHash].getName, "graft_ngram_hash"),
        (children: Seq[Expression]) => {
          require(children.size == 2, "graft_ngram_hash takes exactly 2 arguments")
          NgramHash(children(0), children(1))
        }),
      (FunctionIdentifier("graft_winnow_sel"),
        new ExpressionInfo(classOf[WinnowSelect].getName, "graft_winnow_sel"),
        (children: Seq[Expression]) => {
          require(children.size == 3, "graft_winnow_sel takes exactly 3 arguments")
          WinnowSelect(children(0), children(1), children(2))
        }),
      (FunctionIdentifier("graft_vec_div"),
        new ExpressionInfo(classOf[VecDiv].getName, "graft_vec_div"),
        (children: Seq[Expression]) => {
          require(children.size == 2, "graft_vec_div takes exactly 2 arguments")
          VecDiv(children(0), children(1))
        }),
      (FunctionIdentifier("graft_char_ngrams"),
        new ExpressionInfo(classOf[CharNgrams].getName, "graft_char_ngrams"),
        (children: Seq[Expression]) => {
          require(children.size == 2, "graft_char_ngrams takes exactly 2 arguments")
          CharNgrams(children(0), children(1))
        }),
      (FunctionIdentifier("graft_count_in"),
        new ExpressionInfo(classOf[CountIn].getName, "graft_count_in"),
        (children: Seq[Expression]) => {
          require(children.size == 2, "graft_count_in takes exactly 2 arguments")
          CountIn(children(0), children(1))
        }),
      (FunctionIdentifier("graft_vec_sum"),
        new ExpressionInfo(classOf[VecSumAgg].getName, "graft_vec_sum"),
        (children: Seq[Expression]) => {
          require(children.size == 1, "graft_vec_sum takes exactly 1 argument")
          VecSumAgg(children(0))
        }),
      (FunctionIdentifier("graft_bloom_agg"),
        new ExpressionInfo(classOf[BloomAgg].getName, "graft_bloom_agg"),
        (children: Seq[Expression]) => {
          require(children.size == 4, "graft_bloom_agg takes exactly 4 arguments")
          BloomAgg(children(0), children(1), children(2), children(3))
        }),
      // not a user-facing function: the ASOF JOIN marker the parser
      // wraps around the ON condition (see GraftSqlParser /
      // AsofJoinRewriteRule)
      (FunctionIdentifier("graft_asof_marker"),
        new ExpressionInfo(classOf[graft.plans.GraftAsofCond].getName,
          "graft_asof_marker"),
        (children: Seq[Expression]) => {
          require(children.size == 1, "graft_asof_marker takes exactly 1 argument")
          graft.plans.GraftAsofCond(children(0))
        }),
      // the ASOF … USING placeholder (column names as string
      // literals; lowered by AsofProbeTagRule — see GraftAsofUsing)
      (FunctionIdentifier("graft_asof_using"),
        new ExpressionInfo(classOf[graft.plans.GraftAsofUsing].getName,
          "graft_asof_using"),
        (children: Seq[Expression]) => {
          require(children.nonEmpty && children.forall(c => c.foldable &&
              c.dataType == org.apache.spark.sql.types.StringType),
            "graft_asof_using takes 1+ string-literal column names")
          graft.plans.GraftAsofUsing(
            children.map(c => String.valueOf(c.eval())))
        }))

  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    functions.foreach { case (ident, info, builder) =>
      if (!registry.functionExists(ident))
        registry.registerFunction(ident, info, builder)
    }
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinBucketingRule)
    ext.injectOptimizerRule(_ => graft.plans.NanosTsPushdownRule)
    ext.injectOptimizerRule(_ => graft.plans.AsofJoinRewriteRule)
    // stamps the ASOF probe side at analysis time so the rewrite can
    // detect (and refuse) a join whose children an optimizer rule
    // reordered — see GraftAsofCond.probeTag
    ext.injectResolutionRule(_ => graft.plans.AsofProbeTagRule)
    // ASOF [LEFT] JOIN syntax — parser injection has no runtime
    // route, so this is the one graft feature exclusive to the
    // config-activated session (GraftSqlParser Scaladoc)
    ext.injectParser((session, delegate) =>
      new graft.plans.GraftSqlParser(delegate, Some(session)))
  }
}
