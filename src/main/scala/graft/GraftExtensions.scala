package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BloomMightContain, NextCronTimes}

/** SparkSessionExtensions entry point: registers graft's custom
  * Catalyst expressions as SQL functions. Wired into every session by
  * Sessions.build via spark.sql.extensions, so operators can use them
  * through expr("cron_times(...)") — the idiomatic extension route,
  * no function-registry poking per call site.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cron_times"),
      new ExpressionInfo(classOf[NextCronTimes].getName, "cron_times"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "cron_times(cron, start, end)")
        NextCronTimes(children(0), children(1), children(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "bloom_might_contain(bloom, p1, p2)")
        BloomMightContain(children(0), children(1), children(2))
      }))
  }
}
