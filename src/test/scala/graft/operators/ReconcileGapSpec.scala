package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cross-operator consistency for the round-9 tail: the full-outer
  * retention matrix must agree with the set operators slicing the
  * same halves, and the LOCF gap-fill must equal a sequential
  * driver-side recompute. */
class ReconcileGapSpec extends SparkSpec {

  test("q31 full outer: segments reproduce q25/q26 exactly; counts conserve to the order table") {
    val m = RelationalOps.q31FullOuter(spark, sfDir).cache()
    def seg(s: String) = m.filter(col("seg") === s)
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val retained = RelationalOps.q25Intersect(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val churned = RelationalOps.q26Except(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(seg("retained") == retained, "retained != INTERSECT of the halves")
    assert(seg("churned") == churned, "churned != EXCEPT of the halves")
    // counts conserve: per-half sums equal the raw order counts
    def rawCount(from: String, until: String) =
      graft.Tables.orders(spark, sfDir)
        .filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
          col("o_orderdate") < lit(until).cast("timestamp")).count()
    val sums = m.agg(sum("n_h1"), sum("n_h2")).collect()(0)
    assert(sums.getLong(0) == rawCount("1996-01-01", "1996-07-01"))
    assert(sums.getLong(1) == rawCount("1996-07-01", "1997-01-01"))
    // no customer appears twice, every row is exactly one segment
    assert(m.groupBy("o_custkey").count().filter(col("count") > 1).count() == 0)
    m.unpersist()
  }

  test("t_gap_fill: equals a sequential driver-side LOCF over the same grid") {
    val rows = TimerOps.tGapFill(spark, sfDir)
      .select("app", "minute", "observed", "filled", "staleness_min")
      .collect()
    assert(rows.length == 8 * 1440, s"grid is ${rows.length}, not 8x1440")
    rows.groupBy(_.getLong(0)).foreach { case (app, rs) =>
      val ordered = rs.sortBy(_.getTimestamp(1).getTime)
      var lastObs: Option[(Long, Long)] = None // (value, minuteMs)
      ordered.foreach { r =>
        val t = r.getTimestamp(1).getTime
        if (!r.isNullAt(2)) lastObs = Some((r.getLong(2), t))
        lastObs match {
          case Some((v, ot)) =>
            assert(!r.isNullAt(3) && r.getLong(3) == v,
              s"app $app minute $t: filled ${r.get(3)} != LOCF $v")
            assert(r.getLong(4) == (t - ot) / 60000L,
              s"app $app minute $t: staleness ${r.get(4)}")
          case None =>
            assert(r.isNullAt(3) && r.isNullAt(4),
              s"app $app minute $t: fill before any observation")
        }
      }
      // where observed is present the fill is trivially fresh
      ordered.filter(!_.isNullAt(2)).foreach { r =>
        assert(r.getLong(4) == 0L, s"observed minute with staleness ${r.get(4)}")
      }
    }
  }
}
