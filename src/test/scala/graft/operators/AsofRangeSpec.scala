package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The two join-shape operators whose scalable formulation differs
  * from the obvious one: each is cross-validated against the naive
  * (non-scalable) formulation on the smoke corpus, independent of the
  * DuckDB oracle (which is itself a third derivation — duck native
  * ASOF JOIN / IEJoin). */
class AsofRangeSpec extends SparkSpec {

  test("t_asof_def piggyback sort-merge equals the naive range-join lookup") {
    val ev = Tables.events(spark, sfDir)
    val lastWrite = Window.partitionBy(col("user_id"), col("ts"))
      .orderBy(col("event_id").desc)
    val defs = ev.filter(col("event_type") === "signup")
      .withColumn("rn", row_number().over(lastWrite)).filter(col("rn") === 1)
      .select(col("user_id").as("d_uid"), col("ts").as("def_ts"),
        col("value").as("def_value"))
    val fires = ev.filter(col("event_type") =!= "signup")
      .select(col("event_id"), col("user_id"), col("ts"))
    // naive: range join + per-event argmax on def_ts (fine at smoke
    // scale; exactly what the chunked/piggyback forms must reproduce)
    val naiveW = Window.partitionBy(col("event_id")).orderBy(col("def_ts").desc)
    val naive = fires
      .join(defs, col("user_id") === col("d_uid") && col("def_ts") <= col("ts"))
      .withColumn("rn", row_number().over(naiveW)).filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("ts"), col("def_ts"), col("def_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getTimestamp(3), r.getDouble(4))).toSet

    val got = TimerOps.tAsofDef(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getTimestamp(3), r.getDouble(4))).toSet
    assert(got == naive,
      s"asof mismatch: only-piggyback=${(got -- naive).take(3)} only-naive=${(naive -- got).take(3)}")
    assert(got.nonEmpty)
  }

  test("q23_range_join chunked equi-join equals the naive inequality join") {
    val winMs = 600000L
    val ev = Tables.events(spark, sfDir)
      .select(unix_millis(col("ts")).as("ts_ms"))
    val incidents = Tables.events(spark, sfDir)
      .filter(col("event_type") === "error")
      .select(col("event_id").as("incident_id"), unix_millis(col("ts")).as("start_ms"))
    val naive = incidents.crossJoin(ev)
      .filter(col("ts_ms") >= col("start_ms") && col("ts_ms") < col("start_ms") + winMs)
      .groupBy(col("incident_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val got = RelationalOps.q23RangeJoin(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive,
      s"range-join mismatch: only-chunked=${(got -- naive).take(3)} only-naive=${(naive -- got).take(3)}")
    assert(got.nonEmpty)
  }

  test("q27_range_frame equals a naive per-row trailing-30-day recompute") {
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("d"),
        ExactNum.cents(col("o_totalprice")).as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byCust = orders.groupBy(_._1)
    val naive = orders.map { case (ck, ok, d, _) =>
      val in = byCust(ck).filter(o => o._3 >= d - 30 && o._3 <= d)
      (ck, ok) -> ((in.length.toLong,
        math.round(in.map(_._4).sum / 100.0 * 10000) / 10000.0))
    }.toMap
    val got = RelationalOps.q27RangeFrame(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(3), r.getDouble(4))))
    assert(got.length == orders.length)
    got.foreach { case (k, v) =>
      assert(naive(k) == v, s"order $k: got $v want ${naive(k)}")
    }
  }
}
