package graft.operators

import graft.SparkSpec

/** t_upsert_merge — the executor's partial-Updates-by-unique-key write
  * path (gotimer_executor/dao/task/task.go:42) replayed as a
  * latest-wins merge: creation metadata from the first version,
  * mutable fields from the last, version count for audit. */
class UpsertSpec extends SparkSpec {

  test("upsert merge: latest-wins per key, agrees with a naive replay") {
    val events = graft.Tables.events(spark, sfDir)
      .selectExpr("event_id", "user_id", "date_format(ts, 'yyyy-MM-dd HH:mm') AS minute",
        "ts", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3), r.getString(4), r.getDouble(5)))

    val naive = events.groupBy(e => (e._2, e._3)).map { case (key, vs) =>
      val created = vs.map(_._4).min((a: java.sql.Timestamp, b: java.sql.Timestamp) => a.compareTo(b))
      // latest = max by (ts, event_id) — the replay order GORM Updates applies in
      val latest = vs.maxBy(e => (e._4.getTime, e._4.getNanos, e._1))
      key -> ((created, latest._4, latest._5, latest._6, vs.length.toLong))
    }

    val got = TimerOps.tUpsertMerge(spark, sfDir).collect().map { r =>
      (r.getLong(0), r.getString(1)) ->
        ((r.getTimestamp(2), r.getTimestamp(3), r.getString(4), r.getDouble(5), r.getLong(6)))
    }.toMap

    assert(got.keySet == naive.keySet, "key sets differ")
    naive.foreach { case (k, exp) =>
      assert(got(k) == exp, s"key $k: got ${got(k)} want $exp")
    }
    // the merge view and the dedup (keep-earliest) view agree on keys
    val dedupKeys = TimerOps.tTaskDedup(spark, sfDir)
      .select("timer_id", "minute").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.keySet == dedupKeys, "merge keys != dedup keys")
    // multi-version keys exist, or the merge semantics went unexercised
    assert(naive.values.exists(_._5 > 1L), "no key saw an update")
  }
}
