package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized MODEL test for the transactional lake: a seeded
  * sequence of appendBatch / upsert / deleteWhere / deleteWhereDV /
  * compactDay / mergeInto / restore / renameColumn / crash-injected
  * ops runs
  * against both the real ManifestLake and a
  * driver-side Map model implementing the same semantics
  * (latest-wins per key, TRUE-only delete, append adds). After every
  * op the committed read must equal the model EXACTLY — including
  * after injected crashes, where the model (correctly) does not
  * advance. Point specs pin each behavior once; this pins their
  * COMPOSITION, which is where transactional layers actually break
  * (a stale snapshot read inside op N+1 after op N's commit, a
  * cursor that advances on a crashed append, a compaction that
  * resurrects deleted rows). */
class ManifestLakeModelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new java.sql.Timestamp(ms)
  private val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
  private val DayMs = 86400000L

  // key → (ts, value); the model's latest-wins state
  private type Model = Map[Long, (Long, Double)]

  private def toDf(rows: Seq[(Long, Long, Double)], valueName: String) =
    rows.map { case (k, t, v) => (k, ts(t), v) }
      .toDF("k", "ts", valueName)

  private def lakeState(dir: String, valueName: String): Model =
    ManifestLake.read(spark, dir)
      .select("k", "ts", valueName).collect()
      .map(r => r.getLong(0) -> ((r.getTimestamp(1).getTime, r.getDouble(2))))
      .toMap

  for (seed <- Seq(1107, 2214))
  test(s"random op sequence: lake == driver-side model after every committed op (seed $seed)") {
    val rnd = new scala.util.Random(seed)
    val dir = Files.createTempDirectory("graft_ml_model").toString
    def rk() = rnd.nextInt(40).toLong                 // small key space → real collisions
    def rt() = base + rnd.nextInt(5) * DayMs + rnd.nextInt(86400) * 1000L
    def rv() = (rnd.nextInt(1000) + 1) / 100.0

    // init: 12 distinct keys; stats ON so every op composition also
    // exercises collection, carry-forward, and pruning (r11)
    val init = Seq.tabulate(12)(i => (i.toLong, rt(), rv()))
    // the value column's CURRENT logical name — the rename arm flips
    // it between "value" and "price"; the stored physical name stays
    // "value" forever (column mapping), which is also why the stats
    // column registration below keeps pruning across renames
    var valueName = "value"
    ManifestLake.create(spark, dir, toDf(init, valueName), "ts",
      statsCols = Seq("k", "value"))
    var model: Model = init.map { case (k, t, v) => k -> ((t, v)) }.toMap
    var nextBatch = 0L
    // committed version → (model, value-column name) at that version,
    // so the restore arm rolls BOTH back alongside the lake (restore
    // reinstates the old schema checkpoint, logical names included)
    var versionLog: Map[Long, (Model, String)] = Map(1L -> ((model, valueName)))

    def checkEq(opName: String, op: Int): Unit = {
      val got = lakeState(dir, valueName)
      assert(got == model, s"op $op ($opName): lake ${got.toSeq.sortBy(_._1)} " +
        s"!= model ${model.toSeq.sortBy(_._1)}")
      // the stats-pruned read must agree with the model's filter after
      // EVERY committed op — stale or wrong per-file stats would
      // surface here as a dropped (or resurrected) row. The predicate
      // uses the CURRENT logical name, so after the rename arm this
      // also pins the logical→physical stats-key translation.
      val pruned = ManifestLake.readWhere(spark, dir,
        s"k < 20 AND $valueName >= 2.5")
        .select("k", "ts", valueName).collect()
        .map(r => r.getLong(0) -> ((r.getTimestamp(1).getTime,
          r.getDouble(2)))).toMap
      val expect = model.filter { case (k, (_, v)) => k < 20 && v >= 2.5 }
      assert(pruned == expect, s"op $op ($opName): readWhere diverged")
      versionLog += ManifestLake.snapshot(spark, dir).version ->
        ((model, valueName))
    }

    (1 to 40).foreach { op =>
      rnd.nextInt(13) match {
        case 0 | 1 | 2 => // append new keys (fresh ids so append stays append)
          val rows = Seq.tabulate(1 + rnd.nextInt(3))(i =>
            (1000L + op * 10 + i, rt(), rv()))
          ManifestLake.appendBatch(spark, dir, toDf(rows, valueName), "ts",
            nextBatch)
          nextBatch += 1
          model ++= rows.map { case (k, t, v) => k -> ((t, v)) }
          checkEq("append", op)
        case 3 => // replay of the PREVIOUS batch id: must be a no-op
          if (nextBatch > 0) {
            val rows = Seq((2000L + op, rt(), rv()))
            ManifestLake.appendBatch(spark, dir, toDf(rows, valueName), "ts",
              nextBatch - 1)
            checkEq("replayed-append(no-op)", op)
          }
        case 4 | 5 => // latest-wins upsert over existing + new keys
          val rows = Seq.tabulate(1 + rnd.nextInt(3))(_ => (rk(), rt(), rv()))
          ManifestLake.upsert(spark, dir, toDf(rows, valueName), Seq("k"), "ts")
          rows.foreach { case (k, t, v) =>
            val winner = model.get(k) match {
              case Some((t0, _)) if t0 > t => model(k)
              case _ => (t, v) // update wins ties (src desc)
            }
            model += k -> winner
          }
          checkEq("upsert", op)
        case 6 => // copy-on-write takedown by value threshold (TRUE-only)
          val cut = rv()
          ManifestLake.deleteWhere(spark, dir, col(valueName) < cut)
          model = model.filter { case (_, (_, v)) => !(v < cut) }
          checkEq("delete", op)
        case 7 => // the SAME semantics through a deletion vector —
          // identical model transition, merge-on-read mechanism; every
          // later op in the sequence then composes against active DVs
          // (upsert/compaction must retire them, appends must not
          // disturb them, readWhere must anti-join through its pruning)
          val cutDv = rv()
          ManifestLake.deleteWhereDV(spark, dir, col(valueName) < cutDv)
          model = model.filter { case (_, (_, v)) => !(v < cutDv) }
          checkEq("dv-delete", op)
        case 8 => // compaction of a random live day (sometimes
          // clustered): content-neutral either way
          val days = ManifestLake.snapshot(spark, dir).days.keys.toSeq.sorted
          if (days.nonEmpty) {
            val clusterBy = if (rnd.nextBoolean()) Seq("k") else Seq.empty
            ManifestLake.compactDay(spark, dir, days(rnd.nextInt(days.size)),
              clusterBy = clusterBy)
            checkEq("compact", op)
          }
        case 9 => // CRASH injection: a failed commit changes nothing
          val rows = Seq((3000L + op, rt(), rv()))
          intercept[RuntimeException] {
            ManifestLake.appendBatch(spark, dir, toDf(rows, valueName), "ts",
              nextBatch,
              beforeCommit = () => throw new RuntimeException("kill"))
          }
          // cursor must NOT have advanced; the same id re-lands once
          ManifestLake.appendBatch(spark, dir, toDf(rows, valueName), "ts",
            nextBatch)
          nextBatch += 1
          model += rows.head._1 -> ((rows.head._2, rows.head._3))
          checkEq("crash+retry", op)
        case 10 => // generic MERGE: newer-wins conditional update,
          // low-value matched delete, fresh-key insert — composed
          // against whatever DV/append/compaction state the sequence
          // built up; distinct source keys (dup keys on a matched
          // target are the AMBIGUITY error, pinned elsewhere)
          val upd = Seq.tabulate(1 + rnd.nextInt(2))(_ => (rk(), rt(), rv()))
            .distinctBy(_._1)
          val ins = Seq((4000L + op, rt(), rv()))
          ManifestLake.mergeInto(spark, dir, toDf(upd ++ ins, valueName),
            Seq("k"), "ts",
            Seq(
              ManifestLake.MatchedUpdate(
                Map("ts" -> col("s.ts"), valueName -> col(s"s.$valueName")),
                cond = Some(expr("s.ts > t.ts"))),
              ManifestLake.MatchedDelete(
                cond = Some(expr(s"t.$valueName < 1.0"))),
              ManifestLake.NotMatchedInsert()))
          (upd ++ ins).foreach { case (k, t, v) =>
            model.get(k) match {
              case Some((t0, v0)) =>
                if (t > t0) model += k -> ((t, v))
                else if (v0 < 1.0) model -= k
              case None => model += k -> ((t, v))
            }
          }
          checkEq("merge", op)
        case 11 => // RESTORE to a random earlier version: the model
          // rolls back with it (versionLog); the batch cursor does
          // NOT (appends use fresh ids, so the sequence continues)
          val head = ManifestLake.snapshot(spark, dir).version
          val candidates = versionLog.keys.filter(_ <= head).toSeq.sorted
          if (candidates.nonEmpty) {
            val v = candidates(rnd.nextInt(candidates.size))
            ManifestLake.restore(spark, dir, v)
            val (m, vn) = versionLog(v)
            model = m
            valueName = vn
            checkEq(s"restore($v)", op)
          }
        case 12 => // RENAME the value column (metadata-only): every
          // later op reads/writes/prunes through the new logical name
          // over the SAME stored bytes; restore rolls the name back
          val next = if (valueName == "value") "price" else "value"
          ManifestLake.renameColumn(spark, dir, valueName, next)
          valueName = next
          checkEq(s"rename($next)", op)
      }
    }
    // end state sanity: vacuum reclaims the crash orphans without
    // changing the committed view
    val before = lakeState(dir, valueName)
    ManifestLake.vacuum(spark, dir, retentionMs = 0L, force = true)
    assert(lakeState(dir, valueName) == before,
      "vacuum changed the committed view")
  }
}
