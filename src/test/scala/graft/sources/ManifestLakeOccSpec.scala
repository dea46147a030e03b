package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** OCC rebase-and-retry (VERDICT r12 #5 — Delta's conflict rule):
  * logically-disjoint concurrent writers both land exactly once, one
  * version apart; anything that actually conflicts — overlapping
  * days, keys leaking into the stale read set, metadata changes,
  * cursor regression — still refuses loudly. The race is staged
  * deterministically through beforeCommit: the INNER writer commits
  * between the outer writer's data write and manifest rename. */
class ManifestLakeOccSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def mk(ids: Range, day: Int) =
    ids.map(i => (i.toLong, ts(f"2024-03-$day%02d 10:00:00"), s"v$i"))
      .toDF("id", "ts", "v")
  private def tmp(tag: String) =
    Files.createTempDirectory(s"graft_occ_$tag").toString

  test("disjoint concurrent appends: the loser rebases and both land exactly once") {
    val dir = tmp("app")
    ManifestLake.create(spark, dir, mk(0 until 10, 1), "ts")
    // outer writer (batch 1) stalls before its rename; inner writer
    // (batch 0) wins the race at v2 — the outer rebases to v3 without
    // rewriting any data
    val v = ManifestLake.appendBatch(spark, dir, mk(100 until 110, 2),
      "ts", batchId = 1L,
      beforeCommit = () => {
        ManifestLake.appendBatch(spark, dir, mk(200 until 210, 3),
          "ts", batchId = 0L)
        ()
      })
    assert(v == 3L)
    val got = ManifestLake.read(spark, dir)
    assert(got.count() == 30L)
    assert(got.select("id").collect().map(_.getLong(0)).toSet ==
      ((0L until 10L) ++ (100L until 110L) ++ (200L until 210L)).toSet)
    assert(ManifestLake.snapshot(spark, dir).lastBatch == 1L)
  }

  test("disjoint-day concurrent upserts both land exactly once") {
    val dir = tmp("ups")
    ManifestLake.create(spark, dir,
      mk(0 until 10, 1).union(mk(100 until 110, 2)), "ts")
    val updA = Seq((5L, ts("2024-03-01 12:00:00"), "a-new"))
      .toDF("id", "ts", "v")
    val updB = Seq((105L, ts("2024-03-02 12:00:00"), "b-new"))
      .toDF("id", "ts", "v")
    val v = ManifestLake.upsert(spark, dir, updA, Seq("id"), "ts",
      beforeCommit = () => {
        ManifestLake.upsert(spark, dir, updB, Seq("id"), "ts")
        ()
      })
    assert(v == 3L)
    val got = ManifestLake.read(spark, dir)
    assert(got.count() == 20L, "a rebase duplicated or dropped rows")
    assert(got.filter(col("id") === 5L).head().getAs[String]("v") == "a-new")
    assert(got.filter(col("id") === 105L).head().getAs[String]("v") == "b-new")
  }

  test("updateWhere racing an append to another day rebases; racing a " +
      "rewrite of its own read set refuses (r14)") {
    val dir = tmp("upd")
    ManifestLake.create(spark, dir,
      mk(0 until 10, 1).union(mk(100 until 110, 2)), "ts")
    // disjoint: update day 1 while an append lands day 3 → both commit
    val n = ManifestLake.updateWhere(spark, dir,
      Map("v" -> lit("patched")), col("id") < 10,
      beforeCommit = () => {
        ManifestLake.append(spark, dir, mk(200 until 210, 3), "ts")
        ()
      })
    assert(n == 10L)
    val got = ManifestLake.read(spark, dir)
    assert(got.count() == 30L, "a rebase duplicated or dropped rows")
    assert(got.filter(col("v") === "patched").count() == 10L)
    assert(ManifestLake.snapshot(spark, dir).version == 3L)
    // overlapping: update day 1 while day 1 is concurrently rewritten
    val boom = intercept[java.util.ConcurrentModificationException] {
      ManifestLake.updateWhere(spark, dir,
        Map("v" -> lit("again")), col("id") === 1L,
        beforeCommit = () => {
          ManifestLake.deleteWhere(spark, dir, col("id") === 2L)
          ()
        })
    }
    assert(boom.getMessage.contains("read set"))
  }

  test("a concurrent append that writes the merge's keys into another day refuses (stale read set)") {
    val dir = tmp("leak")
    ManifestLake.create(spark, dir, mk(0 until 10, 1), "ts")
    val updA = Seq((5L, ts("2024-03-01 12:00:00"), "a-new"))
      .toDF("id", "ts", "v")
    // the inner append lands key 5 on day 3 — outside A's affected
    // days, so A's day-level check alone would pass, but A's rewrite
    // never saw that row: latest-wins would silently keep BOTH copies
    val boom = intercept[java.util.ConcurrentModificationException] {
      ManifestLake.upsert(spark, dir, updA, Seq("id"), "ts",
        beforeCommit = () => {
          ManifestLake.appendBatch(spark, dir,
            Seq((5L, ts("2024-03-03 09:00:00"), "elsewhere"))
              .toDF("id", "ts", "v"), "ts", batchId = 0L)
          ()
        })
    }
    assert(boom.getMessage.contains("stale"), boom.getMessage)
  }

  test("a concurrent metadata change (CHECK constraint) refuses the rebase") {
    val dir = tmp("meta")
    ManifestLake.create(spark, dir, mk(0 until 10, 1), "ts")
    val boom = intercept[java.util.ConcurrentModificationException] {
      ManifestLake.appendBatch(spark, dir, mk(100 until 105, 2), "ts",
        batchId = 0L,
        beforeCommit = () => {
          ManifestLake.addCheck(spark, dir, "pos", "id >= 0")
          ()
        })
    }
    assert(boom.getMessage.contains("metadata"), boom.getMessage)
  }

  test("OPTIMIZE vs ingest: compactDay racing an append to ANOTHER day rebases, both land") {
    val dir = tmp("cmp")
    ManifestLake.create(spark, dir, mk(0 until 10, 1), "ts")
    ManifestLake.appendBatch(spark, dir, mk(20 until 30, 1), "ts", 0L)
    // the maintenance loop compacts day 1 (two dirs) while the ingest
    // lands day 2 — the classic lake race; the compaction rebases
    val v = ManifestLake.compactDay(spark, dir, "2024-03-01",
      beforeCommit = () => {
        ManifestLake.appendBatch(spark, dir, mk(100 until 110, 2),
          "ts", batchId = 1L)
        ()
      })
    assert(v == 4L)
    val snap = ManifestLake.snapshot(spark, dir)
    assert(snap.days("2024-03-01").size == 1, "day 1 not compacted")
    assert(snap.days.contains("2024-03-02"), "winner's append lost")
    assert(ManifestLake.read(spark, dir).count() == 30L)
    assert(snap.lastBatch == 1L, "winner's cursor regressed")
  }

  test("compactDay racing an append to the SAME day refuses (the rewrite would drop it)") {
    val dir = tmp("cmps")
    ManifestLake.create(spark, dir, mk(0 until 10, 1), "ts")
    ManifestLake.appendBatch(spark, dir, mk(20 until 30, 1), "ts", 0L)
    val boom = intercept[java.util.ConcurrentModificationException] {
      ManifestLake.compactDay(spark, dir, "2024-03-01",
        beforeCommit = () => {
          ManifestLake.appendBatch(spark, dir, mk(40 until 50, 1),
            "ts", batchId = 1L)
          ()
        })
    }
    assert(boom.getMessage.contains("read set"), boom.getMessage)
    // nothing lost: all three generations of day 1 are visible
    assert(ManifestLake.read(spark, dir).count() == 30L)
  }

  test("deleteWhere racing an append to another day rebases; the blind append survives (WriteSerializable)") {
    val dir = tmp("del")
    ManifestLake.create(spark, dir,
      mk(0 until 10, 1).union(mk(100 until 110, 2)), "ts")
    // the delete matches day-1 rows; the concurrent append lands
    // day-3 rows that ALSO match the predicate — under
    // WriteSerializable the delete is ordered first, so they survive
    val deleted = ManifestLake.deleteWhere(spark, dir,
      col("id") < 5L,
      beforeCommit = () => {
        ManifestLake.appendBatch(spark, dir,
          Seq((2L, ts("2024-03-03 09:00:00"), "late"))
            .toDF("id", "ts", "v"), "ts", batchId = 0L)
        ()
      })
    assert(deleted == 5L)
    val got = ManifestLake.read(spark, dir)
    assert(got.count() == 16L) // 20 - 5 deleted + 1 late append
    assert(got.filter(col("v") === "late").count() == 1L,
      "the blind append was lost")
  }

  test("deleteWhereDV racing a rewrite of a covered dir refuses (resurrection guard)") {
    val dir = tmp("dvr")
    ManifestLake.create(spark, dir, mk(0 until 10, 1), "ts")
    // the DV covers day 1's dir; a concurrent compaction of day 1
    // rewrites that dir WITHOUT seeing the uncommitted DV — its
    // output re-materializes the rows, so the DV must refuse
    ManifestLake.appendBatch(spark, dir, mk(20 until 30, 1), "ts", 0L)
    val boom = intercept[java.util.ConcurrentModificationException] {
      ManifestLake.deleteWhereDV(spark, dir, col("id") < 5L,
        beforeCommit = () => {
          ManifestLake.compactDay(spark, dir, "2024-03-01")
          ()
        })
    }
    assert(boom.getMessage.contains("rewritten"), boom.getMessage)
    // no rows deleted, none resurrected: the table is wholly intact
    assert(ManifestLake.read(spark, dir).count() == 20L)
  }

  test("mergeInto racing an append to another day rebases, both land") {
    val dir = tmp("mrg")
    ManifestLake.create(spark, dir, mk(0 until 10, 1), "ts")
    val src = Seq((5L, ts("2024-03-01 12:00:00"), "merged"))
      .toDF("id", "ts", "v")
    val v = ManifestLake.mergeInto(spark, dir, src, Seq("id"), "ts",
      Seq(ManifestLake.MatchedUpdate(
        Map("v" -> col("s.v"), "ts" -> col("s.ts")))),
      beforeCommit = () => {
        ManifestLake.appendBatch(spark, dir, mk(200 until 210, 3),
          "ts", batchId = 0L)
        ()
      })
    assert(v == 3L)
    val got = ManifestLake.read(spark, dir)
    assert(got.count() == 20L)
    assert(got.filter(col("id") === 5L).head().getAs[String]("v")
      == "merged")
    assert(got.filter(col("id") === 205L).count() == 1L,
      "winner's append lost")
  }

  test("stress: 8 REAL concurrent disjoint-day writers all land exactly once") {
    val dir = tmp("stress")
    ManifestLake.create(spark, dir, mk(0 until 10, 1), "ts")
    // unlike the staged beforeCommit races above, this exercises
    // arbitrary interleavings: 8 threads upsert 8 DISJOINT days
    // through the same session. A writer that exhausts its bounded
    // rebases re-runs from a fresh snapshot — the documented remedy —
    // so the assertion is the system-level one: every write lands
    // exactly once, no matter who lost how many races.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val futures = (0 until 8).map { w =>
      scala.concurrent.Future {
        val updates = mk(1000 * (w + 1) until 1000 * (w + 1) + 20, w + 10)
        var landed = false
        while (!landed) {
          try {
            ManifestLake.upsert(spark, dir, updates, Seq("id"), "ts")
            landed = true
          } catch {
            case _: java.util.ConcurrentModificationException => ()
          }
        }
      }
    }
    try scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration(600, "s"))
    finally pool.shutdown()
    val got = ManifestLake.read(spark, dir)
    assert(got.count() == 170L, "a writer duplicated or lost rows")
    val ids = got.select("id").collect().map(_.getLong(0)).toSet
    val want = (0L until 10L).toSet ++
      (0 until 8).flatMap(w => 1000L * (w + 1) until 1000L * (w + 1) + 20)
        .toSet
    assert(ids == want)
    assert(ManifestLake.snapshot(spark, dir).version >= 9L)
  }

  test("stress: MIXED concurrent ops (append+upsert+DV delete+CoW delete+compact+merge) on disjoint read sets all land exactly once (VERDICT r13 #5)") {
    val dir = tmp("mixed")
    // base: day 1 in TWO generations (the compaction target), days
    // 2-4 carrying the delete/upsert/merge victims
    ManifestLake.create(spark, dir, mk(0 until 10, 1), "ts")
    ManifestLake.appendBatch(spark, dir, mk(20 until 30, 1), "ts", 0L)
    ManifestLake.appendBatch(spark, dir,
      mk(200 until 210, 2).union(mk(300 until 310, 3))
        .union(mk(400 until 410, 4)).union(mk(500 until 510, 5)),
      "ts", 1L)
    // the pairwise rebase rules are each specced above; this pins
    // their COMPOSITION under real threads — seven writers, six
    // DIFFERENT ops, logically disjoint read sets, arbitrary
    // interleavings. Refusals are legitimate mid-flight (a writer may
    // observe a half-ordered world); the contract is that re-running
    // from a fresh snapshot converges and the FINAL state is the one
    // serial execution in any order produces (all ops commute here).
    val ops: Seq[() => Unit] = Seq(
      // THE ingest stream: the batch-id cursor is one logical
      // sequence per table (appendBatch's contract), so the two
      // appends are sequential inside one writer — what a streaming
      // sink actually does — racing everyone else
      () => {
        ManifestLake.appendBatch(spark, dir, mk(1000 until 1020, 10),
          "ts", batchId = 2L)
        ManifestLake.appendBatch(spark, dir, mk(1030 until 1050, 11),
          "ts", batchId = 3L)
        ()
      },
      // a second ingest without a cursor: insert-only upsert of
      // brand-new keys into a brand-new day
      () => { ManifestLake.upsert(spark, dir, mk(1100 until 1120, 12),
        Seq("id"), "ts"); () },
      // upsert touching ONLY day 3's keys
      () => { ManifestLake.upsert(spark, dir,
        Seq((305L, ts("2024-03-03 12:00:00"), "upd"))
          .toDF("id", "ts", "v"), Seq("id"), "ts"); () },
      // DV delete bounded to day 2 (its dirs are never rewritten by
      // anyone else, so the resurrection guard stays quiet)
      () => { ManifestLake.deleteWhereDV(spark, dir,
        col("id").isin(203L, 207L),
        dayBound = Some(_ == "2024-03-02")); () },
      // copy-on-write delete bounded to day 4's rows
      () => { ManifestLake.deleteWhere(spark, dir,
        col("id") >= 405L && col("id") < 408L); () },
      // MERGE updating ONLY day 5's keys
      () => { ManifestLake.mergeInto(spark, dir,
        Seq((505L, ts("2024-03-05 12:00:00"), "merged"))
          .toDF("id", "ts", "v"), Seq("id"), "ts",
        Seq(ManifestLake.MatchedUpdate(
          Map("v" -> col("s.v"), "ts" -> col("s.ts"))))); () },
      // OPTIMIZE folding day 1's two generations
      () => { ManifestLake.compactDay(spark, dir, "2024-03-01"); () })
    val pool = java.util.concurrent.Executors.newFixedThreadPool(ops.size)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val futures = ops.map { op =>
      scala.concurrent.Future {
        var landed = false
        while (!landed) {
          try { op(); landed = true }
          catch {
            case _: java.util.ConcurrentModificationException => ()
          }
        }
      }
    }
    try scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration(600, "s"))
    finally pool.shutdown()
    val got = ManifestLake.read(spark, dir)
    // 60 base + 20 + 20 appended + 20 upsert-inserted − 2 DV − 3 CoW
    // (the update-upsert and merge change rows in place, compaction
    // moves bytes only)
    assert(got.count() == 115L, "an op landed twice or got lost")
    assert(got.filter(col("id") === 305L).head().getAs[String]("v")
      == "upd", "the upsert's update was lost in a rebase")
    assert(got.filter(col("id") === 505L).head().getAs[String]("v")
      == "merged", "the merge's update was lost in a rebase")
    assert(got.filter(col("id").isin(203L, 207L)).count() == 0L,
      "a DV delete resurrected")
    assert(got.filter(col("id") >= 405L && col("id") < 408L).count() == 0L,
      "a CoW delete resurrected")
    val snap = ManifestLake.snapshot(spark, dir)
    assert(snap.days("2024-03-01").size == 1, "compaction lost")
    assert(snap.days.contains("2024-03-10") &&
      snap.days.contains("2024-03-11") &&
      snap.days.contains("2024-03-12"), "an ingest batch lost")
    assert(snap.lastBatch == 3L, "the ingest cursor regressed")
    // every write committed exactly once on top of v3 (8 commits:
    // two appends, two upserts, DV, CoW, merge, compaction)
    assert(snap.version == 11L,
      s"expected 11 commits, head ${snap.version}")
  }

  test("commit publish is atomic fail-if-exists: metadata writers " +
      "racing the SAME version never lose a commit (r14 — the POSIX " +
      "rename-replaces TOCTOU)") {
    // rename(2) REPLACES an existing target, so exists-check + rename
    // let two same-version committers both 'succeed', the second
    // erasing the first (the 8-writer stress caught this as a lost
    // commit). Metadata-only commits (renameColumn: no Spark job, a
    // microsecond window) maximize the same-version collision rate;
    // the hard-link publish must keep every landing exactly-once.
    val dir = tmp("linkrace")
    val base = spark.range(4).selectExpr(
      Seq("CAST(TIMESTAMP '2024-03-01 10:00:00' AS TIMESTAMP) AS ts") ++
        (0 until 8).map(w => s"CAST(id AS BIGINT) AS c$w"): _*)
    ManifestLake.create(spark, dir, base, "ts")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val futures = (0 until 8).map { w =>
      scala.concurrent.Future {
        gate.await()
        var landed = false
        while (!landed) {
          try {
            ManifestLake.renameColumn(spark, dir, s"c$w", s"r$w")
            landed = true
          } catch {
            case _: java.util.ConcurrentModificationException => ()
          }
        }
      }
    }
    gate.countDown()
    try scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration(120, "s"))
    finally pool.shutdown()
    val cols = ManifestLake.read(spark, dir).columns.toSet
    (0 until 8).foreach { w =>
      assert(cols.contains(s"r$w") && !cols.contains(s"c$w"),
        s"writer $w's rename was lost (have ${cols.mkString(",")})")
    }
    // exactly 8 commits on top of create — nobody landed twice
    assert(ManifestLake.snapshot(spark, dir).version == 9L)
  }

  test("racing CREATEs over the same path: exactly one wins the v1 " +
      "publish, the loser refuses (r14 — the link-publish corollary)") {
    val dir = tmp("createrace")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val futures = (0 until 2).map { w =>
      scala.concurrent.Future {
        gate.await()
        try {
          ManifestLake.create(spark, dir, mk(w * 100 until w * 100 + 10, 1),
            "ts")
          Right(w)
        } catch {
          // the PUBLISH loser gets the CME; the pre-commit scaffolding
          // (schema anchor overwrite) may also race and fail with an
          // IO error — either way the invariant under test is the same:
          // at most ONE writer's v1 exists, never a blend
          case e: Exception => Left(e)
        }
      }
    }
    gate.countDown()
    val results = try scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration(120, "s"))
    finally pool.shutdown()
    val winners = results.collect { case Right(w) => w }
    assert(winners.size <= 1,
      s"two CREATEs both claimed the same v1: $results")
    if (winners.size == 1) {
      // head is exactly the winner's data — never a blend, never v2
      assert(ManifestLake.snapshot(spark, dir).version == 1L)
      val ids = ManifestLake.read(spark, dir).select("id").collect()
        .map(_.getLong(0)).toSet
      val w = winners.head
      assert(ids == (w * 100L until w * 100L + 10L).toSet)
    } else
      // both lost on pre-commit scaffolding: no table, no corruption
      assert(ManifestLake.snapshot(spark, dir).version == 0L)
  }

  test("a racing attempt of the SAME batch id is a replay SKIP; an unrelated id stream refuses") {
    val dir = tmp("cur")
    ManifestLake.create(spark, dir, mk(0 until 10, 1), "ts")
    // the zombie-retry contract: two attempts of batch 5 (same data)
    // race; the loser finds batch 5 COMMITTED in the race window and
    // skips — losing the race must not change the semantics; its
    // generation stays an invisible orphan for vacuum
    val v = ManifestLake.appendBatch(spark, dir, mk(100 until 105, 2),
      "ts", batchId = 5L,
      beforeCommit = () => {
        ManifestLake.appendBatch(spark, dir, mk(100 until 105, 2),
          "ts", batchId = 5L)
        ()
      })
    assert(v == 2L, "skip must report the winner's version")
    val got = ManifestLake.read(spark, dir)
    assert(got.count() == 15L, "replayed batch's data leaked in")
    assert(ManifestLake.snapshot(spark, dir).lastBatch == 5L)
    // an UNRELATED writer advancing the cursor past this id WITHOUT
    // committing it must refuse, not skip — a cursor-position-only
    // skip would silently drop this batch's data (review r13 #2)
    val boom = intercept[java.util.ConcurrentModificationException] {
      ManifestLake.appendBatch(spark, dir, mk(200 until 205, 3),
        "ts", batchId = 6L,
        beforeCommit = () => {
          ManifestLake.appendBatch(spark, dir, mk(300 until 305, 4),
            "ts", batchId = 9L)
          ()
        })
    }
    assert(boom.getMessage.contains("without committing it"),
      boom.getMessage)
    assert(ManifestLake.read(spark, dir).count() == 20L)
  }
}
