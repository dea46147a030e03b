package graft.operators

import java.util.concurrent.{CountDownLatch, TimeUnit}

import graft.SparkSpec

/** SessionMemo's locking contract (ADVICE r10): the memo-wide monitor
  * only installs holders — a slow build (BPE training is a full
  * iterative Spark loop) must not block an unrelated (session, dir)
  * entry, while racing callers of the SAME key still build once. */
class SessionMemoSpec extends SparkSpec {

  test("a slow build does not block other keys; same key builds once") {
    val memo = new SessionMemo[String]
    val slowEntered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    @volatile var slowResult: String = null
    val slow = new Thread(() => {
      slowResult = memo.getOrElseUpdate(spark, "/dir/slow") {
        slowEntered.countDown()
        // a build that takes as long as a training loop does
        assert(release.await(30, TimeUnit.SECONDS), "never released")
        "slow-done"
      }
    })
    slow.start()
    assert(slowEntered.await(10, TimeUnit.SECONDS), "slow build never started")
    // while the slow build is IN PROGRESS, an unrelated key completes
    val other = memo.getOrElseUpdate(spark, "/dir/other")("other-done")
    assert(other == "other-done",
      "unrelated key blocked behind an in-flight build")
    release.countDown()
    slow.join(10000)
    assert(slowResult == "slow-done")

    // once-only per key: concurrent callers of one NEW key see one build
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val start = new CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val racers = (1 to 8).map(_ => new Thread(() => {
      start.await()
      results.add(memo.getOrElseUpdate(spark, "/dir/raced") {
        builds.incrementAndGet(); "raced-done"
      })
    }))
    racers.foreach(_.start())
    start.countDown()
    racers.foreach(_.join(10000))
    assert(results.size == 8 && results.toArray.forall(_ == "raced-done"))
    assert(builds.get() == 1, s"build ran ${builds.get()} times for one key")
  }
}
