package graft.core

import java.util.concurrent.CountDownLatch
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec

/** [[SessionMemo]] — the bounded, weak-session replacement for the bare
  * `TrieMap[(SparkSession, dir, key), V]` memos (round 12): a rotating-
  * data-dir BI session must not accumulate one checkpointed table per
  * dataset it ever touched, and eviction must be GC-mediated (dropping
  * the reference), never an eager release a live consumer could trip on.
  */
class SessionMemoSpec extends SparkSpec {

  test("caps entries per session, evicting least-recently-used first") {
    val memo = new SessionMemo[String, Int](3)
    val builds = new AtomicInteger(0)
    def get(k: String): Int =
      memo.getOrBuild(spark, k) { builds.incrementAndGet(); k.length }
    get("a"); get("bb"); get("ccc")
    assert(memo.size(spark) == 3 && builds.get() == 3)
    get("a") // touch: "a" becomes most-recent; "bb" is now eldest
    get("dddd") // overflow evicts "bb"
    assert(memo.size(spark) == 3)
    assert(get("a") == 1 && builds.get() == 4, "touched entry was evicted")
    assert(get("bb") == 2 && builds.get() == 5, "evicted entry must rebuild")
  }

  test("a memoized value builds once even under concurrent first access") {
    val memo = new SessionMemo[String, Long](8)
    val builds = new AtomicInteger(0)
    val start = new CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    val threads = (1 to 8).map { _ =>
      val t = new Thread(() => {
        start.await()
        results.add(memo.getOrBuild(spark, "k") {
          builds.incrementAndGet(); Thread.sleep(50); 42L
        })
      })
      t.start(); t
    }
    start.countDown()
    threads.foreach(_.join(30000))
    assert(results.size == 8 && results.stream().allMatch(_ == 42L))
    assert(builds.get() == 1, s"raced first build ran ${builds.get()} times")
  }

  test("evicted checkpoint blocks are reclaimed once unreferenced (GC-mediated)") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    val memo = new SessionMemo[Int, org.apache.spark.sql.DataFrame](2)
    // build 6 checkpointed tables through a cap-2 memo; hold NO refs
    (1 to 6).foreach { i =>
      memo.getOrBuild(spark, i)(
        spark.range(100 + i).toDF("v").localCheckpoint()).count()
    }
    assert(memo.size(spark) == 2, "cap did not hold")
    // 4 evicted entries are unreachable -> the weak-valued registry +
    // ContextCleaner reclaim their blocks after GC; the 2 residents stay
    val deadline = System.nanoTime() + 30L * 1000000000L
    var leaked = (sc.getPersistentRDDs.keySet.toSet -- before).size
    while (leaked > 2 && System.nanoTime() < deadline) {
      System.gc()
      Thread.sleep(500)
      leaked = (sc.getPersistentRDDs.keySet.toSet -- before).size
    }
    assert(leaked <= 2,
      s"evicted memo checkpoints were not reclaimed: $leaked blocks remain")
    // the residents must still be readable (eviction never releases)
    assert(memo.getOrBuild(spark, 6)(fail("resident rebuilt")).count() == 106)
  }
}
