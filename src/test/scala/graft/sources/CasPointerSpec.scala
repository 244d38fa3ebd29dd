package graft.sources

import java.nio.charset.StandardCharsets
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

import ConditionalPut._

/** The object-store publish protocol: concurrent pointer publishes
  * through conditional puts lose NO update, while blind puts (what a
  * rename-less store does without preconditions) demonstrably do. */
class CasPointerSpec extends AnyFunSuite {

  private def utf8(b: Array[Byte]) = new String(b, StandardCharsets.UTF_8)

  test("concurrent read-modify-write publishers: every update survives") {
    val store = new MemoryStore
    val key = "table/_graft_generation"
    val threads = 16
    val perThread = 25
    val pool = Executors.newFixedThreadPool(threads)
    val start = new CountDownLatch(1)
    val done = new CountDownLatch(threads)
    (0 until threads).foreach { t =>
      pool.execute { () =>
        start.await()
        try (0 until perThread).foreach { i =>
          // each publisher appends its own line — a lost update would
          // erase somebody's line forever
          update(store, key, maxRetries = 10000)(cur =>
            cur.getOrElse("") + s"t$t-i$i\n")
        } finally done.countDown()
      }
    }
    start.countDown()
    assert(done.await(60, TimeUnit.SECONDS), "publishers wedged")
    pool.shutdown()
    val lines = utf8(store.get(key).get._1).split("\n").filter(_.nonEmpty)
    assert(lines.length == threads * perThread,
      s"lost updates: ${threads * perThread - lines.length} of ${threads * perThread}")
    assert(lines.toSet.size == threads * perThread, "duplicated lines")
  }

  test("blind puts lose updates under the same interleaving (why CAS exists)") {
    val store = new MemoryStore
    val key = "k"
    // the classic two-writer interleaving, made deterministic:
    // both read the same version, both write — last writer wins
    val v0 = store.get(key).map(c => utf8(c._1)).getOrElse("")
    store.putBlind(key, (v0 + "A\n").getBytes(StandardCharsets.UTF_8))
    store.putBlind(key, (v0 + "B\n").getBytes(StandardCharsets.UTF_8))
    assert(utf8(store.get(key).get._1) == "B\n", "A's update was silently erased")
    // the SAME interleaving through conditional puts: the second writer's
    // precondition fails instead of erasing A
    val store2 = new MemoryStore
    val e1 = store2.putIf(key, None, "A\n".getBytes(StandardCharsets.UTF_8))
    assert(e1.isDefined)
    assert(store2.putIf(key, None, "B\n".getBytes(StandardCharsets.UTF_8)).isEmpty,
      "create-if-absent must fail once the object exists")
    assert(store2.putIf(key, Some("bogus"), "B\n".getBytes(StandardCharsets.UTF_8)).isEmpty,
      "If-Match on a stale etag must fail")
    assert(utf8(store2.get(key).get._1) == "A\n")
  }

  test("swapPointer: advance only from the expected generation") {
    val store = new MemoryStore
    val key = "t/_graft_generation"
    // first publish: table must be un-pointed
    assert(swapPointer(store, key, None, "gen-001"))
    // a second creator loses
    assert(!swapPointer(store, key, None, "gen-001b"))
    // advance from the live generation
    assert(swapPointer(store, key, Some("gen-001"), "gen-002"))
    // a writer still based on gen-001 must NOT clobber gen-002 — it has
    // to rebase its generation first
    assert(!swapPointer(store, key, Some("gen-001"), "gen-003"))
    assert(utf8(store.get(key).get._1) == "gen-002")
  }

  test("swapPointer under concurrency: exactly one winner per generation") {
    val store = new MemoryStore
    val key = "t/_graft_generation"
    assert(swapPointer(store, key, None, "gen-000"))
    val threads = 12
    val pool = Executors.newFixedThreadPool(threads)
    val start = new CountDownLatch(1)
    val done = new CountDownLatch(threads)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    (0 until threads).foreach { t =>
      pool.execute { () =>
        start.await()
        try {
          // everyone tries to advance FROM gen-000; exactly one may win
          if (swapPointer(store, key, Some("gen-000"), s"gen-by-$t"))
            wins.incrementAndGet()
        } finally done.countDown()
      }
    }
    start.countDown()
    assert(done.await(30, TimeUnit.SECONDS))
    pool.shutdown()
    assert(wins.get() == 1, s"${wins.get()} writers advanced from the same base")
    assert(utf8(store.get(key).get._1).startsWith("gen-by-"))
  }

  // ---- the same contract against the REAL Hadoop-FS adapter ----------------
  // HadoopFsStore is the production bridge (lock-serialized CAS over
  // atomic create/rename); it must satisfy every guarantee the protocol
  // spec proved on MemoryStore.

  private def fsStore(): (ConditionalPut.HadoopFsStore, String) = {
    val dir = java.nio.file.Files.createTempDirectory("cas-fs").toString
    (new HadoopFsStore(new org.apache.hadoop.conf.Configuration()), dir)
  }

  test("HadoopFsStore: concurrent read-modify-write publishers lose nothing") {
    val (store, dir) = fsStore()
    val key = s"$dir/_graft_generation"
    val threads = 8
    val perThread = 10
    val pool = Executors.newFixedThreadPool(threads)
    val start = new CountDownLatch(1)
    val done = new CountDownLatch(threads)
    (0 until threads).foreach { t =>
      pool.execute { () =>
        start.await()
        try (0 until perThread).foreach { i =>
          update(store, key, maxRetries = 10000)(cur =>
            cur.getOrElse("") + s"t$t-i$i\n")
        } finally done.countDown()
      }
    }
    start.countDown()
    assert(done.await(120, TimeUnit.SECONDS), "publishers wedged")
    pool.shutdown()
    val lines = utf8(store.get(key).get._1).split("\n").filter(_.nonEmpty)
    assert(lines.length == threads * perThread,
      s"lost updates: ${threads * perThread - lines.length} of ${threads * perThread}")
    assert(lines.toSet.size == threads * perThread, "duplicated lines")
  }

  test("HadoopFsStore: preconditions hold (create-if-absent, If-Match)") {
    val (store, dir) = fsStore()
    val key = s"$dir/k"
    val e1 = store.putIf(key, None, "A\n".getBytes(StandardCharsets.UTF_8))
    assert(e1.isDefined)
    assert(store.putIf(key, None, "B\n".getBytes(StandardCharsets.UTF_8)).isEmpty,
      "create-if-absent must fail once the object exists")
    assert(store.putIf(key, Some("bogus"), "B\n".getBytes(StandardCharsets.UTF_8)).isEmpty,
      "If-Match on a stale etag must fail")
    assert(utf8(store.get(key).get._1) == "A\n")
    // If-Match on the REAL etag succeeds
    assert(store.putIf(key, e1, "C\n".getBytes(StandardCharsets.UTF_8)).isDefined)
    assert(utf8(store.get(key).get._1) == "C\n")
  }

  test("HadoopFsStore: swapPointer semantics and single-winner concurrency") {
    val (store, dir) = fsStore()
    val key = s"$dir/_graft_generation"
    assert(swapPointer(store, key, None, "gen-000"))
    assert(!swapPointer(store, key, None, "gen-000b"))
    val threads = 8
    val pool = Executors.newFixedThreadPool(threads)
    val start = new CountDownLatch(1)
    val done = new CountDownLatch(threads)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    (0 until threads).foreach { t =>
      pool.execute { () =>
        start.await()
        try {
          if (swapPointer(store, key, Some("gen-000"), s"gen-by-$t"))
            wins.incrementAndGet()
        } finally done.countDown()
      }
    }
    start.countDown()
    assert(done.await(60, TimeUnit.SECONDS))
    pool.shutdown()
    assert(wins.get() == 1, s"${wins.get()} writers advanced from the same base")
    assert(utf8(store.get(key).get._1).startsWith("gen-by-"))
  }

  test("HadoopFsStore: a crashed holder's stale lock is broken, fresh ones are not") {
    // Deterministic by construction — NO wall-clock races. Freshness uses
    // a 60 s timeout (no scheduler pause on this box approaches that);
    // staleness is manufactured by explicitly backdating the lock's
    // mtime, not by sleeping past a 50 ms window.
    val (_, dir) = fsStore()
    val conf = new org.apache.hadoop.conf.Configuration()
    val timeoutMs = 60000L
    val store = new HadoopFsStore(conf, lockTimeoutMs = timeoutMs)
    val key = s"$dir/p"
    // simulate a crashed CAS: the lock exists, its holder is gone
    val lock = new org.apache.hadoop.fs.Path(s"$dir/.p.cas-lock")
    val fs = lock.getFileSystem(conf)
    val out = AtomicPublish.createStream(conf, lock, overwrite = false)
    out.write('1'.toByte); out.close()
    // fresh lock: precondition failure, no break
    assert(store.putIf(key, None, "x".getBytes(StandardCharsets.UTF_8)).isEmpty)
    assert(fs.exists(lock), "a fresh lock must not be broken")
    // backdate the lock well past the staleness horizon — what a crashed
    // holder's abandoned lock looks like after the timeout elapses
    fs.setTimes(lock, System.currentTimeMillis() - 2 * timeoutMs, -1)
    assert(store.putIf(key, None, "x".getBytes(StandardCharsets.UTF_8)).isDefined,
      "stale lock must be broken after the timeout")
  }

  test("the CAS loop refuses to spin forever") {
    // a store whose preconditions always fail (someone else always wins)
    val hostile = new ObjectStore {
      private val inner = new MemoryStore
      def get(key: String) = inner.get(key)
      def putIf(key: String, expect: Option[Etag], bytes: Array[Byte]) = {
        inner.putBlind(key, "interloper".getBytes(StandardCharsets.UTF_8))
        None
      }
    }
    val e = intercept[graft.format.OliveFormatException](
      update(hostile, "k", maxRetries = 5)(_ => "mine"))
    assert(e.getMessage.contains("lost 5 races"))
  }
}
