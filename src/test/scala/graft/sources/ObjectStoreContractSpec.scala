package graft.sources

import java.nio.charset.StandardCharsets
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

import ConditionalPut._
import NativeCas._

/** The CAS pointer-publish contract, run as a MATRIX over every
  * [[ConditionalPut.ObjectStore]] implementation — the in-memory
  * reference, both native-precondition clients (S3 etag shape, GCS
  * generation shape), and the Hadoop-FS fallback — then again with
  * transport faults injected: responses lost AFTER the server applied
  * the write, forcing the native clients through ambiguity recovery.
  * The bar everywhere: 16 racers × 25 read-modify-writes, zero lost
  * updates, zero duplicates. */
class ObjectStoreContractSpec extends AnyFunSuite {

  private def utf8(b: Array[Byte]) = new String(b, StandardCharsets.UTF_8)

  private def stores(): Seq[(String, () => ObjectStore)] = Seq(
    ("MemoryStore", () => new MemoryStore),
    ("S3CasStore", () => new S3CasStore(new FakeVersionedStore)),
    ("GcsCasStore", () => new GcsCasStore(new FakeVersionedStore)),
    ("HadoopFsStore", () => new HadoopFsStore(
      new org.apache.hadoop.conf.Configuration)))

  private def keyFor(name: String): String =
    if (name == "HadoopFsStore")
      java.nio.file.Files.createTempDirectory("cas-matrix").toString + "/ptr"
    else "table/_graft_generation"

  // ---- preconditions hold on every implementation --------------------------

  for ((name, mk) <- stores())
    test(s"$name: create-if-absent and If-Match preconditions hold") {
      val store = mk()
      val key = keyFor(name)
      val e1 = store.putIf(key, None, "A\n".getBytes(StandardCharsets.UTF_8))
      assert(e1.isDefined)
      assert(store.putIf(key, None, "B\n".getBytes(StandardCharsets.UTF_8)).isEmpty,
        "create-if-absent must fail once the object exists")
      assert(store.putIf(key, Some("999999"), "B\n".getBytes(StandardCharsets.UTF_8)).isEmpty,
        "If-Match on a stale version token must fail")
      assert(utf8(store.get(key).get._1) == "A\n")
      assert(store.putIf(key, e1, "C\n".getBytes(StandardCharsets.UTF_8)).isDefined,
        "If-Match on the live version token must succeed")
      assert(utf8(store.get(key).get._1) == "C\n")
    }

  // ---- concurrent RMW: every update survives, on every implementation ------

  private def raceRmw(store: ObjectStore, key: String, threads: Int,
      perThread: Int, withLandedPredicate: Boolean): Unit = {
    val pool = Executors.newFixedThreadPool(threads)
    val start = new CountDownLatch(1)
    val done = new CountDownLatch(threads)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    (0 until threads).foreach { t =>
      pool.execute { () =>
        start.await()
        try (0 until perThread).foreach { i =>
          val line = s"t$t-i$i\n"
          val landed: String => Boolean =
            if (withLandedPredicate) (cur: String) => cur.contains(line) else null
          update(store, key, maxRetries = 100000, landed = landed)(cur =>
            cur.getOrElse("") + line)
        } catch { case e: Throwable => failures.add(e) }
        finally done.countDown()
      }
    }
    start.countDown()
    assert(done.await(120, TimeUnit.SECONDS), "publishers wedged")
    pool.shutdown()
    assert(failures.isEmpty, s"racer failed: ${Option(failures.peek())}")
    val lines = utf8(store.get(key).get._1).split("\n").filter(_.nonEmpty)
    assert(lines.length == threads * perThread,
      s"lost updates: ${threads * perThread - lines.length} of ${threads * perThread}")
    assert(lines.toSet.size == threads * perThread, "duplicated lines")
  }

  for ((name, mk) <- stores()) {
    val n = if (name == "HadoopFsStore") 8 else 16 // fs lock path is slower
    val per = if (name == "HadoopFsStore") 10 else 25
    test(s"$name: $n×$per concurrent RMW publishers lose nothing") {
      raceRmw(mk(), keyFor(name), n, per, withLandedPredicate = false)
    }
  }

  // ---- crash injection: responses lost after server apply ------------------

  for ((name, mkPair) <- Seq[(String, () => (FakeVersionedStore, ObjectStore))](
    ("S3CasStore", () => { val s = new FakeVersionedStore; (s, new S3CasStore(s)) }),
    ("GcsCasStore", () => { val s = new FakeVersionedStore; (s, new GcsCasStore(s)) }))) {

    test(s"$name: lost response on an uncontended put recovers to Committed") {
      val (svc, store) = mkPair()
      svc.injectResponseLoss(1) // every successful put's response is lost
      val key = "t/_graft_generation"
      // no concurrent writer → recovery must prove the write landed
      store.putIfChecked(key, None, "gen-001".getBytes(StandardCharsets.UTF_8)) match {
        case Committed(_) => // recovered
        case other => fail(s"expected Committed after recovery, got $other")
      }
      assert(utf8(store.get(key).get._1) == "gen-001")
    }

    test(s"$name: superseded-during-recovery surfaces as Unknown, " +
        "and update() without an idempotency predicate refuses to guess") {
      val (svc, store0) = mkPair()
      // a hostile transport: our put applies, the response is lost, and
      // BEFORE our recovery GET a rival replaces the object — recovery
      // cannot prove anything → Unknown is the only honest answer
      val hostile = new VersionedStoreService {
        def getObject(key: String) = svc.getObject(key)
        def putObject(key: String, bytes: Array[Byte], pre: Precondition) = {
          val r = svc.putObject(key, bytes, pre)
          r match {
            case ServerStored(_, gen) =>
              svc.putObject(key, "rival".getBytes(StandardCharsets.UTF_8),
                IfGeneration(gen))
              throw new ResponseLostException("injected")
            case _ => r
          }
        }
      }
      val store = store0 match {
        case _: S3CasStore => new S3CasStore(hostile)
        case _ => new GcsCasStore(hostile)
      }
      assert(store.putIfChecked("k", None,
        "mine".getBytes(StandardCharsets.UTF_8)) == Unknown)
      intercept[AmbiguousCommitException] {
        update(store, "k2")(cur => cur.getOrElse("") + "x\n")
      }
    }

    test(s"$name: 16×25 racers with every 3rd response lost — zero lost updates") {
      val (svc, store) = mkPair()
      svc.injectResponseLoss(3)
      raceRmw(store, "t/_graft_generation", 16, 25, withLandedPredicate = true)
    }

    test(s"$name: swapPointer under response loss still single-winner") {
      val (svc, store) = mkPair()
      svc.injectResponseLoss(2)
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
  }
}
