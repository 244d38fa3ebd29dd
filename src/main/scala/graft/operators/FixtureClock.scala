package graft.operators

/** Fixture-vs-engine wall split for bench gates (r15 verdict item 5).
  *
  * The slowest commit gates (q108/q113/q114/q118/q134) spend most of
  * their wall time BUILDING multi-commit fixtures — bulk seed writes,
  * prologue indexes — which masks engine regressions inside the noise.
  * A gate wraps its fixture phase in [[time]]; [[graft.Bench]] resets
  * the accumulator before each rep and reports the split as
  * `fixture_s` in BENCH_FULL.json, so the tracked number is the
  * ENGINE seconds (wall − fixture). Verify ignores the clock entirely.
  *
  * Thread-safety: the accumulator is a single atomic — gates run one
  * at a time in Bench, and a fixture phase that internally fans out
  * Spark jobs still accounts once, from the driver thread that wraps
  * it. Nested [[time]] calls would double-count; gates wrap only
  * top-level fixture blocks. */
object FixtureClock {
  private val nanos = new java.util.concurrent.atomic.AtomicLong(0L)

  def reset(): Unit = nanos.set(0L)

  def seconds: Double = nanos.get / 1e9

  def time[T](body: => T): T = {
    val t0 = System.nanoTime()
    try body finally nanos.addAndGet(System.nanoTime() - t0)
  }
}
