package graft

/** Shared bench plumbing: host-load capture and temp cleanup.
  *
  * Load capture is round-9 verdict item 3: the canary-spread gate
  * provably misses a UNIFORMLY noisy host — a uniform noise floor slows
  * the canary and the queries alike, so max/min spread stays near 1 on
  * a run that is 2× slow end to end (SCALE.md, round-9 fleet-bench
  * section). `/proc/loadavg`'s 1-minute field sampled BEFORE the bench
  * does any work is the direct signal: at that moment this JVM
  * contributes ~nothing, so significant load is a neighbor. The end
  * sample is recorded for context only (it includes our own 32 threads
  * and is NOT a contention signal by itself).
  */
object BenchUtil {
  /** 1-minute loadavg, or -1.0 where /proc/loadavg doesn't exist. */
  def loadAvg1m(): Double =
    try {
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")))
        .trim.split("\\s+")(0).toDouble
    } catch { case _: Throwable => -1.0 }

  /** Pre-run load above this fraction of the core count flags the run
    * contended. 25% of cores idle-before-start is far above any
    * self-inflicted load (the JVM is single-threaded at sample time)
    * and far below the bench's own steady state, so it separates the
    * two regimes cleanly. */
  def loadContended(loadStart: Double, cpus: Int): Boolean =
    loadStart > 0.25 * cpus

  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete()
  }
}
