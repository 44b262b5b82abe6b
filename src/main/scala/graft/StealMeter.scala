package graft

/** Hypervisor CPU-steal sampler for the timing harnesses.
  *
  * The bench box is a VM on an overcommitted host: co-tenant VMs
  * steal cycles in bursts that inflate measured wall times 2-20x
  * while the guest's OWN load average stays low (steal is not a
  * runnable process — `getSystemLoadAverage` is blind to it; r15
  * measured a suite at 303 s during a window whose cumulative steal
  * equalled ~94% of cumulative user time, on code that benches
  * ~200 s quiet). Reading `/proc/stat`'s `st` column before/after a
  * measured region self-documents the pollution: a per-query number
  * recorded at 40% steal is the co-tenant's number, not the plan's.
  *
  * Counters are cumulative jiffies since boot; a sample is the delta
  * between two snapshots. Non-Linux (no /proc/stat) degrades to -1.
  */
private[graft] object StealMeter {

  /** (stealJiffies, totalJiffies) cumulative since boot, or None. */
  def snapshot(): Option[(Long, Long)] = try {
    val src = scala.io.Source.fromFile("/proc/stat")
    val line = try src.getLines().find(_.startsWith("cpu ")) finally src.close()
    line.map { l =>
      // cpu user nice system idle iowait irq softirq steal guest gnice
      val f = l.trim.split("\\s+").drop(1).map(_.toLong)
      (if (f.length > 7) f(7) else 0L, f.sum)
    }
  } catch { case _: Throwable => None }

  /** Steal fraction of all CPU time between two snapshots, in
    * [0, 1]; -1 when unavailable or the interval is empty. */
  def fraction(before: Option[(Long, Long)],
               after: Option[(Long, Long)]): Double =
    (before, after) match {
      case (Some((s0, t0)), Some((s1, t1))) if t1 > t0 =>
        (s1 - s0).toDouble / (t1 - t0)
      case _ => -1.0
    }
}
