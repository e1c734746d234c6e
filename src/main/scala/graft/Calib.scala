package graft

/** Fixed-work CPU calibration shared by [[Bench]] and [[ScaleSmoke]],
  * recorded into every bench artifact so rounds on a shared, drifting
  * VM are comparable: `st` = single-thread wall (ms) for a fixed
  * integer-multiply loop (min of 3, after a JIT warm-up), `mt` = the
  * same TOTAL work split across all cores. An entry that doubled while
  * calib doubled is a slower HOST, not a slower operator — ratio
  * reports divide by it to separate the two.
  */
object Calib {

  /** Sink for burn() results — @volatile so the JIT cannot prove the
    * multiply loops dead and eliminate them (which would record a
    * near-zero calibration and silently invalidate cross-round host
    * comparisons). The value itself is meaningless. */
  @volatile private var sink: Long = 0L

  def calibrate(threads: Int): (Long, Long) = {
    val work = 400000000L // 4e8 multiply-adds
    def burn(n: Long, seed: Long): Long = {
      var s = seed; var i = 0L
      while (i < n) { s = s * 6364136223846793005L + 1442695040888963407L; i += 1 }
      s
    }
    sink ^= burn(work / 4, 1L) // JIT warm-up
    def st(): Long = {
      val t0 = System.nanoTime(); sink ^= burn(work, 2L)
      (System.nanoTime() - t0) / 1000000L
    }
    def mt(): Long = {
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { t =>
        val th = new Thread(() => { sink ^= burn(work / threads, t.toLong) })
        th.start(); th
      }
      ts.foreach(_.join())
      (System.nanoTime() - t0) / 1000000L
    }
    ((1 to 3).map(_ => st()).min, (1 to 3).map(_ => mt()).min)
  }
}
