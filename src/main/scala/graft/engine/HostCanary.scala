package graft.engine

/** Host-speed canary shared by the measurement harnesses (Bench, the
  * stream yardstick): a fixed 2e9-step-per-thread xorshift loop whose wall
  * time tracks effective clock speed and all-core contention. Yardstick
  * totals are only comparable across rounds modulo host speed — rounds
  * 7–9 each measured broad inflation episodes on an "idle" host — so every
  * recorded figure must carry BRACKETED samples (before and after the
  * measured work, single- and all-threads) in the same record it could
  * have inflated. A drift episode then shows up as post > pre or
  * mt-per-thread >> single.
  */
object HostCanary {
  /** Wall seconds for `threads` concurrent 2e9-step xorshift loops. */
  def once(threads: Int): Double = {
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { tid =>
      val th = new Thread(() => {
        var x = 0x9E3779B97F4A7C15L ^ tid; var i = 0L
        while (i < 2000000000L) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
        if (x == 0) System.err.println("")  // keep the loop live under JIT
      })
      th.start(); th
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }
}
