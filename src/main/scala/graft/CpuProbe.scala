package graft

/** Raw CPU-scaling probe (no Spark): total XXH64 throughput at several thread
 *  counts — establishes the machine's deliverable parallelism ceiling, which
 *  bounds any measurable Spark scaling efficiency in this sandbox. */
object CpuProbe {
  def main(args: Array[String]): Unit = {
    val buf = Array.tabulate[Byte](4096)(i => (i * 31).toByte)
    def work(iters: Long): Long = {
      var h = 0L; var i = 0L
      while (i < iters) { h ^= graft.functions.XXHash64.hash(buf, i); i += 1 }
      h
    }
    work(2000000) // warmup (JIT)
    for (threads <- Seq(32, 16, 8, 4, 2, 1, 8, 16, 32)) {
      val iters = 1000000L
      val t0 = System.nanoTime()
      val ts = (1 to threads).map { _ =>
        val t = new Thread(() => { work(iters) })
        t.start(); t
      }
      ts.foreach(_.join())
      val dt = (System.nanoTime() - t0) / 1e9
      val rate = threads * iters / dt / 1e6
      println(f"[cpu] threads=$threads%2d  ${rate}%8.1f Mhash/s  (${dt}%.2f s)")
    }
  }
}
