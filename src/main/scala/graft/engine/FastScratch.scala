package graft.engine

/**
 * Fast scratch space for bench/verify runs: streaming checkpoints, temp
 * sinks, and shuffle spill are run-visible I/O, and on this host `/tmp`
 * is disk-backed ext4 while `/dev/shm` is tmpfs. Pointing
 * `java.io.tmpdir` (where every `Files.createTempDirectory` sink and
 * checkpoint lands) and `spark.local.dir` (shuffle/spill) at tmpfs is the
 * local-mode analogue of a cluster's fast local disks — the same knob for
 * the same reason, not a benchmark trick: production Spark deployments
 * put local dirs on NVMe precisely because state-store and shuffle I/O is
 * on the critical path. Falls back silently when `/dev/shm` is absent
 * (the behavior is then exactly the pre-r04 one).
 */
object FastScratch {

  /** Point tmpdir at the DETERMINISTIC scratch root (creating it) and
    * return it, or None when unavailable. The root is fixed — not a
    * per-run random dir — so cross-run caches keyed off `java.io.tmpdir`
    * (q52's amortized bucketed copies, the q86/q87 fixtures, all named
    * `graft_*`) keep amortizing exactly as they did under /tmp.
    *
    * tmpfs is RAM: unlike /tmp, leftover per-run output (random-suffix
    * sink/checkpoint dirs) must not accumulate across runs, so init
    * sweeps every child EXCEPT the deterministic `graft_*` caches before
    * handing the root out. Concurrent runs are not a concern here — the
    * driver runs Bench/Verify serially, and a sweep mid-run could only
    * affect another process's already-written temp output, the same
    * exposure a /tmp cleaner has. */
  def init(): Option[String] = {
    val shm = new java.io.File("/dev/shm")
    if (!shm.isDirectory || !shm.canWrite) None
    else {
      val dir = new java.io.File(shm, "graft-scratch")
      dir.mkdirs()
      Option(dir.listFiles()).foreach(_.foreach { child =>
        if (!child.getName.startsWith("graft_")) delete(child)
      })
      System.setProperty("java.io.tmpdir", dir.toString)
      Some(dir.toString)
    }
  }

  private def delete(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(delete))
    f.delete(): Unit
  }
}
