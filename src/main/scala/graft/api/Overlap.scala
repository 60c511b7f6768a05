package graft.api

/** Concurrent-job overlap seam (optimization guide §2.6 "Overlap
  * independent jobs"): Spark's scheduler happily runs several jobs at
  * once inside one application — actions are only sequential because
  * driver code calls them sequentially. The daily pipelines write three
  * independent asset dirs per run whose WRITE jobs do not feed the next
  * stage (the next stage reads the in-memory barrier, not the file), so
  * the writes can run on a side thread while the driver thread plans
  * and runs the next stage's jobs — the write's tasks back-fill idle
  * cores behind the compute stage's tail.
  *
  * The caller MUST invoke the returned join function before the
  * written artifact is read (and before returning a frame whose
  * materialization reads it); join rethrows the write's failure so an
  * overlap cannot turn a failed write into silent data loss. */
object Overlap {
  /** Start `body` on a named daemon thread now; the returned function
    * joins it and rethrows any failure. */
  def background(name: String)(body: => Unit): () => Unit = {
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val t = new Thread(() => try body catch { case e: Throwable => err.set(e) },
      s"graft-overlap-$name")
    t.setDaemon(true)
    t.start()
    () => {
      t.join()
      val e = err.get()
      if (e != null) throw e
    }
  }
}
