package graft.control

import java.nio.file.{Files, Path}

/** Tracked scratch directories for operators that materialize to local
  * disk mid-query (v6's CSV round trip, v7's ORC round trip): every dir
  * is registered for recursive deletion at JVM shutdown, so repeated
  * gate/bench invocations in one process — and the process itself —
  * cannot leak a growing pile of table copies into the temp filesystem.
  * (`File.deleteOnExit` can't do this: it only removes paths known at
  * registration time, not files the write produces later.)
  */
object Scratch {

  private val dirs = scala.collection.mutable.ArrayBuffer.empty[Path]

  private lazy val hook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      dirs.synchronized(dirs.foreach(delete))))
    ()
  }

  private def delete(p: Path): Unit = {
    val f = p.toFile
    Option(f.listFiles()).foreach(_.foreach(c => delete(c.toPath)))
    f.delete()
    ()
  }

  /** Preferred scratch base: tmpfs, when the host has one with ≥2 GB
    * of headroom. Scratch dirs back the disk-bound gates (the v6/v7/v8
    * table round trips, st13's parquet lake) whose medians otherwise
    * absorb host fsync latency — measured as the r7 bench's ~7%
    * run-to-run spread with d5 moving 2.8→4.8 s on no code change.
    * Everything here is bytes-bounded (gate-scale table copies) and
    * deleted at JVM exit by the hook above; the headroom guard keeps a
    * small /dev/shm from trading fsync latency for memory pressure
    * (the same policy as the streaming checkpoints' guarded tmpfs). */
  private def tmpfsBase: Option[Path] = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite &&
        shm.getUsableSpace > 2L * 1024 * 1024 * 1024) {
      val b = new java.io.File(shm, "graft_scratch")
      if (b.isDirectory || b.mkdirs()) Some(b.toPath) else None
    } else None
  }

  /** A fresh temp directory, deleted (recursively) at JVM exit. */
  def dir(prefix: String): String = {
    hook
    val p = tmpfsBase.fold(Files.createTempDirectory(prefix))(
      b => Files.createTempDirectory(b, prefix))
    dirs.synchronized(dirs += p)
    p.toString
  }
}
