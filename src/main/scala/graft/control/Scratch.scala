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

  /** A fresh temp directory, deleted (recursively) at JVM exit. */
  def dir(prefix: String): String = {
    hook
    val p = Files.createTempDirectory(prefix)
    dirs.synchronized(dirs += p)
    p.toString
  }
}
