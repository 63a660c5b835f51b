package graft.control

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}

/** S8 — archival file operations (SURVEY.md §2.1): copy-with-count
  * validation and recursive delete, the reference's post-run
  * archival/cleanup (`/root/reference/src/util/move_s3_objects.py:6-101`,
  * drivers `src/price_zone/data_backup_job.py:51-71`). Implemented on
  * the Hadoop `FileSystem` API so the same code runs against local
  * paths, HDFS, or any object-store connector on the cluster classpath.
  */
object ArchiveUtil {

  private def fs(path: Path, conf: Configuration): FileSystem = path.getFileSystem(conf)

  /** Recursive file count under a prefix (dirs excluded). */
  def countFiles(dir: String, conf: Configuration = new Configuration()): Long = {
    val p = new Path(dir)
    val f = fs(p, conf)
    if (!f.exists(p)) 0L
    else {
      val it = f.listFiles(p, true)
      var n = 0L
      while (it.hasNext) { it.next(); n += 1 }
      n
    }
  }

  /** Copy a prefix tree and validate the destination file count matches
    * the source (the reference's copy-validation contract,
    * `move_s3_objects.py:33-58`). Throws on mismatch. Counts only the
    * copied subtree — Hadoop's `FileUtil.copy` lands the tree at
    * `dst/<srcName>` when `dst` already exists as a directory, and at
    * `dst` otherwise — so pre-existing destination files can never mask
    * a partial copy. */
  def archive(srcDir: String, dstDir: String, conf: Configuration = new Configuration()): Long = {
    val src = new Path(srcDir)
    val dst = new Path(dstDir)
    val sfs = fs(src, conf)
    val dfs = fs(dst, conf)
    val expected = countFiles(srcDir, conf)
    val copyRoot =
      if (dfs.exists(dst) && dfs.getFileStatus(dst).isDirectory && sfs.getFileStatus(src).isDirectory)
        new Path(dst, src.getName)
      else dst
    FileUtil.copy(sfs, src, dfs, dst, false, true, conf)
    val copied = countFiles(copyRoot.toString, conf)
    if (copied < expected)
      throw new IllegalStateException(
        s"archive validation failed: copied $copied of $expected files from $srcDir to $copyRoot")
    copied
  }

  /** Recursive delete (`move_s3_objects.py:61-101`). */
  def deleteRecursively(dir: String, conf: Configuration = new Configuration()): Boolean = {
    val p = new Path(dir)
    val f = fs(p, conf)
    !f.exists(p) || f.delete(p, true)
  }

  /** Move = archive + delete source, the backup job's composition
    * (`data_backup_job.py:51-71`). */
  def move(srcDir: String, dstDir: String, conf: Configuration = new Configuration()): Long = {
    val n = archive(srcDir, dstDir, conf)
    deleteRecursively(srcDir, conf)
    n
  }
}
