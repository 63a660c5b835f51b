package graft.control

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Truth-table port of the trigger classification tests
  * (`/root/reference/test/price_zone/test_etl_trigger_lambda.py:7-37`)
  * plus completion-state-machine and archive coverage.
  */
class FileOpsSpec extends AnyFunSuite {

  private val partials = Seq("ctt", "itt")
  private val fulls = Seq("full_export", "monthly")

  test("prefix truth table: partial wins, then full, case-insensitive") {
    assert(FileClassifier.byPrefix("CTT_20200806.csv.gz", partials, fulls) ===
      ((true, false, Some("ctt"))))
    assert(FileClassifier.byPrefix("itt_x.csv", partials, fulls) === ((true, false, Some("itt"))))
    assert(FileClassifier.byPrefix("FULL_EXPORT_1.csv", partials, fulls) ===
      ((false, true, Some("full_export"))))
    assert(FileClassifier.byPrefix("random.csv", partials, fulls) === ((false, false, None)))
  }

  test("size fallback: above upper bound → full, otherwise partial") {
    val big = FileClassifier.classify("random.csv", 3_000_000_000L, partials, fulls, 0.5)
    assert(!big.partialLoad && big.matchedPrefix.isEmpty)
    val small = FileClassifier.classify("random.csv", 100_000_000L, partials, fulls, 0.5)
    assert(small.partialLoad)
    // prefix rules take precedence over size
    val bigButCtt = FileClassifier.classify("ctt_huge.csv", 30_000_000_000L, partials, fulls, 0.5)
    assert(bigButCtt.partialLoad)
    assert(big.sizeGb === 3_000_000_000L * 9.31 / 1e10)
  }

  test("completion: cluster reduce + cross-cluster status machine") {
    val cluster = Completion.reduceCluster(Seq("018", "019", "020"), Set("018", "019"))
    assert(cluster === Completion.ClusterResult(2, 1, Seq("018", "019"), Seq("020")))

    // other cluster fully done (3 ok of 6 total), ours has 1 failure → FAILED, no backup
    val d1 = Completion.decide(6, 3, 0, cluster)
    assert(d1.status === Completion.Failed && !d1.shouldBackup)

    // all six succeeded and we complete the set → SUCCEEDED + we back up
    val ok = Completion.reduceCluster(Seq("018", "019", "020"), Set("018", "019", "020"))
    val d2 = Completion.decide(6, 3, 0, ok)
    assert(d2.status === Completion.Succeeded && d2.shouldBackup)

    // other cluster not finished yet → RUNNING, and we must not back up
    val d3 = Completion.decide(6, 1, 0, ok)
    assert(d3.status === Completion.Running && !d3.shouldBackup)
  }

  test("archive validates count, move deletes source") {
    val src = Files.createTempDirectory("arch_src")
    val dst = Files.createTempDirectory("arch_dst").resolve("backup")
    Files.writeString(src.resolve("a.csv"), "1")
    Files.createDirectories(src.resolve("opco_id=019"))
    Files.writeString(src.resolve("opco_id=019/b.csv"), "2")

    assert(ArchiveUtil.countFiles(src.toString) === 2)
    val n = ArchiveUtil.move(src.toString, dst.toString)
    assert(n === 2)
    assert(!Files.exists(src))
    assert(ArchiveUtil.countFiles(dst.toString) === 2)
  }

  test("archive counts only the copied subtree when destination pre-exists") {
    val src = Files.createTempDirectory("arch_src2")
    val dst = Files.createTempDirectory("arch_dst2") // exists, non-empty
    Files.writeString(src.resolve("a.csv"), "1")
    Files.writeString(dst.resolve("old1.csv"), "x")
    Files.writeString(dst.resolve("old2.csv"), "y")
    // copy lands at dst/<srcName>; the two pre-existing files must not
    // count toward the validation
    val n = ArchiveUtil.archive(src.toString, dst.toString)
    assert(n === 1)
    assert(ArchiveUtil.countFiles(dst.resolve(src.getFileName.toString).toString) === 1)
  }
}
