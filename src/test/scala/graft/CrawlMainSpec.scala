package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.icelite.IceLite

/** The spark-submit entry (`graft.CrawlMain`): a fresh submit crawls
  * the corpus to drain; resubmitting against the same store resumes
  * from the committed head and, with the frontier drained, commits
  * nothing new — the kill-and-resubmit operational loop. */
class CrawlMainSpec extends AnyFunSuite {

  test("driver contract: SparkEntry.entry returns rows at sf0.001") {
    // the driver smoke-checks rows > 0; pin it so a registry or
    // flagship-query change can never silently break the contract
    assert(SparkEntry.entry(SparkTestBase.spark).count() > 0)
  }

  test("fresh submit crawls to drain; resubmit resumes as a no-op") {
    SparkTestBase.spark // the builder in main getOrCreate()s this session
    val root = Files.createTempDirectory("crawlmain").toString
    val args = Array("--store", root, "--max-waves", "60",
      "--partitions", "8", "--synthetic", "seed=7,hosts=4,pages=300")
    try {
      CrawlMain.main(args)
      val ice = new IceLite(root)
      val fetched = ice.tableStat("fetchlog").map(_._1).getOrElse(0L)
      val frontier = ice.tableStat("frontier").map(_._1).getOrElse(0L)
      assert(fetched > 0, "nothing fetched on a fresh submit")
      assert(frontier >= fetched, "frontier must cover every fetched url")
      val head = ice.currentSnapshotId
      CrawlMain.main(args)
      assert(new IceLite(root).currentSnapshotId == head,
        "resubmit after drain must not commit new snapshots")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }
}
