package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.icelite.IceLite

class IceLiteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("multi-table commit is atomic and time-travelable") {
    val root = Files.createTempDirectory("icelite").toString
    val store = new IceLite(root)

    val s1 = store.commit(Seq(
      "a" -> Seq((1L, "x")).toDF("id", "v"),
      "b" -> Seq((10L, 1.5)).toDF("id", "w")), Map("wave" -> "1"))
    val s2 = store.commit(Seq(
      "a" -> Seq((2L, "y")).toDF("id", "v")), Map("wave" -> "2"))

    assert(store.currentSnapshotId.contains(s2))
    // head sees both deltas of a, one of b
    assert(store.read(spark, "a").count() == 2)
    assert(store.read(spark, "b").count() == 1)
    // time travel to s1: only first delta of a
    assert(store.read(spark, "a", Some(s1)).count() == 1)
    assert(store.commitMeta(s1)("wave") == "1")
    assert(store.history == Seq(s2, s1))
  }

  test("uncommitted data dirs are invisible (crash mid-commit)") {
    val root = Files.createTempDirectory("icelite").toString
    val store = new IceLite(root)
    store.commit(Seq("a" -> Seq((1L, "x")).toDF("id", "v")))
    // simulate a crash: a writer dumped data for snapshot 2 but died
    // before the manifest/head swap
    Seq((99L, "orphan")).toDF("id", "v").write.parquet(s"$root/a/d2")
    assert(store.read(spark, "a").count() == 1)
    assert(store.currentSnapshotId.contains(1L))
    // a fresh commit after the crash does not resurrect the orphan —
    // it writes data under the next id; commit() must not collide
    val s = new IceLite(root)
    // (the orphan dir d2 exists; commit with id 2 would collide — the
    // layer overwrites it, which is exactly the wave-retry semantics:
    // the re-run wave replaces the partial output)
    val s2 = s.commit(Seq("a" -> Seq((2L, "y")).toDF("id", "v")))
    assert(s.read(spark, "a").count() == 2)
    assert(s.read(spark, "a").where($"v" === "orphan").count() == 0)
  }

  test("compact: rewrites N delta dirs to one, preserves rows + time travel") {
    val root = Files.createTempDirectory("icelite").toString
    val store = new IceLite(root)
    // 8 waves of small deltas on `a`, one delta on `b`
    (1 to 8).foreach { w =>
      store.commit(Seq("a" -> (w * 100L until w * 100L + 5L).map(i => (i, s"v$i"))
        .toDF("id", "v")), Map("wave" -> w.toString))
    }
    store.commit(Seq("b" -> Seq((1L, 2.0)).toDF("id", "w")), Map("wave" -> "9"))
    val preHead = store.currentSnapshotId.get
    val preRows = store.read(spark, "a").orderBy("id").collect().toSeq
    val (preCount, _, preFiles) = store.tableStat("a").get

    val cid = store.compact(spark, "a").get
    assert(store.currentSnapshotId.contains(cid))
    // identical rows, strictly fewer dirs/files
    assert(store.read(spark, "a").orderBy("id").collect().toSeq == preRows)
    val (rows, bytes, files) = store.tableStat("a").get
    assert(rows == preCount && files < preFiles && bytes > 0)
    // untouched table carried forward; head commit meta (wave) survives
    // the compaction snapshot so resume still finds its wave counter
    assert(store.read(spark, "b").count() == 1)
    assert(store.commitMeta(cid).get("wave").contains("9"))
    // time travel: the pre-compaction snapshot still reads the old dirs
    assert(store.read(spark, "a", Some(preHead)).count() == preCount)
    // appends continue normally on top of the compacted snapshot
    store.commit(Seq("a" -> Seq((9999L, "z")).toDF("id", "v")))
    assert(store.read(spark, "a").count() == preCount + 1)
    // nothing to do when a single dir remains
    assert(new IceLite(root).compact(spark, "b").isEmpty)
  }

  test("empty read with schema for absent tables") {
    val root = Files.createTempDirectory("icelite").toString
    val store = new IceLite(root)
    store.commit(Seq("a" -> Seq((1L, "x")).toDF("id", "v")))
    val schema = StructType(Seq(StructField("id", LongType)))
    assert(store.read(spark, "nope", None, Some(schema)).isEmpty)
  }
}
