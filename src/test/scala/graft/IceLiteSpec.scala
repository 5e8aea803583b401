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

  test("empty read with schema for absent tables") {
    val root = Files.createTempDirectory("icelite").toString
    val store = new IceLite(root)
    store.commit(Seq("a" -> Seq((1L, "x")).toDF("id", "v")))
    val schema = StructType(Seq(StructField("id", LongType)))
    assert(store.read(spark, "nope", None, Some(schema)).isEmpty)
  }
}
