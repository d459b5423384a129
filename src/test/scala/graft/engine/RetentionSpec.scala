package graft.engine

import graft.SparkSpec

/** [[Engine.expireArchive]] (K1f): partition-level retention over
  * landed archives — expired partitions gone, survivors byte-
  * untouched, manifest re-written with the format the OLD manifest
  * recorded and re-audited, dirty archives refused, typo'd partition
  * columns an error rather than a zero-expiry "success".
  */
class RetentionSpec extends SparkSpec {

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-retain-$tag").toString

  private def land(dest: String): Unit = {
    import spark.implicits._
    (0L until 900L).map(i => (i, f"2024-01-${i % 9 + 1}%02d", s"v$i"))
      .toDF("id", "dt", "s")
      .repartition(4).write.mode("overwrite").partitionBy("dt").parquet(dest)
  }

  test("expireArchiveBefore drops old partitions, keeps the rest intact, re-audits") {
    val dest = freshDir("basic")
    land(dest)
    val eng = new Engine(spark)
    eng.writeManifest(dest, Format.Parquet)
    val survivorsBefore = spark.read.parquet(dest)
      .where("dt >= '2024-01-04'").sort("id").collect().toSeq

    val r = eng.expireArchiveBefore(dest, "dt", "2024-01-04")
    assert(r.partitionsExpired == 3 && r.partitionsKept == 6)
    assert(r.filesExpired > 0 && r.bytesExpired > 0L)
    assert(r.rowsRemaining.contains(600L))
    // expired dirs gone, surviving dirs present
    val dirs = new java.io.File(dest).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs == (4 to 9).map(d => f"dt=2024-01-$d%02d").toSet)
    // surviving content identical; audit clean
    val after = spark.read.parquet(dest).sort("id").collect().toSeq
    assert(after == survivorsBefore)
    assert(eng.verifyManifest(dest).isEmpty)
  }

  test("unmanifested archive expires too; rowsRemaining is None") {
    val dest = freshDir("noman")
    land(dest)
    val r = new Engine(spark).expireArchive(dest, "dt", _ == "2024-01-09")
    assert(r.partitionsExpired == 8 && r.partitionsKept == 1)
    assert(r.rowsRemaining.isEmpty)
    assert(spark.read.parquet(dest).count() == 100L)
  }

  test("typo'd partition column is an error, not a zero-expiry success") {
    val dest = freshDir("typo")
    land(dest)
    val e = intercept[ArchiveException] {
      new Engine(spark).expireArchiveBefore(dest, "date", "2024-01-04")
    }
    assert(e.getMessage.contains("upload"))
    // nothing was deleted
    assert(spark.read.parquet(dest).count() == 900L)
  }

  test("an archive failing its audit is refused before any deletion") {
    val dest = freshDir("dirty")
    land(dest)
    val eng = new Engine(spark)
    eng.writeManifest(dest, Format.Parquet)
    // corrupt the landing: remove one data file behind the manifest's back
    val victim = new java.io.File(dest + "/dt=2024-01-01").listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .head
    assert(victim.delete())
    val e = intercept[ArchiveException] {
      eng.expireArchiveBefore(dest, "dt", "2024-01-04")
    }
    assert(e.getCause.getMessage.contains("refusing to expire"))
    // the would-be-expired survivors are untouched
    assert(new java.io.File(dest + "/dt=2024-01-02").exists())
    assert(new java.io.File(dest + "/dt=2024-01-03").exists())
  }

  test("a manifested archive in a non-recountable format is refused (stale-manifest guard)") {
    val dest = freshDir("json")
    land(dest)
    val eng = new Engine(spark)
    // a yaml/json manifest records rows=-1 and cannot be re-audited
    // after deletes — expiry must refuse rather than leave a manifest
    // still listing the expired shards
    eng.writeManifest(dest, Format.JsonArray)
    val e = intercept[ArchiveException] {
      eng.expireArchiveBefore(dest, "dt", "2024-01-04")
    }
    assert(e.getMessage.contains("format"))
    assert(e.getCause.getMessage.contains("cannot expire"))
    // nothing was deleted
    assert(new java.io.File(dest + "/dt=2024-01-01").exists())
  }

  test("keep predicate sees the writer's encoded directory value (documented contract)") {
    import spark.implicits._
    val dest = freshDir("esc")
    // values the hive layout percent-escapes (':') and leaves verbatim
    // (space) — the predicate must see them exactly as the directory
    // name encodes them, per the expireArchive scaladoc
    (0L until 40L).map(i => (i, if (i % 2 == 0) "a b" else "x:y"))
      .toDF("id", "tag")
      .write.mode("overwrite").partitionBy("tag").parquet(dest)
    val dirs = new java.io.File(dest).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs.contains("tag=a b"), s"layout changed: $dirs")
    val escaped = dirs.find(d => d != "tag=a b").get.stripPrefix("tag=")
    val seen = scala.collection.mutable.Set[String]()
    val r = new Engine(spark).expireArchive(dest, "tag", v => { seen += v; v == "a b" })
    assert(seen == Set("a b", escaped), s"predicate saw $seen")
    assert(r.partitionsExpired == 1 && r.partitionsKept == 1)
    assert(spark.read.parquet(dest).count() == 20L)
  }

  test("full lifecycle: land -> manifest -> compact -> expire -> audit, one archive") {
    val dest = freshDir("lifecycle")
    land(dest) // 4 files x 9 partitions
    val eng = new Engine(spark)
    eng.writeManifest(dest, Format.Parquet)
    val c = eng.compactArchive(dest, Format.Parquet, targetBytes = 1L << 30)
    assert(c.partitionsCompacted == 9 && c.filesAfter == 9)
    val r = eng.expireArchiveBefore(dest, "dt", "2024-01-07")
    assert(r.partitionsExpired == 6 && r.partitionsKept == 3)
    assert(r.filesExpired == 6, "expiry runs over the COMPACTED layout")
    assert(r.rowsRemaining.contains(300L))
    assert(eng.verifyManifest(dest).isEmpty)
    assert(spark.read.parquet(dest).count() == 300L)
  }
}
