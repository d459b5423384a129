package graft.engine

import graft.SparkSpec

/** [[Engine.repairArchive]]: the machine-safe half of the audit→repair
  * loop — crash-residue EXTRAS deleted and the audit restored, every
  * loss-shaped finding refused (repair must never launder missing or
  * changed data into a clean manifest).
  */
class RepairSpec extends SparkSpec {

  private def land(tag: String): (String, Engine) = {
    import spark.implicits._
    val dest = java.nio.file.Files.createTempDirectory(s"graft-repair-$tag")
      .toString + "/arch"
    (0L until 400L).map(i => (i, s"v$i")).toDF("id", "s")
      .repartition(2).write.parquet(dest)
    val eng = new Engine(spark)
    eng.writeManifest(dest, Format.Parquet)
    assert(eng.verifyManifest(dest).isEmpty)
    (dest, eng)
  }

  test("compaction-crash extras are removed and the audit restored byte-for-byte") {
    import spark.implicits._
    val (dest, eng) = land("extras")
    val before = spark.read.parquet(dest).sort("id").collect().toSeq
    // simulate the crash-safe compaction direction: renamed-in copies
    // exist alongside the still-manifested sources (extras, never loss)
    Seq((9999L, "ghost")).toDF("id", "s").coalesce(1)
      .write.parquet(dest + "/.tmp-ghost")
    val part = new java.io.File(dest + "/.tmp-ghost").listFiles()
      .find(_.getName.startsWith("part-")).get
    val extra = new java.io.File(dest, "part-zzzz-crash-residue.snappy.parquet")
    assert(part.renameTo(extra))
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(dest + "/.tmp-ghost"))
    // the residue is live: the audit flags it AND the inflated recount
    val findings = eng.verifyManifest(dest)
    assert(findings.exists(_.startsWith("unexpected file: ")), findings.mkString("; "))
    assert(findings.exists(_.startsWith("row drift:")), findings.mkString("; "))
    val repaired = eng.repairArchive(dest)
    assert(repaired == Seq("removed extra: part-zzzz-crash-residue.snappy.parquet"))
    assert(!extra.exists())
    assert(eng.verifyManifest(dest).isEmpty)
    assert(spark.read.parquet(dest).sort("id").collect().toSeq == before)
    // idempotent: a clean archive repairs to an empty report
    assert(eng.repairArchive(dest).isEmpty)
  }

  test("a missing shard is refused — repair never launders loss") {
    val (dest, eng) = land("loss")
    val victim = new java.io.File(dest).listFiles()
      .filter(_.getName.startsWith("part-")).head
    assert(victim.delete())
    val e = intercept[ArchiveException] { eng.repairArchive(dest) }
    assert(e.getMessage.contains("refusing to repair"))
    // nothing was touched: the finding is still there for a human
    assert(eng.verifyManifest(dest).exists(_.startsWith("missing file: ")))
  }

  test("a resized (tampered) shard is refused even when extras also exist") {
    val (dest, eng) = land("tamper")
    val victim = new java.io.File(dest).listFiles()
      .filter(_.getName.startsWith("part-")).head
    java.nio.file.Files.write(victim.toPath, Array[Byte](1, 2, 3),
      java.nio.file.StandardOpenOption.APPEND)
    java.nio.file.Files.writeString(
      new java.io.File(dest, "part-extra-file.parquet").toPath, "x")
    val e = intercept[ArchiveException] { eng.repairArchive(dest) }
    assert(e.getMessage.contains("refusing to repair"))
    assert(new java.io.File(dest, "part-extra-file.parquet").exists())
  }
}
