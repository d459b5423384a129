package graft.engine

import graft.SparkSpec

import java.nio.file.Files
import scala.concurrent.duration._

/** A2 `ArchiveWithContext` semantics (chiv.go:32–34): a running
  * archive can be cancelled mid-flight; cancellation surfaces as the
  * stage-prefixed error (NOT chiv's silent truncation, chiv.go:166–
  * 168 — see the archiveDFCancellable Scaladoc for the deliberate
  * divergence) and the destination object is never committed.
  */
class CancellationSpec extends SparkSpec {

  test("cancel() aborts a running archive with a stage-prefixed error, no object committed") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-cancel").toString
    // A row source that cannot finish quickly: ~80 s of executor
    // sleep across 4 partitions. Cancellation must land mid-job.
    val slow = org.apache.spark.sql.functions.udf { (i: Long) =>
      Thread.sleep(100L); i
    }
    val df = spark.range(0, 3200, 1, 4).toDF("id")
      .withColumn("id", slow($"id"))
    val job = new Engine(spark).archiveDFCancellable(df, out, "slow")
    Thread.sleep(1500) // let the staged write start
    assert(!job.isCompleted)
    val t0 = System.nanoTime()
    job.cancel("test cancel")
    val e = intercept[ArchiveException] { job.await(60.seconds) }
    val waited = (System.nanoTime() - t0) / 1e9
    // stage-prefixed, prompt, the exact key never appeared, and the
    // staged parts were discarded (no leaked <dest>.staging bytes)
    assert(e.getMessage.startsWith("graft: "))
    assert(waited < 30.0, s"cancellation took ${waited}s")
    assert(!Files.exists(java.nio.file.Paths.get(s"$out/slow.csv")))
    assert(!Files.exists(java.nio.file.Paths.get(s"$out/slow.csv.staging")))
  }

  test("executor-side formatter failures surface as the download stage, staging cleaned") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-cancel").toString
    val boom = org.apache.spark.sql.functions.udf { (i: Long) =>
      if (i == 7L) throw new IllegalStateException("bad row") else i
    }
    val df = spark.range(0, 16, 1, 4).toDF("id")
      .withColumn("id", boom($"id"))
    val e = intercept[ArchiveException] {
      new Engine(spark).archiveDF(df, out, "boom")
    }
    // the UDF fails inside the staged write job; the failure is a row-
    // production (chiv download-leg) error, not an upload error
    assert(e.getMessage.startsWith("graft: download:"), e.getMessage)
    assert(!Files.exists(java.nio.file.Paths.get(s"$out/boom.csv")))
    assert(!Files.exists(java.nio.file.Paths.get(s"$out/boom.csv.staging")))
  }

  test("failed columnar single-object archive leaves no staging directory") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-cancel").toString
    val boom = org.apache.spark.sql.functions.udf { (i: Long) =>
      if (i == 3L) throw new IllegalStateException("bad row") else i
    }
    val df = spark.range(0, 8, 1, 2).toDF("id").withColumn("id", boom($"id"))
    val e = intercept[ArchiveException] {
      new Engine(spark, ArchiveConfig(format = Format.Parquet))
        .archiveDF(df, out, "colboom")
    }
    assert(e.getMessage.startsWith("graft: "))
    assert(!Files.exists(java.nio.file.Paths.get(s"$out/colboom.parquet")))
    assert(!Files.exists(java.nio.file.Paths.get(s"$out/colboom.parquet.staging")))
  }

  test("cancelling one archive leaves a concurrent sibling untouched (job-group isolation)") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-cancel").toString
    val slow = org.apache.spark.sql.functions.udf { (i: Long) =>
      Thread.sleep(25L); i
    }
    val eng = new Engine(spark)
    val victim = eng.archiveDFCancellable(
      spark.range(0, 1600, 1, 4).toDF("id").withColumn("id", slow($"id")), out, "victim")
    val sibling = eng.archiveDFCancellable(
      spark.range(0, 160, 1, 4).toDF("id").withColumn("id", slow($"id")), out, "sibling")
    Thread.sleep(500)
    victim.cancel("only the victim")
    intercept[ArchiveException] { victim.await(60.seconds) }
    // the sibling's job group was not cancelled: it must finish clean
    val dest = sibling.await(120.seconds)
    assert(dest.endsWith("/sibling.csv"))
    assert(Files.readAllLines(java.nio.file.Paths.get(dest)).size == 161) // header + 160
  }

  test("single-object output is byte-identical across partitionings (seam framing)") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-seams").toString
    val rows = (1 to 17).map(i => (i.toLong, s"v$i"))
    for (fmt <- Seq(Format.Csv, Format.JsonArray, Format.Yaml)) {
      val eng = new Engine(spark, ArchiveConfig(format = fmt))
      // 1 partition vs many (some empty after the filter) must
      // concatenate to the same bytes: separators only BETWEEN
      // non-empty parts, header/array framing once
      val base = rows.toDF("id", "v").where($"id" =!= 4L)
      val one = eng.archiveDF(base.coalesce(1), out, s"one_${fmt.extension}")
      val many = eng.archiveDF(base.repartition(8, $"id"), out, s"many_${fmt.extension}")
      val a = Files.readAllBytes(java.nio.file.Paths.get(one))
      val b = Files.readAllBytes(java.nio.file.Paths.get(many))
      // row ORDER may differ across partitionings; byte-length and the
      // sorted line/entry multiset must match exactly
      assert(a.length == b.length, s"$fmt byte length")
      def canon(bytes: Array[Byte]): Seq[String] = {
        val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        if (fmt == Format.JsonArray) {
          assert(s.startsWith("[{") && s.endsWith("}]"), s"$fmt framing")
          s.stripPrefix("[{").stripSuffix("}]").split("\\},\\{").toSeq.sorted
        } else s.split("\n").toSeq.sorted
      }
      assert(canon(a) == canon(b), s"$fmt content multiset")
    }
  }

  test("cancellable API completes normally when not cancelled") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-cancel").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val job = new Engine(spark).archiveDFCancellable(df, out, "ok")
    val dest = job.await(60.seconds)
    assert(dest.endsWith("/ok.csv"))
    val bytes = new String(Files.readAllBytes(java.nio.file.Paths.get(dest)))
    assert(bytes == "id,v\n1,a\n2,b\n")
    job.cancel() // after completion: a no-op
    assert(job.isCompleted)
  }
}
