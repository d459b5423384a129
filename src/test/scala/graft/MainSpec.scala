package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** CLI surface (A7, cmd/chiv/main.go:22–161): same flags, end-to-end
  * through `Main.run` on the shared session.
  */
class MainSpec extends SparkSpec {

  private val data = "/root/testdata/sf0.001"

  private def read(dest: String): String =
    new String(Files.readAllBytes(Paths.get(dest)), StandardCharsets.UTF_8)

  test("-d -t -b archives a table to CSV by default") {
    val out = Files.createTempDirectory("graft-cli").toString
    val dest = Main.run(spark, Array("-d", data, "-t", "region", "-b", out))
    assert(dest == s"$out/region.csv")
    val body = read(dest)
    assert(body.startsWith("r_regionkey,r_name\n"))
    assert(body.linesIterator.size == 6) // header + 5 regions
  }

  test("-f json -c -e compose like chiv's flags; explicit -k wins verbatim") {
    val out = Files.createTempDirectory("graft-cli").toString
    val dest = Main.run(spark, Array(
      "-d", data, "-t", "region", "-b", out,
      "-f", "json", "-c", "r_name", "-e", "jsonarr"))
    assert(dest == s"$out/region.jsonarr")
    val body = read(dest)
    assert(body.startsWith("[") && body.endsWith("]"))
    assert(body.contains(""""r_name":"AFRICA""""))
    assert(!body.contains("r_regionkey"))
    // chiv key semantics: an explicit key is used verbatim, no
    // extension negotiation (chiv.go:224–233)
    val keyed = Main.run(spark, Array(
      "-d", data, "-t", "region", "-b", out, "-k", "regions"))
    assert(keyed == s"$out/regions")
  }

  test("--sharded -f parquet -p writes a hive-partitioned dataset") {
    val out = Files.createTempDirectory("graft-cli").toString
    val dest = Main.run(spark, Array(
      "-d", data, "-t", "nation", "-b", out,
      "-f", "parquet", "--sharded", "-p", "n_regionkey"))
    val subdirs = java.nio.file.Files.list(Paths.get(dest)).toArray.map(_.toString)
    assert(subdirs.exists(_.contains("n_regionkey=")))
    assert(graft.sources.Sources.parquet(spark, dest).count() == 25)
  }

  test("missing required flag fails with the graft-prefixed error") {
    val e = intercept[RuntimeException] {
      Main.run(spark, Array("-d", data, "-t", "region"))
    }
    assert(e.getMessage == "graft: missing required flag -b")
  }

  // the reference CLI's native shape: archive FROM a live database
  // (`chiv -d $DATABASE_URL -t table -b bucket`, cmd/chiv/main.go:97–127)
  private lazy val jdbcUrl = {
    val dbDir = Files.createTempDirectory("graft-cli-derby")
    System.setProperty("derby.system.home", dbDir.toString)
    val url = s"jdbc:derby:$dbDir/clidb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE pets (id BIGINT NOT NULL, name VARCHAR(16))")
      st.executeUpdate("INSERT INTO pets VALUES (1, 'rex'), (2, 'milo')")
      st.close()
    } finally conn.close()
    url
  }

  test("-d accepts a JDBC URL and archives the database table") {
    val out = Files.createTempDirectory("graft-cli").toString
    val dest = Main.run(spark, Array("-d", jdbcUrl, "-t", "pets", "-b", out))
    assert(dest == s"$out/pets.csv")
    val lines = read(dest).linesIterator.toSeq.map(_.toLowerCase)
    // JDBC cursor order is not contractual — compare data order-free
    assert(lines.head == "id,name")
    assert(lines.tail.sorted == Seq("1,rex", "2,milo"))
  }

  test("--jdbc-partitions splits the extraction into parallel stride reads") {
    val out = Files.createTempDirectory("graft-cli").toString
    val dest = Main.run(spark, Array(
      "-d", jdbcUrl, "-t", "pets", "-b", out,
      "--jdbc-partitions", "id:1:2:2"))
    // bounds shape the strides only — every row must still arrive
    val lines = read(dest).linesIterator.toSeq.map(_.toLowerCase)
    assert(lines.head == "id,name")
    assert(lines.tail.sorted == Seq("1,rex", "2,milo"))
    // a non-JDBC source rejects the flag fast
    val e = intercept[RuntimeException] {
      Main.run(spark, Array("-d", data, "-t", "region", "-b", out,
        "--jdbc-partitions", "r_regionkey:0:4:2"))
    }
    assert(e.getMessage.contains("requires a jdbc: source"))
    // malformed spec named in the error
    val m = intercept[RuntimeException] {
      Main.run(spark, Array("-d", jdbcUrl, "-t", "pets", "-b", out,
        "--jdbc-partitions", "id:one:2:2"))
    }
    assert(m.getMessage.contains("malformed"))
    // degenerate bounds rejected before Spark sees them
    for (bad <- Seq("id:1:2:0", "id:5:2:2")) {
      val b = intercept[RuntimeException] {
        Main.run(spark, Array("-d", jdbcUrl, "-t", "pets", "-b", out,
          "--jdbc-partitions", bad))
      }
      assert(b.getMessage.contains("lower <= upper and n >= 1"))
    }
  }

  test("DATABASE_URL is the -d fallback, and an explicit -d beats it") {
    val out = Files.createTempDirectory("graft-cli").toString
    val dest = Main.run(spark, Array("-t", "pets", "-b", out),
      env = Map("DATABASE_URL" -> jdbcUrl))
    assert(read(dest).toLowerCase.contains("rex"))
    // explicit -d (parquet dir) wins over the env URL
    val explicit = Main.run(spark, Array("-d", data, "-t", "region", "-b", out),
      env = Map("DATABASE_URL" -> jdbcUrl))
    assert(read(explicit).startsWith("r_regionkey"))
    // neither flag nor env → the graft-prefixed error names both
    val e = intercept[RuntimeException] {
      Main.run(spark, Array("-t", "pets", "-b", out), env = Map.empty)
    }
    assert(e.getMessage.contains("-d") && e.getMessage.contains("DATABASE_URL"))
  }

  test("unknown format fails with the graft-prefixed error") {
    val e = intercept[RuntimeException] {
      Main.run(spark, Array("-d", data, "-t", "region", "-b", "/tmp/x", "-f", "xml"))
    }
    assert(e.getMessage == "graft: unknown format: xml")
  }

  test("--manifest writes _MANIFEST.json for a sharded archive and verifies clean") {
    val out = Files.createTempDirectory("graft-cli").toString
    val dest = Main.run(spark, Array("-d", data, "-t", "orders", "-b", out,
      "--sharded", "--manifest"))
    assert(new java.io.File(dest, "_MANIFEST.json").isFile)
    val engine = new graft.engine.Engine(spark,
      graft.engine.ArchiveConfig(format = graft.engine.Format.Csv, sharded = true))
    assert(engine.verifyManifest(dest).isEmpty)
    // coherence check fires BEFORE any archive work
    val e = intercept[RuntimeException] {
      Main.run(spark, Array("-d", data, "-t", "orders", "-b", out, "--manifest"))
    }
    assert(e.getMessage.contains("--manifest requires --sharded"))
  }
}
