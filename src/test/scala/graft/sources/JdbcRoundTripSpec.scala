package graft.sources

import graft.SparkSpec
import graft.engine.{ArchiveConfig, Engine, Format}

import java.nio.file.Files
import java.sql.DriverManager

/** Live JDBC round trip over embedded Derby (on the Spark unmanaged
  * classpath) — exercises the S1/S2/S3 source paths that the
  * reference drives against Postgres/MariaDB (chiv.go:200–215 builds
  * the SELECT; cmd/chiv/main.go:16–17 registers the drivers). No
  * network DB exists in this container, so Derby stands in for the
  * dialect-independent mechanics: connect, discover schema, scan,
  * push down a projection, run an arbitrary query, partition a scan,
  * and archive the result byte-exactly.
  */
class JdbcRoundTripSpec extends SparkSpec {

  private lazy val dbDir = {
    val d = Files.createTempDirectory("graft-derby")
    // keep derby.log out of the repo working directory
    System.setProperty("derby.system.home", d.toString)
    d.toString
  }
  private lazy val url = s"jdbc:derby:$dbDir/testdb;create=true"
  private val driverProps = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  override def beforeAll(): Unit = {
    super.beforeAll()
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        """CREATE TABLE people (
          |  id BIGINT NOT NULL,
          |  name VARCHAR(32),
          |  score DOUBLE,
          |  born DATE,
          |  active BOOLEAN
          |)""".stripMargin)
      val ins = conn.prepareStatement(
        "INSERT INTO people VALUES (?, ?, ?, ?, ?)")
      val rows = Seq(
        (1L, "ada", 9.5, "1815-12-10", true),
        (2L, "grace", 8.25, "1906-12-09", true),
        (3L, null, 0.0, null, false),
        (4L, "edsger", 7.75, "1930-05-11", null))
      rows.foreach { case (id, name, score, born, active) =>
        ins.setLong(1, id)
        if (name == null) ins.setNull(2, java.sql.Types.VARCHAR) else ins.setString(2, name)
        ins.setDouble(3, score)
        if (born == null) ins.setNull(4, java.sql.Types.DATE)
        else ins.setDate(4, java.sql.Date.valueOf(born))
        if (active == null) ins.setNull(5, java.sql.Types.BOOLEAN)
        else ins.setBoolean(5, active.asInstanceOf[Boolean])
        ins.executeUpdate()
      }
      st.close(); ins.close()
    } finally conn.close()
  }

  test("S1 full-table scan reads every row and discovers the schema (S3)") {
    val df = Sources.jdbcTable(spark, url, "people", props = driverProps)
    assert(df.count() == 4)
    // schema discovery: JDBC metadata -> Catalyst types
    val types = df.schema.fields.map(f => f.name.toLowerCase -> f.dataType.typeName).toMap
    assert(types == Map(
      "id" -> "long", "name" -> "string", "score" -> "double",
      "born" -> "date", "active" -> "boolean"))
    // NULLs survive the cursor
    assert(df.where("name IS NULL").count() == 1)
    assert(df.where("active IS NULL").count() == 1)
  }

  test("S1 column projection narrows the SELECT at the source") {
    val df = Sources.jdbcTable(spark, url, "people",
      columns = Seq("ID", "SCORE"), props = driverProps)
    assert(df.schema.fieldNames.toSeq.map(_.toLowerCase) == Seq("id", "score"))
    val total = df.agg(org.apache.spark.sql.functions.sum("SCORE"))
      .head().getDouble(0)
    assert(total == 25.5)
  }

  test("filters push down into the JDBC source query") {
    val df = Sources.jdbcTable(spark, url, "people", props = driverProps)
      .where("SCORE > 5.0")
    // the predicate must reach the JDBCRelation (executed at Derby,
    // not post-filtered in Spark) — the same mechanics that narrow a
    // 100 TB source scan to the requested slice
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("SCORE"), plan)
    assert(df.count() == 3)
  }

  test("S2 arbitrary-query scan runs the caller's SQL at the source") {
    val df = Sources.jdbcQuery(spark, url,
      "SELECT name, score FROM people WHERE score > 5.0",
      props = driverProps)
    val names = df.collect().map(_.getString(0)).toSet
    assert(names == Set("ada", "grace", "edsger"))
  }

  test("partitioned scan splits the read and loses no rows") {
    val df = Sources.jdbcTablePartitioned(spark, url, "people",
      partitionColumn = "ID", lowerBound = 1L, upperBound = 5L,
      numPartitions = 3, props = driverProps)
    assert(df.rdd.getNumPartitions == 3)
    assert(df.count() == 4)
    assert(df.select("ID").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("DB -> archive round trip is byte-exact (the chiv flagship path)") {
    val df = Sources.jdbcTable(spark, url, "people", props = driverProps)
      .orderBy("ID")
    val out = Files.createTempDirectory("graft-derby-out").toString
    val dest = new Engine(spark, ArchiveConfig(format = Format.Csv, nullValue = Some("")))
      .archiveDF(df.coalesce(1), out, "people")
    val bytes = new String(
      Files.readAllBytes(java.nio.file.Paths.get(dest.stripPrefix("file:"))),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(bytes ==
      """ID,NAME,SCORE,BORN,ACTIVE
        |1,ada,9.5,1815-12-10,true
        |2,grace,8.25,1906-12-09,true
        |3,,0,,false
        |4,edsger,7.75,1930-05-11,
        |""".stripMargin)
  }
}
