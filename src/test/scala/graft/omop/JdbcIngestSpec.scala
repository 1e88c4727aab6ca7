package graft.omop

import java.nio.file.Files
import java.sql.DriverManager

import graft.SparkSpecBase
import graft.omop.tools.DownloadOmopTables
import graft.omop.tools.DownloadOmopTables.JdbcConfig

/**
 * S5/S6 JDBC ingest against an embedded in-memory Derby database (ships with
 * Spark): range-partitioned keyed scans (bounds probed via MAX(id)), plain
 * scans, and the parquet round-trip with patient splits.
 */
class JdbcIngestSpec extends SparkSpecBase {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private val cfg = JdbcConfig(url = url, user = "", password = "",
    driver = "org.apache.derby.jdbc.EmbeddedDriver", numPartitions = 4)

  override def beforeAll(): Unit = {
    super.beforeAll()
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE person (person_id BIGINT PRIMARY KEY, year_of_birth INT)")
    (1 to 50).foreach(i => st.execute(
      s"INSERT INTO person VALUES ($i, ${1940 + i})"))
    st.execute("CREATE TABLE concept (concept_id BIGINT, concept_name VARCHAR(64))")
    st.execute("INSERT INTO concept VALUES (9201, 'Inpatient Visit')")
    st.close(); conn.close()
  }

  test("S5: keyed table reads range-partitioned with probed MAX bound") {
    val df = DownloadOmopTables.downloadPartitioned(spark, cfg, "person", "person_id")
    assert(df.count() == 50)
    assert(df.rdd.getNumPartitions == 4) // parallel range-bounded connections
    assert(df.columns.map(_.toLowerCase).contains("person_id"))
  }

  test("S6: non-keyed table reads on a single connection") {
    val df = DownloadOmopTables.downloadPlain(spark, cfg, "concept")
    assert(df.count() == 1)
    assert(df.rdd.getNumPartitions == 1)
  }

  test("run() round-trips tables to parquet and writes seeded patient splits") {
    val out = Files.createTempDirectory("graft-jdbc").toString
    DownloadOmopTables.run(spark, cfg, out, tables = Seq("person"))
    assert(spark.read.parquet(s"$out/person").count() == 50)
    val splits = spark.read.parquet(s"$out/patient_splits")
    assert(splits.count() == 50)
    val byKind = splits.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKind.keySet == Set("train", "test"))
    assert(byKind("train") > byKind("test")) // 80/20 seeded split
  }
}
