package graft.sources

import graft.SparkSpec
import graft.core.Schemas
import java.util.Properties

/** K1 JDBC sink + S5 federated registration + S1 mongo seam, driven
  * against the embedded Derby engine bundled with Spark (a real JDBC
  * target, no external services). */
class FederationSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graft_fed;create=true"
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("writeJdbc conforms to the TableSpec and appends batched rows (K1)") {
    val rows = Seq(
      ("s1", "School One", "http://one", ts("2024-01-01 00:00:00"),
        ts("2024-01-02 00:00:00")),
      ("s2", "School Two", "http://two", ts("2024-02-01 00:00:00"),
        ts("2024-02-02 00:00:00")))
      .toDF("schoolId", "name", "url", "createdAt", "updatedAt")
    Sinks.writeJdbc(rows, Schemas.school, url)
    val back = spark.read.jdbc(url, "school", new Properties())
    assert(back.count() == 2)
    // conform projected the full declared column set, in declared order
    assert(back.columns.toSeq == Schemas.school.schema.fieldNames.toSeq)
    // (Derby maps StringType to CLOB, which its WHERE clause cannot
    // compare — assert client-side; a ClickHouse/PG target pushes this)
    val byId = back.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byId("s1") == "School One")
    // append semantics: a second batch lands on top
    Sinks.writeJdbc(
      Seq(("s3", "School Three", "http://three", ts("2024-03-01 00:00:00"),
        ts("2024-03-02 00:00:00")))
        .toDF("schoolId", "name", "url", "createdAt", "updatedAt"),
      Schemas.school, url)
    assert(spark.read.jdbc(url, "school", new Properties()).count() == 3)
    // K4: an empty batch issues no INSERTs (and reports zero rows)
    assert(Sinks.writeJdbc(rows.limit(0), Schemas.school, url) == 0L)
    assert(spark.read.jdbc(url, "school", new Properties()).count() == 3)
  }

  test("writeJdbc executes the batch exactly once and returns the observed count") {
    val onceUrl = "jdbc:derby:memory:graft_fed_once;create=true"
    val acc = spark.sparkContext.longAccumulator("jdbc_rows_scanned")
    val rows = Seq(
      ("s1", "School One", "http://one", ts("2024-01-01 00:00:00"),
        ts("2024-01-02 00:00:00")),
      ("s2", "School Two", "http://two", ts("2024-02-01 00:00:00"),
        ts("2024-02-02 00:00:00")))
      .toDF("schoolId", "name", "url", "createdAt", "updatedAt")
      .filter((_: org.apache.spark.sql.Row) => { acc.add(1); true })
    val n = Sinks.writeJdbc(rows, Schemas.school, onceUrl)
    assert(n == 2L)
    // the old isEmpty probe partially re-executed the transform before
    // every write; the observe path must touch each row exactly once
    assert(acc.value == 2, s"expected 2 row passes, saw ${acc.value}")
  }

  test("ClickHouse dialect maps types per the documented table; Derby unaffected") {
    import org.apache.spark.sql.jdbc.JdbcDialects
    import org.apache.spark.sql.types._
    ClickHouseDialect.register()
    ClickHouseDialect.register() // idempotent
    val d = JdbcDialects.get("jdbc:clickhouse://host:8123/db")
    assert(d == ClickHouseDialect)
    assert(JdbcDialects.get("jdbc:ch://host/db") == ClickHouseDialect)
    // the generic-JDBC (Derby) path must not be captured
    assert(JdbcDialects.get(url) != ClickHouseDialect)
    val expected = Seq(
      BooleanType -> "Bool", ByteType -> "Int8", ShortType -> "Int16",
      IntegerType -> "Int32", LongType -> "Int64", FloatType -> "Float32",
      DoubleType -> "Float64", StringType -> "String",
      BinaryType -> "String", DateType -> "Date32",
      TimestampType -> "DateTime64(6)",
      DecimalType(10, 2) -> "Decimal(10, 2)")
    expected.foreach { case (t, ch) =>
      assert(d.getJDBCType(t).map(_.databaseTypeDefinition).contains(ch),
        s"wrong ClickHouse type for $t")
    }
    assert(d.quoteIdentifier("weird`col") == "`weird``col`")
  }

  test("registerJdbc exposes a remote table on the spark.sql surface (S5)") {
    val rows = Seq(("g1", "sch1", "Ana", "Lee", ts("2024-01-01 00:00:00"),
      ts("2024-01-01 00:00:00")))
      .toDF("guardianId", "schoolId", "firstName", "lastName",
        "createdAt", "updatedAt")
    Sinks.writeJdbc(rows, Schemas.guardian, url)
    Sources.registerJdbc(spark, "fed_guardian", url, "guardian")
    val got = spark.sql(
      "SELECT firstName FROM fed_guardian ORDER BY createdAt").collect()
    assert(got.map(_.getString(0)).toSeq == Seq("Ana"))
    // lazy view: rows appended AFTER registration are visible
    Sinks.writeJdbc(
      Seq(("g2", "sch1", "Bo", "Kim", ts("2024-01-02 00:00:00"),
        ts("2024-01-02 00:00:00")))
        .toDF("guardianId", "schoolId", "firstName", "lastName",
          "createdAt", "updatedAt"),
      Schemas.guardian, url)
    assert(spark.sql("SELECT count(*) FROM fed_guardian")
      .collect().head.getLong(0) == 2)
  }

  test("partitioned JDBC read splits the extract across bounded ranges (S2/S3)") {
    val rows = (1 to 100).map { i =>
      ("u" + i, "First" + i, "Last" + i, i % 2 == 0, "start", "start",
        ts(f"2024-01-${i % 28 + 1}%02d 00:00:00"),
        ts(f"2024-01-${i % 28 + 1}%02d 00:00:00"), "sch" + (i % 3))
    }.toDF("uniqueKey", "firstName", "lastName", "noAttendance", "status",
      "finalAcademicStatus", "updatedAt", "createdAt", "schoolId")
      // conform fills the rest; give ids a numeric column for partitioning
      .withColumn("archiveStatus",
        org.apache.spark.sql.functions.lit(0).cast("tinyint"))
    Sinks.writeJdbc(rows, Schemas.student, url)
    // numeric partition column: archiveStatus is constant — use a synthetic
    // range over the row count via a projected subquery read instead
    // projection strings land verbatim in the remote SELECT — quote for
    // case-folding engines (Derby upper-cases unquoted identifiers)
    val got = Sources.jdbc(spark, url, "student",
      projection = Seq("\"uniqueKey\"", "\"schoolId\""))
    assert(got.count() == 100)
    // partitioned read: 4 bounded range scans on a numeric column exposed
    // by the pushed-down subquery (the reference's id-range extract shape)
    val part = spark.read
      .option("partitionColumn", "ULEN")
      .option("lowerBound", "0").option("upperBound", "10")
      .option("numPartitions", "4")
      .option("url", url)
      .option("dbtable",
        "(SELECT \"uniqueKey\", LENGTH(\"uniqueKey\") AS ULEN FROM student) AS t")
      .format("jdbc").load()
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == 100)
  }

  test("mongo source fails actionably without the connector; stand-in covers it (S1)") {
    val schema = Schemas.student.schema
    val e = intercept[IllegalStateException] {
      Sources.mongo(spark, "mongodb://localhost", "app", "students", schema)
    }
    assert(e.getMessage.contains("mongo-spark-connector"))
    // the stand-in path reads the schema-checked parquet export instead
    val dir = java.nio.file.Files.createTempDirectory("mongo_standin").toString + "/students"
    Seq(("u1", "Ana", "Lee", "sch1")).toDF("uniqueKey", "firstName", "lastName", "schoolId")
      .write.parquet(dir)
    val sub = org.apache.spark.sql.types.StructType(
      schema.fields.filter(f =>
        Seq("uniqueKey", "firstName", "lastName", "schoolId").contains(f.name)))
    val got = Sources.mongoOrStandIn(spark, "mongodb://localhost", "app",
      "students", sub, dir, projection = Seq("uniqueKey", "firstName"))
    assert(got.columns.toSeq == Seq("uniqueKey", "firstName"))
    assert(got.count() == 1)
  }
}
