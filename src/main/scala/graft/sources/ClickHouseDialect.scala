package graft.sources

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

/** ClickHouse dialect for [[Sinks.writeJdbc]] — the reference's actual
  * load target speaks ClickHouse over HTTP
  * (apps/airflow/dags/guardian/etl_guardian_to_clickhouse.py:127-132);
  * Spark's generic JDBC path emits ANSI-ish DDL/SQL that ClickHouse
  * rejects or mis-types, so this dialect closes the K1 gap for users
  * pointing `writeJdbc` at `jdbc:clickhouse:` / `jdbc:ch:` URLs (the
  * official `com.clickhouse:clickhouse-jdbc` driver's schemes; the driver
  * jar itself ships with the user's runtime, like any JDBC driver).
  *
  * Registration is explicit and idempotent: call
  * [[ClickHouseDialect.register]] once per JVM (Spark keeps a global
  * dialect registry — latest registration wins for matching URLs).
  *
  * Semantics a ClickHouse target changes, beyond type names:
  *  - NULLABILITY: ClickHouse types are non-nullable unless wrapped
  *    `Nullable(T)`. Spark's DDL builder appends `NOT NULL` for required
  *    columns but leaves nullable columns as the bare type — so columns
  *    created by Spark are effectively non-nullable on CH. For nullable
  *    columns, pre-create the table (the [[graft.core.Schemas]] bootstrap
  *    path) with explicit `Nullable(...)` wrappers; writes to a
  *    pre-created table are unaffected by this mapping.
  *  - TRANSACTIONS: ClickHouse has no classic transactions; the JDBC
  *    driver no-ops commit/rollback. Spark's per-partition "commit" is
  *    therefore not atomic — a failed task can leave partial inserts.
  *    Pair writes with an idempotent engine (ReplacingMergeTree keyed on
  *    the TableSpec's ORDER BY, the reference's own dedup-latest pattern)
  *    so replays converge — exactly the §2.10 at-least-once contract.
  *  - BATCHES: `batchsize` rows per INSERT map to ClickHouse's preferred
  *    bulk-insert shape (each batch becomes one part; avoid tiny batches).
  *
  * Type mapping (Spark → ClickHouse):
  * {{{
  *   BooleanType   → Bool          ByteType    → Int8
  *   ShortType     → Int16         IntegerType → Int32
  *   LongType      → Int64         FloatType   → Float32
  *   DoubleType    → Float64       StringType  → String
  *   BinaryType    → String        DateType    → Date32
  *   TimestampType → DateTime64(6) (microsecond precision, Spark's unit)
  *   DecimalType   → Decimal(p, s)
  * }}}
  */
object ClickHouseDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.startsWith("jdbc:clickhouse:") || url.startsWith("jdbc:ch:")

  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case BooleanType => Some(JdbcType("Bool", java.sql.Types.BOOLEAN))
    case ByteType => Some(JdbcType("Int8", java.sql.Types.TINYINT))
    case ShortType => Some(JdbcType("Int16", java.sql.Types.SMALLINT))
    case IntegerType => Some(JdbcType("Int32", java.sql.Types.INTEGER))
    case LongType => Some(JdbcType("Int64", java.sql.Types.BIGINT))
    case FloatType => Some(JdbcType("Float32", java.sql.Types.FLOAT))
    case DoubleType => Some(JdbcType("Float64", java.sql.Types.DOUBLE))
    case StringType => Some(JdbcType("String", java.sql.Types.VARCHAR))
    // CH String is raw bytes; BLOB-style escapes go through the driver
    case BinaryType => Some(JdbcType("String", java.sql.Types.VARBINARY))
    case DateType => Some(JdbcType("Date32", java.sql.Types.DATE))
    case TimestampType =>
      Some(JdbcType("DateTime64(6)", java.sql.Types.TIMESTAMP))
    case t: DecimalType =>
      Some(JdbcType(s"Decimal(${t.precision}, ${t.scale})", java.sql.Types.DECIMAL))
    case _ => None
  }

  /** ClickHouse quotes identifiers with backticks (MySQL-style). */
  override def quoteIdentifier(colName: String): String =
    s"`${colName.replace("`", "``")}`"

  /** ClickHouse's LIMIT syntax is standard; rewrite nothing else. */
  override def isCascadingTruncateTable(): Option[Boolean] = Some(false)

  /** Idempotent global registration (unregister-then-register, so repeated
    * calls never stack duplicate entries in Spark's dialect list). */
  def register(): Unit = synchronized {
    JdbcDialects.unregisterDialect(this)
    JdbcDialects.registerDialect(this)
  }
}
