package graft

import org.apache.spark.sql.types._

/** The output-encoding contract (SURVEY §2.12), enforced at build time:
  * every final projection a `SparkEntry.queries` entry ships to the
  * correctness gate must contain only HASH-STABLE column types — types
  * whose serialized form is identical between Spark's parquet output
  * (pyarrow → pandas) and DuckDB's result frame, so the gate's typed
  * hasher agrees whenever values agree.
  *
  * Round 3 lost six green rows to exactly this class: DECIMAL(38,0)
  * rationals (decimal128 vs DuckDB DECIMAL serialization drift — q92, q93,
  * q102, q103, q105) and an array-of-struct column (unhashable ndarray
  * cells crashing the gate's row sort — q89). Operators keep exact decimal
  * arithmetic INTERNALLY; final projections render rationals as strings
  * and nested values as JSON (`to_json` on both engine and oracle sides).
  *
  * Schema inspection only triggers Catalyst analysis, not execution, so
  * this sweep over all 110 queries is cheap.
  */
class OutputContractSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  /** Types proven hash-stable across the Spark/pyarrow and DuckDB/pandas
    * paths (ints are width-tolerant in the gate's hasher; floats match
    * bit-for-bit when the arithmetic does; strings/dates/timestamps are
    * canonical). */
  private val stable: Set[DataType] = Set(
    StringType, BooleanType,
    ByteType, ShortType, IntegerType, LongType,
    FloatType, DoubleType,
    DateType, TimestampType, TimestampNTZType)

  /** Pinned exceptions: query → columns allowed to violate the contract,
    * each with a justification recorded here. Currently empty — every
    * query ships portable scalars. (Mirror: NESTED_ALLOWLIST in
    * tools/check.py must stay in sync.) */
  private val allowlist: Map[String, Set[String]] = Map.empty

  test("every query's final schema carries only hash-stable column types") {
    val s = graft.core.Sessions.tune(spark)
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val ok = allowlist.getOrElse(name, Set.empty)
        fn(s, sf).schema.fields.collect {
          case f if !stable.contains(f.dataType) && !ok.contains(f.name) =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(violations.isEmpty,
      s"non-hash-stable output columns (render as string/JSON in the " +
        s"final projection, or pin in the allowlist with a reason):\n  " +
        violations.mkString("\n  "))
  }
}
