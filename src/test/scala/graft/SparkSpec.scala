package graft

import graft.core.Sessions
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs: one JVM-wide SparkSession (getOrCreate
  * makes every suite reuse it) with the engine's semantic confs applied, so
  * tests exercise exactly what Verify/Bench run.
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  import org.apache.spark.sql.DataFrame

  /** Rows of a single-column result as a comparable list. */
  def col0(df: DataFrame): List[Any] =
    df.collect().map(_.get(0)).toList
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = Sessions.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
