package graft

/** The bench I/O twin ([[IoListener]]) must actually observe executor
  * metrics — it is round-10 scale EVIDENCE (plan-bytes vs box-seconds
  * decomposition), so a silently-zero listener would fabricate a
  * "no shuffle growth" conclusion. Pins: shuffle writes and input bytes
  * are captured for a real shuffling query, reset zeroes the counters,
  * and the settled snapshot is stable across immediate re-reads. */
class IoListenerSpec extends SparkSpec {

  test("captures shuffle write and input bytes for a shuffling query") {
    val io = new IoListener
    spark.sparkContext.addSparkListener(io)
    try {
      io.reset()
      spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .groupBy("l_orderkey").count()
        .write.format("noop").mode("overwrite").save()
      val (sw, _, _, in) = io.settledSnapshot()
      assert(sw > 0, "groupBy must report shuffle write bytes")
      assert(in > 0, "parquet scan must report input bytes")
      val again = io.settledSnapshot()
      assert(again == ((sw, 0L, 0L, in)) || again._1 >= sw,
        "snapshot must be monotone/stable once jobs are done")
      io.reset()
      assert(io.settledSnapshot() == ((0L, 0L, 0L, 0L)),
        "reset must zero all counters")
    } finally spark.sparkContext.removeSparkListener(io)
  }
}
