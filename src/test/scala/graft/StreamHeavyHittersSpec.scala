package graft

import graft.functions.TextAnalytics
import graft.streaming.EventStreams

/** Streaming Misra-Gries + exact recount must equal the exact batch
  * heavy hitters — the guarantee that lets it share the DuckDB oracle. */
class StreamHeavyHittersSpec extends SparkTestBase {

  test("drained streaming MG equals the exact batch heavy hitters") {
    val got = EventStreams.streamHeavyHitters(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = TextAnalytics.heavyHittersDocs(Tables.documents(spark, sf)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"stream $got vs batch $want")
    assert(got.nonEmpty)
  }
}
