package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/** Stream-stream interval join: a fully drained inner join must equal
  * the batch interval join pair for pair (inner-join emission is not
  * watermark-gated; watermarks only bound state). */
class StreamJoinSpec extends SparkTestBase {

  test("drained stream-stream join equals the batch interval join") {
    val streamed = EventStreams.streamStreamJoin(spark, sf)
    val ev = Tables.events(spark, sf)
    val c = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("click_ts"),
        col("user_id"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
        col("user_id").as("p_user"))
    val batch = c.join(p,
      col("user_id") === col("p_user")
        && col("purchase_ts") >= col("click_ts")
        && col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (unix_timestamp(col("purchase_ts")) - unix_timestamp(col("click_ts")))
          .as("lag_secs"))
    assert(batch.count() > 0, "fixture must produce at least one pair")
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
    // every lag is inside the interval
    val bad = streamed.where(col("lag_secs") < 0 || col("lag_secs") > 1800)
    assert(bad.count() == 0)
  }
}
