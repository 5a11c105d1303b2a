package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Pins the compaction planner against an independent java.io listing
  * of the same staged layout (the operator goes through the Hadoop FS
  * API — the two must agree), plus the bin-count arithmetic. */
class CompactionPlanSpec extends SparkTestBase {

  test("compaction plan matches an independent local listing per partition") {
    val rows = Layout.compactionPlan(spark, sf).collect()
    assert(rows.nonEmpty)
    val root = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_part__root_testdata_sf0.001_${ProcessHandle.current().pid()}/events_by_date")
    val dirs = root.listFiles().filter(_.isDirectory)
      .map(p => p.getName.stripPrefix("event_date=") ->
        p.listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet")))
      .toMap
    assert(rows.length == dirs.size, s"${rows.length} != ${dirs.size} partitions")
    rows.foreach { r =>
      val part = r.getAs[String]("partition")
      val files = dirs(part)
      assert(r.getAs[Long]("n_files") == files.length.toLong, s"$part file count")
      assert(r.getAs[Long]("total_bytes") == files.map(_.length()).sum, s"$part bytes")
      val bytes = r.getAs[Long]("total_bytes")
      val groups = r.getAs[Long]("n_target_groups")
      // ⌈bytes/target⌉ with a floor of 1
      assert(groups == math.max(1L, math.ceil(bytes.toDouble / (128L << 20)).toLong))
      assert(r.getAs[Boolean]("needs_compaction") == (files.length > groups))
    }
  }

  test("a partition with more files than target groups is flagged") {
    // gate-scale day files are far below 128 MB: any multi-file day must
    // be flagged, single-file days must not
    Layout.compactionPlan(spark, sf).collect().foreach { r =>
      assert(r.getAs[Boolean]("needs_compaction")
        == (r.getAs[Long]("n_files") > r.getAs[Long]("n_target_groups")))
    }
  }

  test("post-compaction audit: one file per day, nothing left to compact, counts preserved") {
    val audit = Layout.compactionAudit(spark, sf).collect()
    assert(audit.nonEmpty)
    val raw = Tables.events(spark, sf)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("partition"))
      .agg(count(lit(1)).as("n_rows")).collect()
      .map(r => r.getAs[String]("partition") -> r.getAs[Long]("n_rows")).toMap
    assert(audit.map(_.getAs[String]("partition")).toSet == raw.keySet)
    audit.foreach { r =>
      val p = r.getAs[String]("partition")
      assert(r.getAs[Long]("n_files") == 1L, s"$p: not one file")
      assert(r.getAs[Long]("n_target_groups") == 1L, s"$p: groups != 1")
      assert(!r.getAs[Boolean]("needs_compaction"), s"$p: still flagged")
      assert(r.getAs[Long]("n_rows") == raw(p), s"$p: rows")
    }
  }

  test("oracle-scale bound: the compacted layout stays single-file/single-group at the driver's Verify scale (sf0.01)") {
    // The q_compaction_plan DuckDB oracle hardcodes n_files = 1,
    // n_target_groups = 1, needs_compaction = FALSE — valid only while
    // every day's compacted parquet bytes fit one 128 MiB target file
    // (r13 ADVICE #2). A fixture crossing that would fail the driver
    // compare as an opaque hash mismatch; pin the bound here with a
    // pointed message instead. sf0.01 is the scale the driver's Verify
    // runs; sf0.001 is covered by the audit test above.
    Layout.compactionAudit(spark, "/root/testdata/sf0.01").collect()
      .foreach { r =>
        val p = r.getAs[String]("partition")
        assert(r.getAs[Long]("n_files") == 1L
            && r.getAs[Long]("n_target_groups") == 1L
            && !r.getAs[Boolean]("needs_compaction"),
          s"sf0.01 day $p no longer compacts to one 128 MiB target group " +
            "— the q_compaction_plan oracle's hardcoded single-group row " +
            "(AnalyticsGates) must be re-derived from a bytes-per-day " +
            "bound before Verify can pass")
      }
  }

  test("compaction exec preserves rows and lands each day in <= planned files") {
    val plan = Layout.compactionPlan(spark, sf).collect()
      .map(r => r.getAs[String]("partition") -> r.getAs[Long]("n_target_groups"))
      .toMap
    val report = Layout.compactionExec(spark, sf).collect()
    // data preservation: per-day counts and DECIMAL sums equal the raw table
    val raw = Tables.events(spark, sf)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("partition"))
      .agg(count(lit(1)).as("n_rows"),
        graft.operators.exactSum(col("value")).as("value_sum"))
      .collect()
      .map(r => r.getAs[String]("partition") ->
        (r.getAs[Long]("n_rows"), r.getAs[Double]("value_sum"))).toMap
    assert(report.map(_.getAs[String]("partition")).toSet == raw.keySet)
    report.foreach { r =>
      val p = r.getAs[String]("partition")
      assert((r.getAs[Long]("n_rows"), r.getAs[Double]("value_sum")) == raw(p), p)
    }
    // file-level post-condition: each compacted day dir holds <= its
    // planned group count (== 1 when groups == 1, the fixture case)
    // the guard key includes the default targetBytes (128 MiB)
    val root = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_compactexec__root_testdata_sf0.001_tb${128L << 20}_${ProcessHandle.current().pid()}/events_by_date")
    root.listFiles().filter(_.isDirectory).foreach { dir =>
      val day = dir.getName.stripPrefix("event_date=")
      val n = dir.listFiles().count(f => f.isFile && f.getName.endsWith(".parquet"))
      val groups = plan(day)
      assert(n <= groups, s"$day: $n files > $groups planned")
      if (groups == 1L) assert(n == 1, s"$day: expected exactly one file, got $n")
    }
  }
}
