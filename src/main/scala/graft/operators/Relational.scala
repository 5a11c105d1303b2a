package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Batch relational operator battery (SURVEY.md §2.1-2.4, §2.6, §2.8-2.9).
  *
  * The reference's fact table is a sensor-reading CSV
  * (`/root/reference/sensor_data_etl.py:35-51`); the driver testdata's
  * `events` table plays that role (FIXTURES.md §C): user_id≈terminal_id,
  * ts≈datetime, event_type≈sensor_name, value≈sensor_reading.
  *
  * Every query is a pure declarative DataFrame plan: filters/projections
  * reach the parquet scan via Catalyst pushdown, joins shuffle on their
  * keys (or broadcast for bounded dims), aggregations run partial+final.
  * No collect(), no driver-side loops, no UDFs.
  */
object Relational {

  /** S1+P1+P2 — parquet scan, projection, alias. Column pruning pushes a
    * 3-column ReadSchema into the scan (cf. `sensor_data_etl.py:27-30`). */
  def scanProject(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"), col("user_id").as("terminal_id"), col("value"))

  /** P5+P6+P7 — conjunctive comparison filter + timestamp-literal predicate
    * + negation (cf. geo bounding box `sensor_data_etl.py:57-58`, temporal
    * split `sensor_data_classification.py:30-32`). All three predicates are
    * pushed to the parquet scan. */
  def filterConj(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .where(col("value") < 100.0
        && col("ts") >= lit("2024-01-10 00:00:00").cast(TimestampType)
        && !(col("event_type") === "error"))
      .select("event_id", "ts", "event_type", "value")

  /** P8 — when/otherwise normalization (cf. `'CO '`→`'CO'` at
    * `sensor_data_etl.py:31-33`, message-code collapse at
    * `read_sensor_configs.py:59-64`). */
  def whenOtherwise(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"),
      when(col("event_type") === "click" || col("event_type") === "view", "browse")
        .when(col("event_type") === "signup", "onboard")
        .otherwise(col("event_type"))
        .as("kind"))

  /** P9+P10 — Timestamp→Date cast and unix epoch seconds
    * (cf. `sensor_data_regression.py:37,47`). */
  def castDateUnix(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"),
      to_date(col("ts")).as("event_date"),
      unix_timestamp(col("ts")).as("epoch_s"))

  /** P13 — IN-list filter (cf. `WHERE ... IN` pushdown
    * `read_sensor_configs.py:34,40`). Pushed to the scan as In(). */
  def isinFilter(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .where(col("event_type").isin("purchase", "signup"))
      .select("event_id", "event_type", "value")

  /** J1 — inner equi-join on a compound 2-column key, expression form with
    * qualified column selection (cf. fact×sensor_configs on
    * (terminal_id, sensor_type_id), `sensor_data_etl.py:60-71`). The dim is
    * derived per (user_id, event_type) like sensor_configs is per
    * (terminal, sensor). Shuffles both sides on the compound key; AQE may
    * broadcast the dim (≤750 rows) at runtime. */
  def joinCompound(s: SparkSession, d: String): DataFrame = {
    val ev  = Tables.events(s, d)
    val dim = ev.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("type_count"), max("value").as("type_max"))
    // dim derives from ev — alias both sides so the compound-key equi-join
    // is an unambiguous self-join, then select qualified columns (J1 shape)
    ev.as("e").join(dim.as("dim"),
        col("e.user_id") === col("dim.user_id")
          && col("e.event_type") === col("dim.event_type"))
      .select(col("e.event_id"), col("e.user_id"), col("e.event_type"),
        col("dim.type_count"), col("dim.type_max"))
  }

  /** J2 — USING-style join on a name list (dedups key columns), recombining
    * two aggregates of the same fact (cf. features⋈target on
    * (datetime, latitude, longitude), `sensor_data_etl.py:86`). */
  def joinUsing(s: SparkSession, d: String): DataFrame = {
    val ev    = Tables.events(s, d)
    val daily = ev.groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(max("value").as("day_max"))
    val cnts  = ev.groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("day_n"))
    daily.join(cnts, Seq("user_id", "day"))
  }

  /** J3 — broadcast-hint join chain onto a bounded dim (cf. the 7-row
    * message_code_table broadcast, `sensor_data_etl.py:88`). region has 5
    * rows at every sf — broadcast is the only sane plan at 100 TB too. */
  def joinBroadcast(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(r("r_name"))
      .agg(count(lit(1)).as("cust_cnt"), exactSum(col("c_acctbal")).as("acctbal_sum"))
  }

  /** A1 — groupBy on 3 keys with max aggregate (cf. per-(datetime,lat,lon)
    * max message code, `sensor_data_etl.py:73-76`). Partial (map-side)
    * aggregation then one shuffle on the full key. */
  def groupbyMax(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"), col("event_type"))
      .agg(max("value").as("max_value"))

  /** A3+A4 — daily aggregate with max/count/mean (cf. daily H2S max,
    * `sensor_data_regression.py:39`). */
  def groupbyDaily(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(max("value").as("max_value"),
        count(lit(1)).as("n"),
        exactAvg(col("value")).as("avg_value"))

  /** A2+P11 — long→wide pivot with a FIXED value list + per-column null
    * defaults (cf. `sensor_data_etl.py:78-84`; gas nulls→0, O2→21). The
    * fixed list avoids the extra distinct-values job the reference pays and
    * keeps the schema static — mandatory at 100 TB. `max` (not `first`)
    * keeps the result deterministic for the oracle; the flagship `entry()`
    * keeps the reference's first-ignoreNulls semantics. */
  def pivotFill(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .pivot("event_type", Seq("click", "error", "purchase", "view"))
      .agg(max(col("value")))
      .na.fill(Map("click" -> 0.0, "error" -> 0.0, "purchase" -> 0.0, "view" -> 21.0))

  /** P12 — dropna: pivot WITHOUT fill, then drop rows with any null
    * (cf. `sensor_data_regression.py:48`). */
  def pivotDropna(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .pivot("event_type", Seq("click", "error", "purchase", "view"))
      .agg(max(col("value")))
      .na.drop()

  /** O1+O2 — global order + limit = top-k. Catalyst plans
    * TakeOrderedAndProject (per-partition top-k, no full sort/exchange of
    * the data) — exactly what a 100 TB `ORDER BY ... LIMIT` needs. Unique
    * event_id tiebreak keeps the result deterministic
    * (cf. `sensor_data_etl.py:71`, `show(30)` sites §2.6). */
  def orderbyTopk(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .orderBy(col("value").desc, col("event_id").asc)
      .limit(100)
      .select("event_id", "ts", "user_id", "event_type", "value")

  /** O-family extension — top-k PER KEY (each user's k highest-value
    * events), the grouped-ranking shape every leaderboard / best-example
    * selection needs. A row_number over a KEY-PARTITIONED window + rank
    * filter: no global sort, no single-partition stage anywhere — the
    * shuffle is hashpartitioning(user_id) and Spark 4 plans a
    * WindowGroupLimit, so each partition keeps only k rows per key BEFORE
    * the final window (the per-key analog of TakeOrderedAndProject).
    * Unique event_id tiebreak keeps ranks deterministic. TopkPerKeySpec
    * asserts the no-global-sort plan shape. */
  def topkPerKey(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("value").desc, col("event_id").asc)
    Tables.events(s, d)
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
      .select("user_id", "rank", "event_id", "event_type", "value")
  }

  /** Set-operation family — INTERSECT / EXCEPT / UNION DISTINCT over
    * per-type user sets, labeled and stacked into one result. Catalyst
    * compiles intersect to a left-semi join over distinct sides and
    * except to a left-anti join — both hash-shuffle on the full row (here
    * a single bigint), never a sort — and the final union's distinct
    * folds into the same aggregate shape. At 100 TB each leg is one
    * shuffle of an already-projected narrow column; nothing rescans the
    * wide table. */
  def setOps(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    def users(t: String) =
      ev.where(col("event_type") === t).select("user_id")
    val both = users("click").intersect(users("purchase"))
      .withColumn("set_op", lit("click_and_purchase"))
    val only = users("view").except(users("error"))
      .withColumn("set_op", lit("view_not_error"))
    val either = users("signup").union(users("purchase")).distinct()
      .withColumn("set_op", lit("signup_or_purchase"))
    both.unionByName(only).unionByName(either)
      .select("set_op", "user_id")
  }

  /** J-family extension — left SEMI and left ANTI join as first-class
    * relational shapes (EXISTS / NOT EXISTS): customers with at least one
    * open order and customers with none, labeled and stacked. Semi/anti
    * never materialize right-side columns or duplicate left rows on
    * multi-matches — the build side is deduplicated in the hash table, so
    * the shuffle carries each custkey once no matter how many orders it
    * has (the anti-join form is also the backbone of every dedup "clean"
    * pass, `Dedup.dedupClean`). */
  def semiAnti(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val open = Tables.orders(s, d)
      .where(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("c_custkey"))
    val has = c.join(open, Seq("c_custkey"), "left_semi")
      .withColumn("kind", lit("has_open_order"))
    val not = c.join(open, Seq("c_custkey"), "left_anti")
      .withColumn("kind", lit("no_open_order"))
    has.unionByName(not)
      .select("kind", "c_custkey", "c_mktsegment", "c_acctbal")
  }

  /** A-family extension — CUBE over (event_type, event day): all four
    * grouping sets (both keys, each alone, grand total) in ONE shuffle
    * with partial aggregation, the same single-pass grouping-sets plan as
    * the ROLLUP in `CorpusPipeline.corpusStatsRollup` (its strict
    * superset: cube adds the per-day-across-types slice a rollup omits).
    * NULL keys mark subtotal rows exactly as DuckDB's CUBE does. Long
    * count + DECIMAL-cast value sum keep every level hash-exact. */
  def cubeDaily(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("day", to_date(col("ts")))
      .cube("event_type", "day")
      .agg(count(lit(1)).as("n"), exactSum(col("value")).as("value_sum"))

  /** P-family extension — UNPIVOT (melt), the inverse of the A2 pivot:
    * per-user wide counts (one column per event type) back to long
    * (user_id, event_type, n) rows. Spark's `unpivot` is a single
    * codegen'd Expand — each input row emits |values| output rows in the
    * same task, no shuffle, no join — so the long form costs one narrow
    * pass whatever the table size. Nulls (types a user never produced)
    * are dropped by unpivot's contract, matching the oracle's UNION ALL
    * arms. The wide input here is itself the A2 pivot (fixed value list,
    * so the unpivot column set is static — the only pivot form that
    * scales anyway). */
  def unpivotDaily(s: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val wide = Tables.events(s, d)
      .groupBy("user_id").pivot("event_type", types)
      .agg(count(lit(1)))
    wide.unpivot(Array(col("user_id")),
        types.map(t => col(t).as(t)).toArray,
        "event_type", "n")
      .where(col("n").isNotNull)
  }

  /** A-family extension — per-type distinct-user counts. `count_distinct`
    * is exact: Catalyst expands it to a two-stage aggregate (partial
    * distinct on (type, user), then count) — one extra shuffle, exact
    * answer. The HLL sketch form (`approx_count_distinct`) is a single
    * partial-agg pass and is the 100 TB default; it lives in
    * `approxDistinctUsers` below and is accuracy-tested rather than
    * oracle'd (sketches don't hash-match across engines). */
  def countDistinctUsers(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))

  /** HLL++ sketch variant of [[countDistinctUsers]] (rsd 5%). */
  def approxDistinctUsers(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.05).as("n_users_approx"))

  /** Deterministic hash-based stratified sampling — the reproducible
    * train/test-split pattern for a training-data pipeline: a row is
    * sampled iff xxhash64(key, salt) mod 10000 < fraction·10000. Unlike
    * `sampleBy`/`randomSplit` (per-partition RNG), the decision depends
    * only on the KEY, so the same rows are chosen regardless of
    * partitioning, cluster size, or run. For a disjoint complement
    * (train/test), keep the SAME salt and take the complementary bucket
    * range (`>= fraction·10000`) — a different salt gives an independent
    * hash and overlapping splits. Per-row, shuffle-free, codegen'd. */
  def hashSample(s: SparkSession, d: String, fraction: Double = 0.1,
      salt: Long = 42L): DataFrame =
    Tables.events(s, d)
      .where(pmod(xxhash64(col("user_id"), lit(salt)), lit(10000L))
        < (fraction * 10000).toLong)
      .select("event_id", "user_id", "event_type", "value")

  /** Oracle-able audit of [[hashSample]] — the gate form. xxhash64's
    * bucket placement is JVM-side, so the sample MEMBERSHIP has no
    * cross-engine oracle; what DOES oracle is the sampler's contract,
    * emitted as per-event-type invariant verdicts beside exact totals:
    *
    *  - `rerun_equal`: the sample re-derived from a REPARTITIONED scan
    *    (different partitioning, fresh plan) is row-identical —
    *    count + distinct-user count + Σ event_id signatures all match —
    *    the "decision depends only on the KEY" claim as a hash-checked
    *    boolean rather than prose.
    *  - `complement_exact`: the `>= cut` complement is disjoint and
    *    exhaustive (n_sampled + n_complement = n_total exactly).
    *  - `user_frac_in_bounds`: the sampled-user fraction sits inside a
    *    loose [fraction/3, 2·fraction] envelope — a regression tripwire
    *    for the cut arithmetic, not a statistical test.
    *
    * The DuckDB oracle computes the exact totals and pins every verdict
    * to literal TRUE — a false verdict breaks the row hash. Cost: two
    * scans + one vocabulary-sized agg join, all partial-aggregated. */
  def hashSampleAudit(s: SparkSession, d: String, fraction: Double = 0.1,
      salt: Long = 42L): DataFrame = {
    val cut = (fraction * 10000).toLong
    val base = Tables.events(s, d)
      .select("event_id", "user_id", "event_type", "value")
    def pick = pmod(xxhash64(col("user_id"), lit(salt)), lit(10000L)) < cut
    def digest(df: DataFrame, tag: String): DataFrame =
      df.groupBy("event_type").agg(
        count(lit(1)).as(s"n_$tag"),
        count_distinct(col("user_id")).as(s"u_$tag"),
        sum(col("event_id")).as(s"sig_$tag"))
    val s1 = digest(base.where(pick), "s1")
    val s2 = digest(base.repartition(7, col("event_id")).where(pick), "s2")
    val compl = base.where(!pick).groupBy("event_type")
      .agg(count(lit(1)).as("n_compl"))
    val totals = base.groupBy("event_type").agg(
      count(lit(1)).as("n_total"),
      count_distinct(col("user_id")).as("n_users"))
    totals
      .join(s1, Seq("event_type")).join(s2, Seq("event_type"))
      .join(compl, Seq("event_type"))
      .select(col("event_type"), col("n_total"), col("n_users"),
        (col("n_s1") === col("n_s2") && col("u_s1") === col("u_s2")
          && col("sig_s1") === col("sig_s2")).as("rerun_equal"),
        (col("n_s1") + col("n_compl") === col("n_total")).as("complement_exact"),
        (col("u_s1").cast("double") / col("n_users") >= fraction / 3
          && col("u_s1").cast("double") / col("n_users") <= fraction * 2)
          .as("user_frac_in_bounds"))
  }

  /** Layout extension — the z-order clustering KEY as a gate query:
    * Morton-interleave (user_id bucket, value bucket) into one sortable
    * integer (see `Layout.zvalue` for why; `Layout.zorderLayout` is the
    * physical write path, LayoutSpec measures the pruning win). The
    * key computation itself is exact shift/mask integer math — fully
    * oracle-able, unlike the partition-dependent layout. Inputs are
    * non-negative (value >= 0 in this schema), so Spark's pmod and the
    * oracle's % agree. */
  def zorderKey(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"),
        pmod(col("user_id"), lit(4096L)).as("zx"),
        pmod(floor(col("value")).cast("long"), lit(4096L)).as("zy"))
      .withColumn("zval", Layout.zvalue(col("zx"), col("zy")))

  /** Sampling extension — deterministic per-key sampling: each user's k
    * events chosen by an LCG mix of the event id ((id mod 2^31) ·
    * 1103515245 + 12345 mod 2^31 — pure integer ops both engines
    * compute identically, so unlike xxhash64-based [[hashSample]] this
    * IS oracle-able). Same WindowGroupLimit plan as [[topkPerKey]]: no
    * global sort, per-key state bounded at k. The per-key uniform
    * sample is the "n examples per domain" selection every training-mix
    * debug pass runs. */
  def perKeySample(s: SparkSession, d: String, k: Int = 2): DataFrame = {
    val mix = pmod(
      pmod(col("event_id"), lit(2147483648L)) * 1103515245L + 12345L,
      lit(2147483648L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("sample_key"), col("event_id"))
    Tables.events(s, d)
      .withColumn("sample_key", mix)
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
      .select("user_id", "rank", "event_id", "event_type", "value", "sample_key")
  }

  /** Deterministic STRATIFIED train/val/test split — the
    * every-training-pipeline primitive: each row lands in a split by the
    * same LCG mix as [[perKeySample]] (pure integer arithmetic — both
    * engines compute it identically, unlike rand() or a JVM hash), with
    * cut points at 80/90 of the mix mod 100, and the report shape is
    * per-(stratum, split) counts with the within-stratum fraction. The
    * split is REPRODUCIBLE (reruns and both engines agree row-for-row),
    * stratified by construction (the mix is independent of event_type,
    * so each stratum splits ~80/10/10), and auditable (this query IS
    * the audit). One partial-aggregated groupBy — scan-speed at any
    * scale; the assignment itself costs three integer ops per row. */
  def stratifiedSplit(s: SparkSession, d: String): DataFrame = {
    val mix = pmod(
      pmod(col("event_id"), lit(2147483648L)) * 1103515245L + 12345L,
      lit(2147483648L))
    val bucket = pmod(mix, lit(100L))
    Tables.events(s, d)
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
      .groupBy("event_type", "split")
      .agg(count(lit(1)).as("n"))
      .withColumn("stratum_n", sum("n").over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_type")))
      .withColumn("fraction",
        round(col("n").cast("double") / col("stratum_n"), 6))
  }

  /** Semi-structured extension — typed JSON extraction from the `props`
    * column. ONE `from_json` with an explicit schema (a single codegen'd
    * JsonToStructs parse per row); repeated `get_json_object` calls on
    * the same column would re-parse the document once per path, which at
    * 100 TB is the difference between one scan-speed pass and several.
    * Integer sums need no DECIMAL recipe (exact in BIGINT). */
  def jsonExtract(s: SparkSession, d: String): DataFrame = {
    val schema = StructType(Seq(StructField("k", LongType)))
    Tables.events(s, d)
      .withColumn("p", from_json(col("props"), schema))
      .select(col("event_type"), col("p.k").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("k_sum"),
        sum(when(col("k") > 50, 1L).otherwise(0L)).as("n_high"))
  }

  /** Array higher-order functions as a first-class surface (the last
    * §2.8 extension note): `transform` / `filter` / `aggregate` /
    * `zip_with` over the `array<float>` embedding column — the exact
    * expression family Similarity uses internally, here as an
    * oracle-able row per vector. Determinism recipe: every lambda casts
    * float→double FIRST (exact), folds run left-to-right with a 0.0
    * seed on both engines (DuckDB `list_reduce` seeds with the first
    * element, and 0.0 + x ≡ x for the non-empty fixed-dim vectors), so
    * the doubles agree bit-for-bit; round(6) is belt and braces. All
    * codegen-adjacent scalar expression work, one scan, no shuffle
    * except the final ordering — at 100 TB this is scan-speed. */
  def arrayHof(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        size(col("embedding")).as("n_dims"),
        size(expr("filter(embedding, x -> x > 0.0F)")).as("n_pos"),
        round(expr(
          "aggregate(embedding, 0.0D, (acc, x) -> acc + CAST(x AS DOUBLE))"),
          6).as("sum_all"),
        round(expr(
          """aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
            |0.0D, (acc, x) -> acc + x)""".stripMargin), 6).as("sum_sq"),
        round(expr(
          """aggregate(zip_with(embedding, reverse(embedding),
            |(a, b) -> CAST(a AS DOUBLE) * CAST(b AS DOUBLE)),
            |0.0D, (acc, x) -> acc + x)""".stripMargin), 6).as("rev_dot"))

  /** S2+S5 — CSV sink + scan with an EXPLICIT schema, no header, mirroring
    * the reference's declared 14-field StructType CSV source
    * (`sensor_data_etl.py:35-51`). Round-trips a projection of events
    * through CSV, then aggregates — proving the scan path parses with the
    * declared types. */
  /** JVM-unique roundtrip scratch dir — see [[graft.Scratch]] (PID
    * suffix for concurrent-run isolation, shutdown-hook cleanup). */
  private def roundtripTmp(fmt: String, d: String): String =
    graft.Scratch.dir(s"${fmt}_$d")

  def csvRoundtrip(s: SparkSession, d: String): DataFrame = {
    val tmp = roundtripTmp("csv", d)
    Tables.events(s, d)
      .select("event_id", "user_id", "event_type", "value")
      .write.mode("overwrite").csv(tmp)
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    s.read.schema(schema).csv(tmp)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), exactSum(col("value")).as("value_sum"))
  }

  /** S-family — JSON-Lines sink + scan with an explicit schema: the
    * interchange format most raw LLM-corpus drops arrive in. Round-trips
    * the documents table through .json (one object per line, full JSON
    * string escaping), reads it back with declared types, and aggregates
    * per language with content-sensitive md5 extrema — a corrupted or
    * lossy escape/parse of ANY text value would shift min/max md5 and
    * break the oracle hash, so the roundtrip is proven lossless, not just
    * row-count-preserving. */
  def jsonlRoundtrip(s: SparkSession, d: String): DataFrame = {
    val tmp = roundtripTmp("jsonl", d)
    Tables.documents(s, d)
      .select("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").json(tmp)
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("n_chars", LongType)))
    s.read.schema(schema).json(tmp)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        sum("n_chars").as("chars_sum"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"),
        min(md5(col("text"))).as("min_text_md5"),
        max(md5(col("text"))).as("max_text_md5"))
  }

  /** S-family — ORC sink + scan (the other columnar format Spark ships
    * natively; Avro is NOT covered — the spark-avro DataSource jar is not
    * in this distribution). Same lossless-roundtrip proof as
    * [[jsonlRoundtrip]], grouped by `source` so the aggregate exercises a
    * different column. */
  def orcRoundtrip(s: SparkSession, d: String): DataFrame = {
    val tmp = roundtripTmp("orc", d)
    Tables.documents(s, d)
      .select("doc_id", "text", "source", "n_chars")
      .write.mode("overwrite").orc(tmp)
    s.read.orc(tmp)
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum("n_chars").as("chars_sum"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"),
        min(md5(col("text"))).as("min_text_md5"),
        max(md5(col("text"))).as("max_text_md5"))
  }

  /** Parquet SCHEMA EVOLUTION roundtrip — the lakehouse reality the
    * plain roundtrips skip: long-lived tables accrete columns, so a
    * reader must reconcile files written under different schema
    * versions. Stage two generations under one directory (v1: the base
    * event columns; v2: the same schema plus a `quality_score` column
    * only new files carry), read back with `mergeSchema` — Spark
    * reconciles by NAME and nulls the missing column for v1 files (at
    * 100 TB this is why evolved tables never rewrite history: old
    * files stay byte-identical, the new column is null-filled at scan
    * time) — and aggregate per type with the null accounting visible
    * (n_scored vs n). Fully oracle-able: the oracle rebuilds the same
    * two generations with a CASE on the deterministic generation
    * split. */
  def schemaEvolution(s: SparkSession, d: String): DataFrame = {
    val tmp = roundtripTmp("evolve", d)
    if (!new java.io.File(tmp, "_staged").exists()) {
      val ev = Tables.events(s, d)
        .select("event_id", "user_id", "event_type", "value")
      // plain v1/v2 dir names — `gen=1` would be partition-DISCOVERED
      // as a column, which is a different mechanism than schema merge
      ev.where(col("event_id") % 2 === 0)
        .write.mode("overwrite").parquet(s"$tmp/v1")
      ev.where(col("event_id") % 2 === 1)
        .withColumn("quality_score", floor(col("value")).cast("long"))
        .write.mode("overwrite").parquet(s"$tmp/v2")
      assert(new java.io.File(tmp, "_staged").createNewFile())
    }
    s.read.option("mergeSchema", "true")
      .parquet(s"$tmp/v1", s"$tmp/v2")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        count(col("quality_score")).as("n_scored"),
        exactSum(col("value")).as("value_sum"),
        sum(coalesce(col("quality_score"), lit(0L))).as("score_sum"))
  }

  /** J-family extension — FULL OUTER join: per-user click counts against
    * per-user purchase counts, unmatched sides preserved with coalesced
    * zeros and a match-kind label. Both inputs are aggregates keyed by
    * the join key, so the join is 1:1 — a plain shuffled hash join on
    * user_id with no row multiplication; full-outer only adds the
    * null-row emission to each side's unmatched partitions. */
  def joinOuter(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    def perUser(t: String, out: String) =
      ev.where(col("event_type") === t)
        .groupBy("user_id").agg(count(lit(1)).as(out))
    perUser("click", "n_clicks")
      .join(perUser("purchase", "n_purchases"), Seq("user_id"), "full_outer")
      .select(col("user_id"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
        coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
        when(col("n_clicks").isNull, lit("purchase_only"))
          .when(col("n_purchases").isNull, lit("click_only"))
          .otherwise(lit("both")).as("kind"))
  }

  /** W-family extension — the SQL ranking-function battery over one
    * series-partitioned window: row_number / rank / dense_rank /
    * percent_rank / ntile(4), ordered by (value DESC, event_id) per
    * event_type. The unique event_id tiebreak makes every rank
    * deterministic (the oracle-determinism contract); percent_rank is
    * the only float and rounds to 6. The window partitions by
    * event_type — five partitions of corpus/5 rows each; at 100 TB the
    * same battery would partition by a higher-cardinality key or ride
    * the TakeOrdered top-k pattern (`q_orderby_topk`), and the
    * WindowGroupLimit prune (`q_topk_per_key`) covers the rank-filter
    * form. Output keeps every 97th event so the gate row stays bounded
    * while still sampling all rank positions (the filter runs AFTER the
    * window, so ranks are computed over the full partition). */
  def rankFamily(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type")
      .orderBy(col("value").desc, col("event_id"))
    Tables.events(s, d)
      .select(col("event_id"), col("event_type"), col("value"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        round(percent_rank().over(w), 6).as("prnk"),
        ntile(4).over(w).as("quartile"))
      .where(col("event_id") % 97 === 0)
  }

  /** Deterministic global training order — every document gets a unique
    * position in a pseudo-random permutation (the "shuffle the corpus
    * once per epoch" step a training loader needs), WITHOUT a global
    * `row_number` window: a single-partition sort over the whole corpus
    * is the reference's W1 hazard at its worst.
    *
    * Two-level construction on the same LCG mix as [[perKeySample]]
    * (pure integer arithmetic, reproducible on any engine):
    *  1. bucket = the mix's high 8 bits (`mix div 2^23` on a 31-bit
    *     mix) — bucket order IS mix-prefix order, so concatenating
    *     buckets in id order preserves the global (mix, doc_id) order;
    *  2. `row_number` within each bucket (partitions are ~corpus/256 —
    *     bounded, uniform by LCG mixing), plus per-bucket offsets from a
    *     256-row running sum. position = offset + within-bucket rank.
    * The only unpartitioned window in the plan runs over ≤ 256 bucket
    * rows. Recurse the bucket split if corpus/256 ever exceeds a task. */
  def trainOrder(s: SparkSession, d: String): DataFrame = {
    val mix = pmod(
      pmod(col("doc_id"), lit(2147483648L)) * 1103515245L + 12345L,
      lit(2147483648L))
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), mix.as("mix"))
      .withColumn("bucket", expr("mix div 8388608"))
    val wIn = Window.partitionBy("bucket").orderBy(col("mix"), col("doc_id"))
    val wOff = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = docs.groupBy("bucket").agg(count(lit(1)).as("bn"))
      .withColumn("offset", coalesce(sum("bn").over(wOff), lit(0L)))
      .select("bucket", "offset")
    docs.join(broadcast(offsets), Seq("bucket"))
      .select(col("doc_id"), col("mix"),
        (col("offset") + row_number().over(wIn)).as("pos"))
  }

  /** A-family extension — GROUPING SETS with an EXPLICIT subset of
    * rollup levels: (type, day), (day), () — the report shape neither
    * `cube` (all 2ᵏ combos — [[cubeDaily]]) nor `rollup` (prefix chain)
    * expresses, here skipping the per-type-all-days level a dashboard
    * doesn't render. Physically one Expand (each input row emits one
    * copy per set) feeding ONE partial-aggregated shuffle — k levels
    * for one pass, vs k separate groupBys = k scans + k shuffles.
    * `grouping_id()` disambiguates a real NULL key from a rolled-up
    * one — same bitmask contract as DuckDB's GROUPING(). Sum is
    * DECIMAL-exact ([[exactSum]]). */
  def groupingSetsDaily(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("day", to_date(col("ts")))
      .groupingSets(
        Seq(Seq(col("event_type"), col("day")), Seq(col("day")), Seq()),
        col("event_type"), col("day"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        exactSum(col("value")).as("value_sum"))

  /** ROLLUP — the hierarchical prefix chain (type, day) → (type) → ()
    * that completes the cube / grouping-sets / rollup trilogy: the
    * drill-down report shape (per-type-per-day, per-type subtotal, grand
    * total) without cube's (day)-only level. Same one-Expand one-shuffle
    * physical plan; grouping_id separates subtotal rows from real NULL
    * keys. */
  def rollupDaily(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("day", to_date(col("ts")))
      .rollup("event_type", "day")
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        exactSum(col("value")).as("value_sum"))
}
