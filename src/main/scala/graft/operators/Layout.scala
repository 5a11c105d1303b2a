package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators (SURVEY §2.9 X3 + the 100 TB playbook the
  * reference lacked): keyed repartitioning, bucketed co-located joins,
  * and salted skew joins. The reference hand-tuned magic
  * `repartition(20/50/100/200)` constants; these helpers encode the
  * *reasons* one reshapes data instead.
  */
object Layout {

  /** Keyed repartition (hash, not round-robin): co-locates rows by join/agg
    * key so the next keyed operation is exchange-free. Prefer this over the
    * reference's bare `repartition(n)` — round-robin buys parallelism but
    * destroys co-location. */
  def repartitionByKey(df: DataFrame, n: Int, keys: Column*): DataFrame =
    df.repartition(n, keys: _*)

  /** Write a table bucketed+sorted by key. Reading both sides back from
    * bucketed tables makes equi-joins exchange-free (SortMergeJoin with no
    * Exchange) — at 100 TB this is THE way to amortize a fact table's
    * shuffle across every downstream join. Requires a metastore table
    * (saveAsTable), not a bare path. */
  def writeBucketed(df: DataFrame, table: String, nBuckets: Int, key: String,
      sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet").bucketBy(nBuckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Write partitioned parquet (one directory per key value). At 100 TB
    * this is the other half of the layout story next to bucketing:
    * queries filtering on the partition key prune whole directories
    * before any IO (PartitionFilters in the scan, see LayoutSpec). */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  /** Z-order (Morton) interleave of two bounded non-negative int columns
    * — the multi-dimensional clustering key behind lakehouse OPTIMIZE
    * ZORDER: sorting by the interleaved bits keeps rows close in BOTH
    * dimensions physically adjacent, so min/max column statistics prune
    * files for predicates on EITHER dimension (a single-column sort only
    * prunes its own column). Pure codegen'd shift/mask/add expressions
    * over `bits` bit positions — exact integer math, fully oracle-able.
    * Inputs must already be in [0, 2^bits); callers bucket/pmod first. */
  def zvalue(x: Column, y: Column, bits: Int = 12): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduceLeft(_ + _)

  /** Range-partition + locally sort by the z-value: the write layout for
    * a table queried by two selective dimensions. Each output partition
    * covers a contiguous z-range = a bounded rectangle union in (x, y),
    * so each file's (x, y) min/max footprint is small — LayoutSpec
    * measures the bounding-box shrinkage vs a hash layout. */
  def zorderLayout(df: DataFrame, n: Int, zCol: String): DataFrame =
    df.repartitionByRange(n, col(zCol)).sortWithinPartitions(zCol)

  /** Salted inner equi-join for skewed keys: explode the small/dim side
    * into `salt` replicas, scatter the fact side's hot keys uniformly with
    * a random-free deterministic salt (hash of a unique column), join on
    * (key, salt). Turns one straggler partition into `salt` even ones.
    * AQE's skew-join handles moderate skew automatically; salting is for
    * the pathological keys AQE can't split (single-key hot spots in
    * aggregations that follow). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, uniqueCol: String,
      salt: Int = 8): DataFrame = {
    val saltedFact = fact.withColumn("__salt", pmod(hash(col(uniqueCol)), lit(salt)))
    val saltedDim = dim
      .withColumn("__salt", explode(array((0 until salt).map(lit): _*)))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted EXACT distinct count per (skewed, low-cardinality) key.
    * `count_distinct(u) GROUP BY key` shuffles every (key, u) pair to the
    * single reducer owning `key` — with a handful of hot keys (the events
    * table's event_type) that is one straggler task per key no matter how
    * wide the cluster is. Salting by `pmod(hash(u), salt)` splits each
    * key's distinct-set across `salt` reducers; because every distinct
    * `u` hashes to exactly ONE salt bucket, the per-bucket distinct
    * counts are disjoint and their sum is the exact answer — the
    * rewrite stays semantics-free (the oracle pins it against a plain
    * COUNT(DISTINCT)). Phase 2 shuffles only keys × salt rows. This is
    * the aggregation twin of [[saltedJoin]]: the pattern for the
    * single-hot-key aggregations AQE's skew handling cannot split. */
  def saltedDistinctCount(df: DataFrame, key: String, uniqueCol: String,
      salt: Int = 32): DataFrame =
    df.groupBy(col(key), pmod(hash(col(uniqueCol)), lit(salt)).as("__salt"))
      .agg(count_distinct(col(uniqueCol)).as("__part"))
      .groupBy(col(key))
      .agg(sum(col("__part")).as("n_distinct"))
}
