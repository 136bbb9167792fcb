package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered (time-series) operators: adjacent-row intervals, sliding
  * windows, supervised window splits, fixed batching, prefix splits,
  * row offsets.
  *
  * Reference (cites into /root/reference/):
  *  - `get_interval_dataset` (tfdataset_utilities.py:162-170): adjacent-row
  *    timestamp difference via zip(cur, next). Quirk (SURVEY §2.12): it
  *    computes `cur − next` (negative interval); we default to the
  *    principled `next − cur` sign with a flag for parity.
  *  - `tfdataset_to_windowed_tfdataset` (tfdataset.py:197-203): sliding
  *    window size W, shift 1, drop_remainder=True.
  *  - `windowed_dataset_v1` (tfdataset.py:256-263): window → (first W−1
  *    rows = input, last row = target).
  *  - `tfdataset_to_batched_tfdataset` (tfdataset.py:290-298): fixed
  *    batches, drop_remainder=True.
  *  - `get_train_test_eval_dataset` (datapipeline.py:404-424): sequential
  *    prefix split by fractions (NOT random — correct for time-series).
  *  - `.skip(45000)` offset (examples/datapipeline_test.py:45).
  *
  * Order semantics (SURVEY §7.4): the reference assumes file order. We make
  * order explicit — every operator takes partition + order columns. At
  * scale the series key (`user_id`/device id) partitions the window so
  * work parallelizes per series; a global (unpartitioned) window is only
  * for small parity tests.
  */
object WindowOps {

  private def w(partitionBy: Seq[String], orderBy: Seq[String]) = {
    val base = if (partitionBy.isEmpty) Window.partitionBy() else Window.partitionBy(partitionBy.map(col): _*)
    base.orderBy(orderBy.map(col): _*)
  }

  /** Row index (1-based) within each partition by the given order. */
  def withRowIdx(df: DataFrame, partitionBy: Seq[String], orderBy: Seq[String], idxCol: String = "rn"): DataFrame =
    df.withColumn(idxCol, row_number().over(w(partitionBy, orderBy)))

  /** Adjacent-row interval of an epoch-seconds column. `referenceSign=true`
    * reproduces the reference's negative `cur − next` quirk.
    */
  def lagInterval(tsSecCol: Column, partitionBy: Seq[String], orderBy: Seq[String],
                  referenceSign: Boolean = false): Column = {
    val nxt = lead(tsSecCol, 1).over(w(partitionBy, orderBy))
    if (referenceSign) tsSecCol - nxt else nxt - tsSecCol
  }

  /** Sliding windows of `size`, shift 1, only complete windows
    * (drop_remainder). Adds `win: array<valueCol-type>` anchored at each
    * window's first row.
    */
  def slidingWindow(df: DataFrame, valueCol: Column, size: Int,
                    partitionBy: Seq[String], orderBy: Seq[String]): DataFrame =
    df.withColumn("win", collect_list(valueCol).over(w(partitionBy, orderBy).rowsBetween(0, size - 1)))
      .filter(org.apache.spark.sql.functions.size(col("win")) === size)

  /** Next-step supervision split of a sliding window: `input` = first
    * W−1 elements, `target` = last element (`windowed_dataset_v1`).
    */
  def supervisedWindow(df: DataFrame, valueCol: Column, size: Int,
                       partitionBy: Seq[String], orderBy: Seq[String]): DataFrame =
    slidingWindow(df, valueCol, size, partitionBy, orderBy)
      .withColumn("input", slice(col("win"), 1, size - 1))
      .withColumn("target", element_at(col("win"), size))

  /** Fixed batching with drop_remainder: assign `batch_id` by position,
    * keep only full batches of `batchSize`. Returns one row per (batch,
    * element) — callers `collect_list` if they need the packed form.
    */
  def fixedBatches(df: DataFrame, batchSize: Int,
                   partitionBy: Seq[String], orderBy: Seq[String]): DataFrame = {
    val withIdx = withRowIdx(df, partitionBy, orderBy)
    val cnt = Window.partitionBy(partitionBy.map(col): _*)
    withIdx
      .withColumn("batch_id", floor((col("rn") - 1) / batchSize).cast("long"))
      .withColumn("pos_in_batch", ((col("rn") - 1) % batchSize).cast("long"))
      .withColumn("_n", max(col("rn")).over(cnt))
      .filter((col("batch_id") + 1) * batchSize <= col("_n"))
      .drop("_n")
  }

  /** Sequential prefix split by fractions (sums to 1.0). Two-pass like the
    * reference: requires total N per partition (window max), then labels
    * rows `train` / `test` / `eval` by position.
    */
  def prefixSplit(df: DataFrame, fractions: (Double, Double, Double),
                  partitionBy: Seq[String], orderBy: Seq[String]): DataFrame = {
    val (fTrain, fTest, fEval) = fractions
    require(math.abs(fTrain + fTest + fEval - 1.0) < 1e-9, "fractions must sum to 1.0")
    val withIdx = withRowIdx(df, partitionBy, orderBy)
    val n = max(col("rn")).over(Window.partitionBy(partitionBy.map(col): _*))
    withIdx.withColumn("split",
      when(col("rn") <= floor(n * fTrain), "train")
        .when(col("rn") <= floor(n * fTrain) + floor(n * fTest), "test")
        .otherwise("eval"))
  }

  /** Skip the first `n` rows in order (reference `.skip(45000)`). */
  def offsetSkip(df: DataFrame, n: Long, partitionBy: Seq[String], orderBy: Seq[String]): DataFrame =
    withRowIdx(df, partitionBy, orderBy).filter(col("rn") > n).drop("rn")

  /** Seeded whole-dataset shuffle — the scalable analog of the
    * reference's buffered shuffle (`get_shuffled_tfdataset`,
    * tfdataset.py:285-288, buffer=1000). Sorts by a content hash salted
    * with the seed rather than `rand(seed)`: `rand` seeds per
    * *partition*, so its "seeded" order silently changes with input
    * partitioning — a content hash is identical on any cluster layout.
    * Ties (fully duplicate rows) stay adjacent, which is acceptable for
    * a shuffle.
    */
  def shuffled(df: DataFrame, seed: Long): DataFrame =
    df.orderBy(xxhash64(lit(seed) +: df.columns.map(col): _*))
}
