package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sorted-neighborhood candidate generation (SURVEY §2 D13) — the
  * classic record-linkage move (Hernández & Stolfo 1995): order the
  * corpus by a similarity-preserving sort key and compare only rows
  * within a sliding window of w positions, turning the O(n²) pair
  * space into O(n·w) while near-duplicates (which sort together)
  * survive.
  *
  * Scale shape — the textbook method needs a GLOBAL order, and the
  * naive Spark expression (one unpartitioned window over the corpus)
  * funnels every row through one task: the 100 TB failure mode. Here
  * the global order is realized DISTRIBUTED:
  *
  *   1. `repartitionByRange` on the sort key + within-partition sort
  *      — ascending partition ids hold ascending key ranges, so the
  *      concatenation of partitions IS the global order, materialized
  *      once (lazy checkpoint, two consumers);
  *   2. within-partition window pairs stream through one
  *      mapPartitions sliding buffer of w−1 rows — genuine
  *      per-partition imperative logic, O(w) state, no shuffle;
  *   3. pairs that STRADDLE a partition boundary only ever involve
  *      each partition's first/last w−1 rows (an interior row is ≥
  *      w−1 positions from the next partition by definition), so one
  *      bounded pass collects those edge rows + per-partition counts
  *      — ≤ 2(w−1) ids + one count per partition, driver-bounded at
  *      any corpus size — and the driver reconstructs their global
  *      ranks from the count prefix-sums and emits the cross-boundary
  *      pairs directly.
  *
  * The result is exactly the global-window pair set (the DuckDB
  * oracle computes it with one global row_number — an independent
  * formulation), at one range shuffle + one streamed pass.
  */
object SortedNeighborhood {

  /** All ordered pairs (a, b) of ids at global sort-order distance
    * 1 ≤ d ≤ w−1 under the total order (sk, id), a before b.
    *
    * @param keyed two columns: `sk` (string sort key) and `id`
    *              (unique long). Uniqueness of `id` makes the order
    *              total, so partition bounds cannot split ties.
    * @param parts range-partition count (the sort parallelism). */
  def windowPairs(s: SparkSession, keyed: DataFrame, w: Int,
                  parts: Int = 32): DataFrame = {
    import s.implicits._
    require(w >= 2, s"window must be >= 2, got $w")
    val sorted = keyed
      .select(col("sk").cast("string").as("sk"), col("id").cast("long").as("id"))
      .repartitionByRange(parts, $"sk", $"id")
      .sortWithinPartitions($"sk", $"id")
      .localCheckpoint(false)
    // 2. within-partition sliding window, O(w) state per task
    val inner = sorted.as[(String, Long)].mapPartitions { it =>
      val buf = scala.collection.mutable.ArrayDeque.empty[Long]
      it.flatMap { case (_, id) =>
        val ps = buf.toSeq.map(p => (p, id))
        buf.append(id)
        if (buf.size > w - 1) buf.removeHead(): Unit
        ps
      }
    }.toDF("a", "b")
    // 3. per-partition edge summaries: (pid, count, first w−1 ids,
    // last w−1 ids) — the ONLY rows a boundary pair can touch
    val edgeInfo = sorted.withColumn("pid", spark_partition_id())
      .as[(String, Long, Int)].mapPartitions { it =>
        var pid = -1
        var n = 0L
        val head = scala.collection.mutable.ArrayBuffer.empty[Long]
        val tail = scala.collection.mutable.ArrayDeque.empty[Long]
        it.foreach { case (_, id, p) =>
          pid = p; n += 1
          if (head.size < w - 1) head += id
          tail.append(id)
          if (tail.size > w - 1) tail.removeHead(): Unit
        }
        if (n == 0L) Iterator.empty
        else Iterator.single((pid, n, head.toSeq, tail.toSeq))
      }.collect().sortBy(_._1)
    val offsets = edgeInfo.scanLeft(0L)(_ + _._2).init
    // global rank -> (pid, id) for every edge row (head/tail overlap
    // in short partitions collapses on the rank key)
    val byRank = scala.collection.mutable.SortedMap.empty[Long, (Int, Long)]
    edgeInfo.zip(offsets).foreach { case ((pid, n, head, tail), off) =>
      head.zipWithIndex.foreach { case (id, i) => byRank(off + i) = (pid, id) }
      tail.zipWithIndex.foreach { case (id, i) =>
        byRank(off + n - tail.size + i) = (pid, id)
      }
    }
    val edge = byRank.toIndexedSeq // (rank, (pid, id)) ascending
    // ranks ascend, so the first j past the w−1 gap ends i's scan:
    // O(E·w) total, not O(E²) — E = edge-row count ≈ 2(w−1)·parts
    val seam = edge.indices.iterator.flatMap { i =>
      Iterator.range(i + 1, edge.length)
        .map(edge)
        .takeWhile(_._1 - edge(i)._1 <= (w - 1).toLong)
        .filter(_._2._1 != edge(i)._2._1) // same-partition pairs: pass 2's
        .map(e => (edge(i)._2._2, e._2._2))
    }.toSeq
    inner.union(seam.toDF("a", "b"))
  }
}
