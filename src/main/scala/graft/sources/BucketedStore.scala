package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins — the "pre-shuffle once,
  * join forever" half of the engine's shuffle budget (SURVEY §5).
  *
  * A fact table that is repeatedly joined or aggregated on one key
  * (lineitem on l_orderkey, documents on doc_id) pays one exchange
  * per query forever if stored as plain files. Writing it
  * `bucketBy(n, key)` persists the hash partitioning in the catalog;
  * any later equi-join or groupBy on that key reads the buckets
  * back ALREADY distributed — the physical plan has no Exchange on
  * the bucketed side (asserted by spec). Two tables bucketed the
  * same way join with no shuffle at all.
  *
  * At warehouse scale this is the difference between an O(data)
  * shuffle per query and none; the bucket count is the documented
  * knob (pick ≈ cluster cores; it caps join parallelism on the
  * bucketed path).
  */
object BucketedStore {

  /** Write `df` as a bucketed managed table (overwriting any previous
    * one). `buckets` should be sized to the target parallelism. */
  def write(df: DataFrame, table: String, key: String, buckets: Int,
            sortKeys: Seq[String] = Nil): Unit = {
    val base = df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
    (if (sortKeys.nonEmpty) base.sortBy(sortKeys.head, sortKeys.tail: _*) else base)
      .saveAsTable(table)
  }

  /** Read a bucketed table back (its bucket spec rides along from the
    * catalog — downstream plans see the hash distribution). */
  def read(s: SparkSession, table: String): DataFrame = s.table(table)
}
