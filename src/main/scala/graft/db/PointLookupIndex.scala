package graft.db

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** RAM-resident point-lookup index over the cold tier: per-partition
  * sorted primitive id arrays plus row payloads, queried by a bare RDD
  * job doing binary search in each partition — the Spark-native
  * analogue of the reference's positional numpy / RocksDB candidate
  * reads (`BinaryVectorDB.py:236` holds the looked-up candidates in a
  * Python list the same way).
  *
  * Why not a DataFrame `isin` lookup on a cached relation: measured
  * 50–300 ms/query between per-call Catalyst planning, codegen and
  * columnar row materialization — and a BinaryType column (emb_int8)
  * silently disables the vectorized cache reader, so the row-based
  * fallback materializes EVERY column of every row to advance its
  * variable-length cursors. The indexed RDD job pays only the ~10 ms
  * job-launch floor: each partition binary-searches the requested ids
  * against its sorted block and ships back just the hits
  * (≤ k·oversample rows, ~100 KB).
  *
  * Scale contract: the index holds the cold tier in executor memory
  * (~1 KB/row for 1024-dim int8 + doc text) — the same "index resident
  * in RAM" regime the reference's published latencies assume. On a
  * 1000-executor cluster each executor holds N/1000 rows and the
  * lookup job touches every partition with one task; the driver
  * receives only matches. For datasets beyond cluster RAM, stay on the
  * parquet path ([[VectorDB.searchVector]]'s default): the pushed-down
  * id filter does min/max row-group pruning on the doc_id-sorted
  * snapshot instead.
  */
final class PointLookupIndex private (
    private val blocks: RDD[PointLookupIndex.Block]) {

  /** Batch point lookup: returns (doc_id, emb_int8, doc) for every id
    * present in the index, in no particular order. One Spark job, no
    * Catalyst involvement.
    */
  def lookup(ids: Array[Long]): Array[(Long, Array[Byte], String)] = {
    if (ids.isEmpty) return Array.empty
    val sorted = ids.clone(); java.util.Arrays.sort(sorted)
    blocks.sparkContext.runJob(blocks,
      (it: Iterator[PointLookupIndex.Block]) => {
        if (!it.hasNext) Array.empty[(Long, Array[Byte], String)]
        else {
          val b = it.next()
          // Skip partitions whose id range can't contain any request.
          if (b.ids.isEmpty || sorted.last < b.ids.head || sorted.head > b.ids.last)
            Array.empty[(Long, Array[Byte], String)]
          else sorted.flatMap { id =>
            val i = java.util.Arrays.binarySearch(b.ids, id)
            if (i >= 0) Some((id, b.int8(i), b.doc(i))) else None
          }
        }
      }).flatten
  }

  def unpersist(): Unit = blocks.unpersist()
}

object PointLookupIndex {
  /** One partition's sorted block: parallel arrays ordered by id. */
  private[db] case class Block(ids: Array[Long], int8: Array[Array[Byte]],
                               doc: Array[String])

  /** Build (and materialize) the index from a cold-tier relation with
    * columns (doc_id:long, doc:string, emb_int8:binary). Each source
    * partition becomes one sorted block; no shuffle.
    */
  def build(docs: DataFrame): PointLookupIndex = {
    val blocks = docs.select("doc_id", "emb_int8", "doc").rdd.mapPartitions { it =>
      val rows = it.toArray
      val order = rows.indices.sortBy(rows(_).getLong(0)).toArray
      Iterator.single(Block(
        order.map(rows(_).getLong(0)),
        order.map(o => rows(o).getAs[Array[Byte]](1)),
        order.map(o => rows(o).getString(2))))
    }.persist(StorageLevel.MEMORY_ONLY)
    blocks.count()
    new PointLookupIndex(blocks)
  }
}
