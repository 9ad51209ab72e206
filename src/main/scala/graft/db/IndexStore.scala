package graft.db

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Locations for derived index layouts (IVF cell layouts, k-means cells).
  *
  * On local[32] a `java.nio` temp dir happens to work, but on a real
  * cluster executors cannot read the driver's /tmp — a persisted
  * partitioned layout must live on a filesystem every executor can reach.
  * Indexes therefore go under
  * `<spark.sql.warehouse.dir>/graft-indexes/<kind>-<digest(source)>`,
  * resolved and created through the Hadoop `FileSystem` API exactly like
  * `VectorDB.writeSnapshot`, so the identical code serves HDFS/S3/ABFS
  * when the warehouse points there.
  */
object IndexStore {

  /** Deterministic per-(kind, source) index directory, created if absent,
    * returned fully qualified (scheme + authority) so downstream
    * reads/writes resolve through the same FileSystem.
    */
  def dirFor(spark: SparkSession, kind: String, source: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(source.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    val root = new Path(new Path(spark.conf.get("spark.sql.warehouse.dir")),
      s"graft-indexes/$kind-$digest")
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(root)
    fs.makeQualified(root).toString
  }
}
