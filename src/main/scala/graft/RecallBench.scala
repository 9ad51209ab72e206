package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall-vs-oversampling sweep — the engine-side reproduction of the
  * reference's quality-retention table (~90% binary-only → ~95% with
  * ⟨float,binary⟩ rescore → ~99.99% with int8 rescore at oversample
  * 10/3, reference README.md:132-155). For each (binaryOversample,
  * int8Oversample) config, measures mean recall@10 of the funnel against
  * the exact float-cosine top-10 over `nQueries` fixture queries.
  * Usage: graft.RecallBench [sfDir] [nQueries]
  */
object RecallBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val nQueries = if (args.length > 1) args(1).toInt else 20
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-recallbench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qids = (0 until nQueries).map(_.toLong * 7L) // spread over the table
    val exact: Map[Long, Set[Long]] = qids.map { q =>
      q -> graft.operators.Search.knnCosine(spark, sfDir, queryVecId = q, k = 10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }.toMap

    val configs = Seq((2, 1), (5, 1), (10, 1), (10, 3), (20, 3), (50, 5))
    val rows = configs.map { case (bo, io) =>
      val recalls = qids.map { q =>
        val got = graft.operators.Search.funnel(spark, sfDir, queryVecId = q,
          k = 10, binaryOversample = bo, int8Oversample = io)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        got.intersect(exact(q)).size / 10.0
      }
      val mean = recalls.sum / recalls.size
      println(f"""{"binary_oversample":$bo,"int8_oversample":$io,"recall_at_10":$mean%.3f,"n_queries":$nQueries}""")
      (bo, io, mean)
    }

    // Pruned-probe IVF: the scale path trades cells scanned for recall —
    // sweep nprobe against the same exact top-10s (nprobe = all cells
    // must be exact by construction; the interesting rows are 1-4).
    val ivfRows = Seq(1, 2, 4).map { np =>
      val recalls = qids.map { q =>
        val got = graft.operators.Search.ivfKnn(spark, sfDir, queryVecId = q,
          k = 10, nprobe = np)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        got.intersect(exact(q)).size / 10.0
      }
      val mean = recalls.sum / recalls.size
      println(f"""{"ivf_nprobe":$np,"recall_at_10":$mean%.3f,"n_queries":$nQueries}""")
      (np, mean)
    }

    val best = rows.maxBy(_._3)
    val funnelJson = rows.map { case (bo, io, r) =>
      f"""{"binary_oversample":$bo,"int8_oversample":$io,"recall_at_10":$r%.3f}""" }
      .mkString("[", ",", "]")
    val ivfJson = ivfRows.map { case (np, r) =>
      f"""{"nprobe":$np,"recall_at_10":$r%.3f}""" }.mkString("[", ",", "]")
    println(f"""{"metric":"recall_at_10_default","value":${rows.find(r => r._1 == 10 && r._2 == 3).map(_._3).getOrElse(0.0)}%.3f,"best":${best._3}%.3f,"funnel_configs":$funnelJson,"ivf_probe":$ivfJson,"n_queries":$nQueries,"sf":"$sfDir","note":"reference README.md:134-153 retention claims: ~90%% binary-only, ~95%% float-binary rescore, ~99.99%% int8 rescore at oversample 10/3"}""")
    spark.stop()
  }
}
