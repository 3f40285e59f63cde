package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** Stage attribution for x24 (semDedup) — splits the bench's most
  * expensive entry into its jobs: scan, centroid collect, assignment
  * checkpoint, in-cell pair loop, connected-components rounds, and
  * the final verdict join (dev tool; results tabled in SCALING.md). */
object SemDedupProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
      r
    }

    val emb = Tables.embeddings(spark, sfDir)
    t("embeddings.count (scan)")(emb.count())

    // x24's exact parameters
    val numCells = 8; val threshold = 0.35; val maxCell = 8192

    // stage 1: centroid list (limit + collect_list + localCheckpoint)
    val cents = t("centroid list checkpoint") {
      emb.orderBy(col("vec_id")).limit(numCells)
        .select(col("vec_id").cast("long").as("cid"),
          col("embedding").cast("array<double>").as("cvec"))
        .agg(collect_list(struct(col("cid"), col("cvec"))).as("cents"))
        .localCheckpoint()
    }

    // stage 2: scan-local assignment + localCheckpoint (full corpus
    // with vectors rides into the checkpoint — the big fixed cost?)
    val assigned = t("assignment checkpoint") {
      emb.crossJoin(broadcast(cents))
        .select(col("vec_id").cast("long").as("id"),
          col("embedding").cast("array<double>").as("v"),
          Similarity.assignUdf(col("embedding").cast("array<double>"),
            col("cents")).as("cell"))
        .localCheckpoint()
    }

    // stage 3: in-cell pair loop (groupByKey + flatMapGroups)
    val pairs = t("in-cell pair loop (count)") {
      val p = assigned.as[(Long, Seq[Double], Long)]
        .groupByKey(_._3)
        .flatMapGroups { (_, it) =>
          val members = it.take(maxCell + 1)
            .map { case (id, v, _) => (id, v.toArray) }.toArray
          if (members.length < 2 || members.length > maxCell) Iterator.empty
          else {
            java.util.Arrays.sort(members,
              Ordering.by((m: (Long, Array[Double])) => m._1))
            for {
              i <- members.indices.iterator
              j <- (i + 1 until members.length).iterator
              if Similarity.cosineOf(members(i)._2, members(j)._2) >= threshold
            } yield (members(i)._1, members(j)._1)
          }
        }.toDF("id_a", "id_b").localCheckpoint()
      p.count()
      p
    }

    // stage 4: connected components (alternating large/small-star) —
    // timed copy of Dedup.connectedComponents with per-round prints
    val comps = t("connectedComponents") {
      var edges = t("  cc: canonical edges checkpoint") {
        val e = pairs.filter(col("id_a") =!= col("id_b"))
          .select(greatest(col("id_a"), col("id_b")).as("u"),
            least(col("id_a"), col("id_b")).as("v"))
          .distinct().localCheckpoint()
        println(s"[prof]   cc: ${e.count()} canonical edges, " +
          s"${e.rdd.getNumPartitions} partitions")
        e
      }
      var iter = 0; var converged = false
      while (iter < 16 && !converged) {
        val next = t(s"  cc: round ${iter + 1} star pass") {
          val dir = edges.unionByName(
            edges.select(col("v").as("u"), col("u").as("v")))
          val lsMin = dir.groupBy(col("u")).agg(min(col("v")).as("__mn"))
            .select(col("u"), least(col("u"), col("__mn")).as("m"))
          val afterLarge = dir.join(lsMin, "u")
            .filter(col("v") > col("u"))
            .select(col("v").as("u"), col("m").as("v"))
            .filter(col("u") =!= col("v"))
            .distinct()
          val ssMin = afterLarge.groupBy(col("u")).agg(min(col("v")).as("__mn"))
          afterLarge.join(ssMin, "u")
            .filter(col("v") =!= col("__mn"))
            .select(col("v").as("u"), col("__mn").as("v"))
            .unionByName(ssMin.select(col("u"), col("__mn").as("v")))
            .distinct().localCheckpoint()
        }
        converged = t(s"  cc: round ${iter + 1} fixpoint check")(
          next.count() == edges.count() && next.exceptAll(edges).head(1).isEmpty)
        edges = next; iter += 1
      }
      println(s"[prof]   cc: converged after $iter rounds")
      edges.select(col("u").as("id"), col("v").as("comp"))
        .unionByName(edges.select(col("v").as("id"), col("v").as("comp")))
        .distinct().localCheckpoint()
    }

    // stage 5: verdict mark + final output (keeper = comp at fixpoint)
    t("verdicts + final join (noop write)") {
      val verdicts = comps
        .select(col("id"), col("comp"), (col("id") === col("comp")).as("keep"))
      assigned.select(col("id"), col("cell"))
        .join(verdicts, Seq("id"), "left")
        .select(col("id").as("vec_id"), col("cell"),
          coalesce(col("comp"), col("id")).as("comp"),
          coalesce(col("keep"), lit(true)).as("keep"))
        .write.format("noop").mode("overwrite").save()
    }

    // end-to-end, twice (cold + warm) for the bench-comparable number
    t("semDedup end-to-end (cold)") {
      Similarity.semDedup(emb, "vec_id", "embedding",
        numCells = numCells, threshold = threshold)
        .write.format("noop").mode("overwrite").save()
    }
    t("semDedup end-to-end (warm)") {
      Similarity.semDedup(emb, "vec_id", "embedding",
        numCells = numCells, threshold = threshold)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
