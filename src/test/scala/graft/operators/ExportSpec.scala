package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sharded corpus export: deterministic membership, one directory per
  * shard, in-shard row order, lossless round-trip, and shard-pruned
  * read-back — the export contract a training job relies on. */
class ExportSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0L until 200L).map(i => (i, s"text payload $i"))
    .toDF("doc_id", "text")

  test("round-trip: every row lands in its md5 shard, none lost") {
    val dir = Files.createTempDirectory("graft_shards").toString
    Export.writeShards(docs, "doc_id", dir, numShards = 8)
    val back = spark.read.parquet(dir)
    assert(back.count() == 200)
    // membership matches the assignment expression exactly
    val bad = back.withColumn("expect",
      Export.shardKey($"doc_id", 8)).filter($"shard" =!= $"expect")
    assert(bad.count() == 0)
    // one directory per non-empty shard
    val shardDirs = new java.io.File(dir).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.length == back.select("shard").distinct().count())
  }

  test("rows are sorted by id inside every shard file") {
    val dir = Files.createTempDirectory("graft_shards_sorted").toString
    Export.writeShards(docs, "doc_id", dir, numShards = 4)
    new java.io.File(dir).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("shard=")).foreach { sd =>
        sd.listFiles.filter(_.getName.endsWith(".parquet")).foreach { f =>
          val ids = spark.read.parquet(f.getAbsolutePath)
            .select("doc_id").as[Long].collect()
          assert(ids.sameElements(ids.sorted), s"unsorted ${f.getName}")
        }
      }
  }

  test("shard-filtered read prunes to one shard directory (PartitionFilters)") {
    val dir = Files.createTempDirectory("graft_shards_prune").toString
    Export.writeShards(docs, "doc_id", dir, numShards = 8)
    val q = spark.read.parquet(dir).where($"shard" === 3)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("shard"))
    // and the rows really are just that shard's
    assert(q.count() ==
      docs.withColumn("s", Export.shardKey($"doc_id", 8))
        .filter($"s" === 3).count())
  }

  test("manifest totals reconcile with the written files") {
    val dir = Files.createTempDirectory("graft_shards_manifest").toString
    Export.writeShards(docs, "doc_id", dir, numShards = 8)
    val m = Export.manifest(docs, "doc_id", "text", numShards = 8)
      .orderBy("shard")
      .select($"shard", $"n_rows", $"min_id", $"max_id", $"payload_chars")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(m.map(_._2).sum == 200)
    val back = spark.read.parquet(dir)
      .groupBy("shard").agg(count(lit(1)).as("n"), min("doc_id").as("mn"),
        max("doc_id").as("mx"), sum(length($"text")).as("pc"))
      .orderBy("shard")
      .select($"shard".cast("long"), $"n", $"mn", $"mx", $"pc".cast("long"))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(m.toSeq == back.toSeq)
  }

  test("maxRecordsPerFile splits oversized shards without reshuffling") {
    val dir = Files.createTempDirectory("graft_shards_split").toString
    Export.writeShards(docs, "doc_id", dir, numShards = 2,
      maxRecordsPerFile = 25L)
    val files = new java.io.File(dir).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
      .flatMap(_.listFiles).filter(_.getName.endsWith(".parquet"))
    // ~200 rows over 2 shards at <=25 rows/file -> at least 8 files
    assert(files.length >= 8)
    assert(spark.read.parquet(dir).count() == 200)
  }

  test("shardKey enforces its uniformity precondition") {
    intercept[IllegalArgumentException] { Export.shardKey($"doc_id", 0) }
    intercept[IllegalArgumentException] { Export.shardKey($"doc_id", 1 << 20) }
    // boundary value just inside the contract still builds
    Export.shardKey($"doc_id", (1 << 20) - 1)
  }
}
