package graft.sources

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** S-1/S-2 live mode: DSv2 plumbing (partition-per-page, column
  * pruning into the reader, limit pushdown, pluggable transport). */
class ArticlesSourceSpec extends SparkSpec {

  private def read(extra: (String, String)*) = {
    val base = spark.read.format("graft-articles")
      .option("pages", "4").option("page_size", "50")
    extra.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  test("shortName resolves; schema is the explicit union shape") {
    val df = read()
    assert(df.schema == Articles.articleSchema)
    assert(df.count() == 200)
  }

  test("one input partition per page") {
    assert(read().rdd.getNumPartitions == 4)
  }

  test("column pruning reaches the scan (ReadSchema excludes content)") {
    val df = read().select("title", "url")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.get
    val readCols = scan.scan.readSchema().fieldNames.toSet
    assert(readCols == Set("title", "url"))
  }

  test("limit pushdown caps per-partition emission") {
    val df = read().limit(3)
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }
    assert(scan.nonEmpty)
    assert(df.count() == 3)
  }

  test("newsapi/gnews shape difference matches the reference feeds") {
    val news = read().select("source.id", "urlToImage", "image").head()
    assert(news.getString(0) != null && news.getString(2) == null)
    val gnews = read("source_api" -> "gnews")
      .select("source.url", "image", "urlToImage").head()
    assert(gnews.getString(0) != null && gnews.getString(2) == null)
  }

  test("deterministic across re-reads (task-retry idempotence)") {
    val a = read().select("url").collect().map(_.getString(0)).sorted
    val b = read().select("url").collect().map(_.getString(0)).sorted
    assert(a.sameElements(b))
  }

  test("micro-batch read: page counter as offset, bounded by max_pages") {
    val q = spark.readStream.format("graft-articles")
      .option("page_size", "10")
      .option("pages_per_batch", "2")
      .option("max_pages", "5")
      .load()
      .select("url")
      .writeStream.format("memory").queryName("articles_stream")
      .start()
    try {
      q.processAllAvailable()
      val urls = spark.table("articles_stream").collect().map(_.getString(0))
      assert(urls.length == 50) // 5 pages x 10 rows, then the feed is dry
      assert(urls.distinct.length == 50) // no page re-admitted
    } finally q.stop()
  }

  test("the validate pipeline composes on the live source") {
    val flat = Articles.flatten(read())
    val ok = graft.operators.Validate.requiredFields(flat, "url",
      "title", "publishedAt")
    assert(ok.count() == 200) // synthetic rows all carry title/url/publishedAt
  }
}
