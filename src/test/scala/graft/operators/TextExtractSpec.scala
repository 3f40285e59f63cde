package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** HTML extraction: blocks dropped, tags stripped, entities decoded
  * exactly once, whitespace collapsed, null-safe. */
class TextExtractSpec extends SparkSpec {
  import spark.implicits._

  private def ext(s: String): String =
    Seq(Tuple1(s)).toDF("h")
      .select(TextExtract.extractText(col("h"))).as[String].head()

  test("tags strip to word separators") {
    assert(ext("<p>alpha</p><p>beta</p>") == "alpha beta")
    assert(ext("x<br/>y <a href=\"u\">link</a>") == "x y link")
  }

  test("script/style/comment blocks vanish, embedded < and newlines included") {
    assert(ext("a<script>\nvar x = 1 < 2;\n</script>b") == "a b")
    assert(ext("a<STYLE type=\"x\">p { c: <weird> }</StYlE>b") == "a b")
    assert(ext("a<!-- multi\nline\ncomment -->b") == "a b")
  }

  test("entities decode exactly once, &amp; last") {
    assert(ext("1 &lt; 2 &amp;&amp; &quot;q&#39;s&quot;&nbsp;end")
      == "1 < 2 && \"q's\" end")
    // double-encoded survives one level: &amp;lt; → &lt;
    assert(ext("&amp;lt;tag&amp;gt;") == "&lt;tag&gt;")
  }

  test("whitespace collapses; null is empty") {
    assert(ext("  a \t b \r\n c  ") == "a b c")
    val n = Seq(Tuple1(null: String)).toDF("h")
      .select(TextExtract.extractText(col("h"))).as[String].head()
    assert(n == "")
  }

  test("the q152 template round-trips the body text") {
    val doc = "the quick brown fox"
    val page = "<html><head><title>t&amp;d</title><style>b{}</style></head>" +
      s"<body><!-- n --><h1>H&nbsp;1</h1><p>$doc</p>" +
      "<script>var x = 1 < 2;</script></body></html>"
    assert(ext(page) == s"t&d H 1 $doc")
  }

  private def canon(u: String): (String, String, String) =
    Seq(Tuple1(u)).toDF("u")
      .select(TextExtract.urlCanonicalize(col("u")),
        TextExtract.urlHost(col("u")), TextExtract.urlDomain(col("u")))
      .as[(String, String, String)].head()

  test("url canonicalization: case, www, default port, fragment, params") {
    assert(canon("HTTPS://WWW.News.Example.COM:443/A/b?z=1&a=2#frag") ==
      (("https://news.example.com/A/b?a=2&z=1",
        "news.example.com", "example.com")))
    // non-default port kept; empty path becomes /
    assert(canon("http://Example.org:8080") ==
      (("http://example.org:8080/", "example.org", "example.org")))
    // http on 443 is NOT a default port
    assert(canon("http://a.b.c.example.net:443/x") ==
      (("http://a.b.c.example.net:443/x",
        "a.b.c.example.net", "example.net")))
    // idempotent: canonicalizing a canonical url is a no-op
    val once = canon("HTTP://WWW.Shop.Example.com:80/p?b=2&a=1")._1
    assert(canon(once)._1 == once)
  }

  test("randomized noise variants of one URL collapse to one key (3 seeds)") {
    for (seed <- Seq(23, 71, 113)) {
      val rnd = new scala.util.Random(seed)
      (1 to 20).foreach { i =>
        val scheme = if (rnd.nextBoolean()) "https" else "http"
        val host = s"site$i.example.org"
        val path = s"/p/$i"
        val params = List("a=1", "b=2", "c=3")
        val base = canon(s"$scheme://$host$path?${params.mkString("&")}")._1
        // noise: case, www, default port, param order, fragment
        val variants = (1 to 6).map { _ =>
          val h = (if (rnd.nextBoolean()) "WWW." else "") +
            (if (rnd.nextBoolean()) host.toUpperCase else host)
          val port = if (rnd.nextBoolean())
            (if (scheme == "https") ":443" else ":80") else ""
          val q = rnd.shuffle(params).mkString("&")
          val frag = if (rnd.nextBoolean()) "#Sec" + rnd.nextInt(9) else ""
          val sch = if (rnd.nextBoolean()) scheme.toUpperCase else scheme
          s"$sch://$h$port$path?$q$frag"
        }
        variants.foreach { v =>
          assert(canon(v)._1 == base, s"seed $seed variant $v")
        }
      }
    }
  }
}
