package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(UrlOps.canonicalUrl(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  private def hostAndDomain(url: String): (String, String) = {
    import spark.implicits._
    val r = Seq(url).toDF("u")
      .select(UrlOps.hostOf(UrlOps.canonicalUrl(col("u"))).as("h"))
      .select(col("h"), UrlOps.registeredDomainOf(col("h")).as("d"))
      .head()
    (r.getString(0), r.getString(1))
  }

  behavior of "UrlOps.canonicalUrl"

  it should "collapse scheme, www, case, query, fragment and trailing slash" in {
    canon(
      "HTTPS://WWW.Site7.Example.com/p/123/?utm=campaign",
      "http://site7.example.com/p/123",
      "https://site7.example.com/p/123#frag",
      "site7.example.com/p/123/") shouldBe
      Seq.fill(4)("site7.example.com/p/123")
  }

  it should "only strip www as a canonical-host prefix" in {
    // wwwx is a real label; an inner www stays; a bare host survives
    canon("http://wwwx.site.co/a", "http://a.www.site.co/b", "https://site.co") shouldBe
      Seq("wwwx.site.co/a", "a.www.site.co/b", "site.co")
  }

  it should "be idempotent, including stacked www prefixes" in {
    import spark.implicits._
    val urls = Seq("http://www.www.site.co/p", "HTTPS://WWW.site.co/p/?q=1",
      "site.co/p/", "http://wwwx.co/www.page")
    val once = canon(urls: _*)
    val twice = once.toDF("u").select(UrlOps.canonicalUrl(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq
    twice shouldBe once
    once.head shouldBe "site.co/p" // both www labels stripped
  }

  it should "drop everything after the first query or fragment marker" in {
    canon("http://h.co/p?a=1&b=2#x", "http://h.co/p#x?notquery") shouldBe
      Seq("h.co/p", "h.co/p")
  }

  behavior of "UrlOps.hostOf / registeredDomainOf"

  it should "split host and registered domain" in {
    hostAndDomain("https://www.a.b.site.co/deep/path?q=1") shouldBe
      (("a.b.site.co", "site.co"))
    hostAndDomain("http://site.co/") shouldBe (("site.co", "site.co"))
  }

  it should "return a dotless host unchanged as its own domain" in {
    hostAndDomain("http://localhost/admin") shouldBe (("localhost", "localhost"))
  }

  behavior of "UrlOps.registeredDomainOf (public-suffix list)"

  private def domains(suffixes: Seq[String], hosts: String*): Seq[String] = {
    import spark.implicits._
    hosts.toDF("h")
      .select(UrlOps.registeredDomainOf(col("h"), suffixes).as("d"))
      .collect().map(_.getString(0)).toSeq
  }

  it should "keep one label above a listed multi-label suffix" in {
    domains(UrlOps.DEFAULT_SUFFIXES,
      "shop.example.co.uk", "example.co.uk", "news.bbc.co.uk",
      "a.b.store.com.au") shouldBe
      Seq("example.co.uk", "example.co.uk", "bbc.co.uk", "store.com.au")
  }

  it should "fall back to two labels for hosts outside the list" in {
    domains(UrlOps.DEFAULT_SUFFIXES,
      "a.b.site.co", "deep.sub.example.com", "localhost") shouldBe
      Seq("site.co", "example.com", "localhost")
  }

  it should "not pool distinct sites under a listed suffix into one domain" in {
    // exactly the round-7 finding: the two-label default maps every .co.uk
    // site to "co.uk"; the suffix-aware form keeps them apart
    domains(Nil, "one.co.uk", "two.co.uk") shouldBe Seq("co.uk", "co.uk")
    domains(UrlOps.DEFAULT_SUFFIXES, "one.co.uk", "two.co.uk") shouldBe
      Seq("one.co.uk", "two.co.uk")
  }

  it should "prefer a longer listed suffix over a shorter one" in {
    domains(Seq("co.uk", "special.co.uk"), "a.special.co.uk", "a.plain.co.uk") shouldBe
      Seq("a.special.co.uk", "plain.co.uk")
  }

  it should "reject malformed suffix entries" in {
    an[IllegalArgumentException] should be thrownBy
      domains(Seq("uk"), "a.co.uk") // single-label: that's the default's job
    an[IllegalArgumentException] should be thrownBy
      domains(Seq("Co.Uk"), "a.co.uk") // uppercase: hosts are lowercased upstream
  }
}
