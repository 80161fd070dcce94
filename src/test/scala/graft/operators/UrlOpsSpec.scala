package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(UrlOps.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq

  test("canonicalization golden cases: case, ports, fragments, tracking, order, dot segments") {
    assert(canon(
      "HTTPS://WWW.Example.COM:443/a/b?z=1&a=2#frag",
      "http://site.org:80/",
      "http://site.org:8080/x",          // non-default port KEPT
      "https://h.net",                    // empty path -> "/"
      "https://h.net/p?utm_source=x&utm_medium=y&gclid=1&fbclid=2&ref=r", // all tracking
      "https://h.net/a/./b/././c",        // chained dot segments
      "https://h.net/p?b=2&id=7&utm_campaign=z"
    ) == Seq(
      "https://www.example.com/a/b?a=2&z=1",
      "http://site.org/",
      "http://site.org:8080/x",
      "https://h.net/",
      "https://h.net/p",
      "https://h.net/a/b/c",
      "https://h.net/p?b=2&id=7"))
  }

  test("userinfo drops from the key; malformed authorities refuse; dot chains collapse fully") {
    // userinfo is not page identity: same page with/without credentials
    // canonicalizes identically, and the HOST is the real host (a naive
    // ':'-split would read 'alice' as the host)
    assert(canon(
      "https://alice:pw@example.com/x",
      "https://example.com/x") ==
      Seq("https://example.com/x", "https://example.com/x"))
    val hosts = Seq("https://alice:pw@example.com/x", "https://bob@h.net/y")
      .toDF("url").select(UrlOps.hostOf(col("url"))).collect().map(_.getString(0)).toSeq
    assert(hosts == Seq("example.com", "h.net"))
    // a non-numeric port is a malformed authority: refuse, never merge
    // into the portless page's dedup group (same for bracketed IPv6 —
    // documented out of scope)
    assert(canon("http://h.net:8080x/y", "https://[::1]:443/z") == Seq(null, null))
    // arbitrarily long "/./" chains collapse in one canonical pass, and a
    // trailing "/." normalizes like a directory self-reference
    assert(canon(
      "https://h.net/./././././x",
      "https://h.net/a/.",
      "https://h.net/a/././.") ==
      Seq("https://h.net/x", "https://h.net/a/", "https://h.net/a/"))
  }

  test("dedup treats non-URL rows as singletons, batch and stream shape alike") {
    val docs = Seq(
      (0L, "https://a.com/p"),
      (1L, "HTTPS://A.COM/p"),
      (2L, "not a url"),
      (3L, "also not a url")).toDF("doc_id", "url")
    val out = UrlOps.dedupByCanonical(docs, "doc_id", "url")
      .select("doc_id", "survivor_id", "is_kept").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    // the two non-URLs each survive as their own group — never merged
    // onto one null key, never NULLed out of the is_kept audit
    assert(out == Seq((0L, 0L, 1), (1L, 0L, 0), (2L, 2L, 1), (3L, 3L, 1)))
    val streamed = UrlOps.dedupByCanonicalStream(docs, "doc_id", "url")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed == Set(0L, 2L, 3L))
  }

  test("canonicalization is idempotent; non-URLs refuse with null") {
    val messy = Seq(
      "HTTPS://A.B:443/x/./y?q=1&utm_source=s#f",
      "http://H.I:80?z=9",
      "ftp://Files.Example.com:21/pub")
    val once = canon(messy: _*)
    assert(canon(once: _*) == once, "canonicalize(canonicalize(x)) must equal canonicalize(x)")
    // not URLs: no scheme, bare host, empty, relative path
    assert(canon("example.com/x", "/relative/path", "", "not a url") ==
      Seq(null, null, null, null))
  }

  test("host and registrable domain: 2-label default, 3-label ccSLD fork, null flows") {
    val df = Seq(
      "https://www.example.com/x",
      "https://a.b.site.CO.uk/",
      "https://deep.sub.ac.jp/y",
      "https://single/y",    // one label: no registrable domain
      "nota url").toDF("url")
      .select(UrlOps.hostOf(col("url")).as("h"),
        UrlOps.registrableDomain(col("url")).as("d"))
    val rows = df.collect().map(r => (
      if (r.isNullAt(0)) null else r.getString(0),
      if (r.isNullAt(1)) null else r.getString(1))).toSeq
    assert(rows == Seq(
      ("www.example.com", "example.com"),
      ("a.b.site.co.uk", "site.co.uk"),
      ("deep.sub.ac.jp", "sub.ac.jp"),
      ("single", null),
      (null, null)))
  }

  test("dedupByCanonical: min-id survivor per canonical key, spellings collapse") {
    val docs = Seq(
      (0L, "HTTPS://A.com/p?x=1"),
      (1L, "https://a.COM:443/p?x=1#z"),
      (2L, "https://a.com/p?utm_source=s&x=1"),
      (3L, "https://a.com/q")).toDF("doc_id", "url")
    val out = UrlOps.dedupByCanonical(docs, "doc_id", "url")
      .select("doc_id", "survivor_id", "is_kept").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(out == Seq((0L, 0L, 1), (1L, 0L, 0), (2L, 0L, 0), (3L, 3L, 1)))
  }

  test("plan hygiene: canonicalization is one codegen projection, no exchange") {
    val urls = UrlOps.syntheticUrlCorpus(
      graft.Engine.Tables(spark, Sf0001).documents)
    val plan = urls.select(UrlOps.canonicalizeUrl(col("url")).as("c"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"canonicalization must not shuffle:\n$plan")
    // whole-stage codegen renders as a "*(n)" stage prefix in toString
    assert(plan.contains("*("), s"canonicalization fell out of codegen:\n$plan")
  }
}
