package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + canonical-URL dedup (SURVEY §2.4, the crawl leg
  * of the E1 exact-dedup family): a crawl corpus reaches the pipeline with
  * the SAME page under many spellings — scheme/host case, explicit default
  * ports, tracking query params, fragments, shuffled param order — and
  * exact text dedup misses re-crawls whose boilerplate shifted. Dedup by
  * canonical URL is the standard first pass (it is how CommonCrawl-derived
  * datasets key their re-crawl dedup) and it needs NO text at all.
  *
  * Everything here is pure `org.apache.spark.sql.functions` Column
  * algebra — regexp splits, higher-order `filter`, `array_sort` — so the
  * whole canonicalization stays inside whole-stage codegen: no UDF, no
  * shuffle; the only exchange in [[dedupByCanonical]] is the dedup's own
  * hash aggregation on the canonical key.
  *
  * Canonical form (the documented subset of RFC 3986 §6 normalization +
  * common crawl-pipeline practice):
  *  1. scheme and host lowercase;
  *  2. explicit default port stripped (http:80, https:443);
  *  3. fragment stripped (never reaches the server);
  *  4. tracking params dropped (`utm_*`, `fbclid`, `gclid`, `ref`);
  *  5. remaining query params sorted byte-wise (order is server-irrelevant
  *     for the overwhelming majority of pages; documented trade);
  *  6. empty path → "/"; single-dot segments ("/./") collapsed.
  *  Percent-encoding and ".." resolution are deliberately OUT of scope —
  *  both need stateful decoding a crawl dedup pass does without.
  *
  * A value with no `scheme://` is not a URL: every derived column is NULL
  * (refuse, never guess — the [[graft.functions.ImageDims]] contract). */
object UrlOps {

  private val TrackingRe = "^(utm_[^=]*|fbclid|gclid|ref)(=.*)?$"

  /** Lowercased scheme, or null when the value does not lead with one. */
  def schemeOf(url: Column): Column = {
    val s = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    when(s =!= "", s)
  }

  /** The authority with any RFC 3986 userinfo ("user[:pass]@") stripped —
    * a host may not contain '@', so everything up to the LAST '@' is
    * userinfo. Canonicalization DROPS userinfo (standard crawl practice:
    * credentials are not page identity and must never reach a persisted
    * dedup key). */
  private def authorityOf(url: Column): Column = {
    val hp = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    regexp_replace(hp, "^.*@", "")
  }

  /** A syntactically valid host[:port] authority: anything after a colon
    * must be a pure decimal port. ':8080x' and bracketed IPv6 literals
    * fail here — both REFUSE (null canonical/host) rather than silently
    * merging a garbled authority into a real page's dedup group (IPv6
    * hosts are documented out of scope, refused not guessed). */
  private def validAuthority(auth: Column): Column =
    auth.rlike("^[^:@/?#]*(:[0-9]+)?$")

  /** Lowercased host (no port, no userinfo), or null for a non-URL or a
    * malformed authority. */
  def hostOf(url: Column): Column = {
    val auth = authorityOf(url)
    when(schemeOf(url).isNotNull && validAuthority(auth),
      lower(regexp_extract(auth, "^([^:]*)", 1)))
  }

  /** Registrable-domain HEURISTIC: the last two host labels, or the last
    * THREE when the second-level label is a well-known country-code
    * second-level ("co", "com", "org", "net", "ac", "gov", "edu" — the
    * set that covers co.uk / com.au / ac.jp shapes). A full public-suffix
    * list is a data file, not an algorithm — this heuristic is the
    * documented approximation and the planted corpus certifies exactly
    * it. Null for a non-URL or a label-free host. */
  def registrableDomain(url: Column): Column = {
    val labels = split(hostOf(url), "\\.")
    val n = size(labels)
    val secondLevel = element_at(labels, -2)
    val take3 = n >= lit(3) &&
      secondLevel.isin("co", "com", "org", "net", "ac", "gov", "edu")
    when(n >= 2,
      when(take3, concat_ws(".",
        element_at(labels, -3), element_at(labels, -2), element_at(labels, -1)))
        .otherwise(concat_ws(".", element_at(labels, -2), element_at(labels, -1))))
  }

  /** The canonical form (rules above; userinfo dropped), or null for a
    * non-URL or a malformed authority. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = schemeOf(url)
    val noFrag = regexp_extract(url, "^([^#]*)", 1)
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostPort = regexp_replace(
      regexp_extract(rest, "^([^/?]*)", 1), "^.*@", "")
    val host = lower(regexp_extract(hostPort, "^([^:]*)", 1))
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val portNorm = when(port === "", "")
      .when(scheme === "http" && port === "80", "")
      .when(scheme === "https" && port === "443", "")
      .otherwise(concat(lit(":"), port))
    val pathQ = regexp_replace(rest, "^[^/?]*", "")
    val path0 = regexp_extract(pathQ, "^([^?]*)", 1)
    // collapse dot-segment chains in ONE pass: "(/\.)+/" matches the whole
    // run ("/./././" of any length), and a trailing "/." (directory-self
    // reference at path end) normalizes to "/"
    val path1 = regexp_replace(
      regexp_replace(path0, "(/\\.)+/", "/"), "(/\\.)+$", "/")
    val path = when(path1 === "", "/").otherwise(path1)
    val query = regexp_extract(pathQ, "\\?(.*)$", 1)
    val params = filter(split(query, "&"),
      p => p =!= "" && not(p.rlike(TrackingRe)))
    val qNorm = when(size(params) === 0, "")
      .otherwise(concat(lit("?"), array_join(array_sort(params), "&")))
    when(scheme.isNotNull && validAuthority(hostPort),
      concat(scheme, lit("://"), host, portNorm, path, qNorm))
  }

  /** Exact dedup by canonical URL: min-id survivor per canonical key (the
    * [[Dedup.exactDedup]] survivor convention applied to the URL key).
    * Emits every input row with its canonical URL, the group's survivor
    * id, and an `is_kept` flag — the same audit-friendly shape as the
    * text-dedup operators. One hash aggregation on the canonical key;
    * at crawl scale that key is high-cardinality and hash-partitions
    * evenly (hot-key domains differ in path, so the KEY is not skewed
    * even when the domain is). */
  def dedupByCanonical(docs: DataFrame, idCol: String, urlCol: String): DataFrame = {
    // non-URLs (null canonical) key on their own id: a dedup pass must
    // never merge what it could not parse, and a null-keyed equi-join
    // would otherwise emit NULL survivor/is_kept for exactly those rows
    // (the ImageDedup.dedupByPixels singleton convention)
    val canon = docs.withColumn("canonical_url", canonicalizeUrl(col(urlCol)))
      .withColumn("__key",
        coalesce(col("canonical_url"), concat(lit("doc:"), col(idCol))))
    val survivors = canon.groupBy(col("__key"))
      .agg(min(col(idCol)).as("survivor_id"))
    canon.join(survivors, Seq("__key"), "left")
      .withColumn("is_kept",
        (col(idCol) === col("survivor_id")).cast("int"))
      .drop("__key")
  }

  /** STREAMING canonical-URL dedup: canonicalize (stateless projection)
    * then `dropDuplicates` on the canonical key — streaming dedup state,
    * FIRST-seen survivor (a stream cannot know a smaller id is coming;
    * under an id-ordered replay first-seen == min-id, the batch
    * convention — asserted in StreamingSpec). Emits only the kept rows:
    * the crawl-ingest shape, where duplicates are dropped in flight.
    * LONG-RUNNING STREAMS: keyed dedup state grows with distinct URLs —
    * an always-on ingest should watermark an event-time column BEFORE
    * this operator and use dropDuplicatesWithinWatermark so state ages
    * out (re-crawl dups arrive close together in practice). */
  def dedupByCanonicalStream(docs: DataFrame, idCol: String,
                             urlCol: String): DataFrame =
    docs.withColumn("canonical_url", canonicalizeUrl(col(urlCol)))
      // same singleton convention as the batch form: dropDuplicates
      // treats nulls as EQUAL, so un-keyed non-URL rows would silently
      // merge into one survivor. Keyed on the caller's id (NOT
      // monotonically_increasing_id, whose values repeat across
      // micro-batches and would collide inside the dedup state).
      .withColumn("__key",
        coalesce(col("canonical_url"), concat(lit("doc:"), col(idCol))))
      .dropDuplicates("__key")
      .drop("__key")

  /** Deterministic messy-URL corpus over the documents table: four docs
    * share each canonical page (group = doc_id / 4) and each carries a
    * different spelling — uppercase scheme; uppercase host + explicit
    * default port + utm param; fragment + reversed param order; "/./"
    * path segment + gclid param — so every canonicalization rule is
    * certified by the DuckDB oracle RECOMPUTING the expected canonical
    * string from doc_id arithmetic (never by parsing). TLDs rotate
    * com/org/co.uk so the registrable-domain 2-vs-3-label fork is
    * certified in both directions. */
  def syntheticUrlCorpus(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val g = ((id - id % 4) / 4).cast("long")
    val tld = when(g % 3 === 0, "com").when(g % 3 === 1, "org")
      .otherwise("co.uk")
    val site = concat(lit("site"), (g % 50).cast("string"), lit("."), tld)
    val path = concat(lit("/a"), (g % 7).cast("string"),
      lit("/page"), g.cast("string"))
    val idParam = concat(lit("id="), g.cast("string"))
    // canonical query: params sorted byte-wise — "b=2" < "id=..."
    val v = (id % 4).cast("int")
    val url = when(v === 0, concat(lit("HTTPS://www."), site, path,
        lit("?"), when(g % 2 === 0, concat(lit("b=2&"), idParam)).otherwise(idParam)))
      .when(v === 1, concat(lit("https://WWW."), upper(site), lit(":443"), path,
        lit("?utm_source=feed&"),
        when(g % 2 === 0, concat(idParam, lit("&b=2"))).otherwise(idParam)))
      .when(v === 2, concat(lit("https://www."), site, path,
        lit("?"), when(g % 2 === 0, concat(idParam, lit("&b=2"))).otherwise(idParam),
        lit("#sec"), id.cast("string")))
      .otherwise(concat(lit("https://www."), site,
        lit("/a"), (g % 7).cast("string"), lit("/./page"), g.cast("string"),
        lit("?gclid=z12&"),
        when(g % 2 === 0, concat(lit("b=2&"), idParam)).otherwise(idParam)))
    docs.select(id.as("doc_id"), url.as("url"))
  }
}
