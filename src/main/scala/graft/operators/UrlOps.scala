package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus dedup — the normalization a
  * crawled training corpus applies BEFORE any content hashing, because
  * the same page arrives under dozens of surface forms (scheme/host
  * case, default ports, `www.`, tracking parameters, fragments,
  * parameter order). One canonical form turns URL-keyed dedup into the
  * exact-dedup shuffle the engine already has ([[Dedup.exactDedup]]'s
  * one content-hash groupBy), so the whole operator stays map-only +
  * one aggregation at 100 TB.
  *
  * Everything is built from codegen'd built-ins (`parse_url`, regex,
  * higher-order array functions) — no UDF in the hot path. The contract
  * (documented, spec-pinned):
  *   - scheme and host lowercase; a leading `www.` is stripped
  *   - default ports drop (http:80, https:443); explicit others stay
  *   - the fragment drops
  *   - tracking parameters drop (`utm_*` prefix and the click-id set
  *     fbclid/gclid/msclkid/mc_cid/mc_eid/igshid); survivors sort
  *     lexicographically, empty query drops its `?`
  *   - a trailing `/` on the path drops (the bare-host form has no path)
  *   - unparseable URLs canonicalize to NULL (they fail closed into the
  *     "no canonical key" bucket rather than colliding on a garbage key)
  */
object UrlOps {

  /** Exact-match click-id keys; `utm_` is handled as a prefix. */
  private val trackingKeys =
    Seq("fbclid", "gclid", "msclkid", "mc_cid", "mc_eid", "igshid")

  /** The canonical form of a URL column (NULL when unparseable). */
  def canonicalize(url: Column): Column = {
    val proto = lower(try_parse_url(url, lit("PROTOCOL")))
    val host = regexp_replace(lower(try_parse_url(url, lit("HOST"))),
      "^www\\.", "")
    // AUTHORITY carries host[:port]; pull the explicit port if any
    val port = regexp_extract(try_parse_url(url, lit("AUTHORITY")),
      ":(\\d+)$", 1)
    val keepPort = port =!= "" &&
      !(proto === "http" && port === "80") &&
      !(proto === "https" && port === "443")
    val path = regexp_replace(coalesce(try_parse_url(url, lit("PATH")),
      lit("")), "/+$", "")
    val params = filter(
      split(coalesce(try_parse_url(url, lit("QUERY")), lit("")), "&"),
      p => {
        val key = substring_index(p, "=", 1)
        p =!= "" && !key.startsWith("utm_") &&
          !key.isin(trackingKeys.map(lit(_)): _*)
      })
    val query = array_join(array_sort(params), "&")
    when(proto.isNull || host.isNull || proto === "" || host === "", lit(null))
      .otherwise(concat(
        proto, lit("://"), host,
        when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
        path,
        when(query =!= "", concat(lit("?"), query)).otherwise(lit(""))))
  }

  /** The canonical host (lowercased, `www.`-stripped) — the per-site
    * rollup key for crawl budgeting and per-domain caps. */
  def canonicalHost(url: Column): Column =
    regexp_replace(lower(try_parse_url(url, lit("HOST"))), "^www\\.", "")

  /** URL-keyed dedup report: one row per canonical URL that occurs at
    * all, keeping the smallest id as canonical doc and counting copies.
    * NULL-canonical rows (unparseable URLs) are excluded — they have no
    * shared key to collide on. One map-only projection + one groupBy:
    * the exact-dedup shuffle shape. */
  def urlDedup(df: DataFrame, urlCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("id"), canonicalize(col(urlCol)).as("canonical"))
      .where(col("canonical").isNotNull)
      .groupBy(col("canonical"))
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Host-level link graph from (page URL, outlink-array) rows — the
    * edge extractor that feeds [[GraphRank.pageRank]] for domain-quality
    * weighting (the Common-Crawl-style curation signal: rank hosts by
    * centrality before sampling a training mix). Contract: one vote per
    * DISTINCT (src_host, dst_host) pair (a site linking another from
    * 10⁴ pages votes once), self-links dropped, unparseable/hostless
    * ends fail closed (consistent with [[urlDedup]]/[[perHostCap]]).
    * Map-only explode + one distinct — the 100 TB shape. */
  def hostGraph(df: DataFrame, urlCol: String,
      outlinksCol: String): DataFrame =
    df.select(canonicalHost(col(urlCol)).as("src_host"),
        explode(col(outlinksCol)).as("__out"))
      .select(col("src_host"), canonicalHost(col("__out")).as("dst_host"))
      .where(col("src_host").isNotNull && col("src_host") =!= "" &&
        col("dst_host").isNotNull && col("dst_host") =!= "" &&
        col("src_host") =!= col("dst_host"))
      .distinct()

  /** Per-host crawl cap: keep at most `n` rows per canonical host, the
    * deterministic md5-order pick (the Dolma/C4-style per-domain quota
    * that stops one sprawling site from dominating a mix). Hostless
    * (unparseable) rows are excluded, consistent with [[urlDedup]].
    *
    * Routed through [[graft.plans.TopKPerGroup]]'s bounded heaps rather
    * than a `row_number()` window: one mega-host (the crawl reality this
    * operator exists for — a single domain with 10⁸ pages) would make
    * the window fully SORT that host's partition just to keep n rows;
    * the heap form bounds every partition's state at n rows per host
    * BEFORE the exchange. The `pos` rank is then a window over the
    * already-capped table — ≤ n rows per host by construction, so its
    * sort is trivially bounded and it reuses the heap pass's hash
    * partitioning (no second exchange). */
  def perHostCap(df: DataFrame, urlCol: String, idCol: String,
      n: Int): DataFrame = {
    require(n > 0, "perHostCap needs n > 0")
    import org.apache.spark.sql.expressions.Window
    val base = df
      .select(col(idCol).as("id"), canonicalHost(col(urlCol)).as("host"))
      .where(col("host").isNotNull && col("host") =!= "")
      .withColumn("__k", md5(col("id").cast("string")))
    graft.plans.TopKPerGroup(base,
        Seq(col("host")), Seq(col("__k").asc, col("id").asc), n)
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("host")).orderBy(col("__k"), col("id"))))
      .drop("__k")
  }

  // ------------------------------------------------------------------
  // Robots Exclusion Protocol (RFC 9309) — the crawl-GOVERNANCE gate:
  // a training corpus assembled from a crawl is expected to honor each
  // host's robots.txt, and an audit asks for the decision per URL with
  // the rule that made it. Parsing and evaluation are both relational
  // (per-host windows + a host-keyed join), so the gate runs at corpus
  // scale like every other operator here.
  // ------------------------------------------------------------------

  /** Parse robots.txt bodies into rule rows:
    * (host, group_id, line_no, directive, value).
    *
    * RFC 9309 grouping: one or more consecutive `User-agent` lines
    * open a group; the `Allow`/`Disallow` lines that follow belong to
    * it until the next UA line that follows a rule line. Expressed as
    * one per-host window pass: a group starts at a UA line whose
    * predecessor is NOT a UA line; `group_id` is the running count of
    * starts. Comments (`#` to end of line) strip first; directives
    * match case-insensitively; directives outside `directives`
    * (default user-agent/allow/disallow — Crawl-delay and Sitemap have
    * their own readers, [[robotsCrawlDelay]]/[[robotsSitemaps]]) drop. Agent values lowercase (the RFC says product
    * tokens compare case-insensitively); rule paths keep their case
    * (paths are case-sensitive). Lines split on `\r?\n` — real-world
    * robots.txt is dominantly CRLF-encoded, and `trim` strips only
    * spaces, so a bare-`\n` split would leave a trailing `\r` on every
    * directive value and silently fail-open the whole file. */
  def parseRobots(robots: DataFrame, hostCol: String,
      textCol: String,
      directives: Seq[String] = Seq("user-agent", "allow", "disallow"))
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = robots.select(col(hostCol).as("host"),
        posexplode(split(coalesce(col(textCol), lit("")), "\r?\n"))
          .as(Seq("line_no", "__raw")))
      .withColumn("__line",
        trim(regexp_replace(col("__raw"), "#.*$", "")))
      .filter(col("__line") =!= "")
      .withColumn("directive",
        lower(trim(substring_index(col("__line"), ":", 1))))
      .withColumn("value",
        trim(expr("substring(__line, instr(__line, ':') + 1)")))
      .filter(col("directive").isin(directives.map(d => d: Any): _*))
    val w = Window.partitionBy(col("host")).orderBy(col("line_no"))
    lines
      .withColumn("__ua", col("directive") === "user-agent")
      .withColumn("__start", col("__ua") &&
        !coalesce(lag(col("__ua"), 1).over(w), lit(false)))
      .withColumn("group_id",
        sum(col("__start").cast("long")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("host"), col("group_id"),
        col("line_no").cast("long").as("line_no"), col("directive"),
        when(col("__ua"), lower(col("value")))
          .otherwise(col("value")).as("value"))
  }

  /** Translate one robots rule path into the regex that implements its
    * RFC matching: every regex metachar escapes EXCEPT `*` (→ `.*`)
    * and a TRAILING `$` (→ end anchor; `$` anywhere else is
    * literal). */
  private def robotsPattern(path: Column): Column = {
    val anchored = path.endsWith("$")
    val body = when(anchored, expr("substring(value, 1, length(value) - 1)"))
      .otherwise(path)
    val escaped = regexp_replace(body,
      "([.\\[\\]{}()+?^$|\\\\])", "\\\\$1")
    concat(lit("^"), regexp_replace(escaped, "\\*", ".*"),
      when(anchored, lit("$")).otherwise(lit("")))
  }


  /** RFC 9309 group selection shared by [[evaluateRobots]] and
    * [[robotsCrawlDelay]]: the groups naming `agent` exactly
    * (case-insensitive) where any exist for the host, else the `*`
    * groups; multiple matches merge. */
  private def chosenGroups(rules: DataFrame, agent: String): DataFrame = {
    val agents = rules.filter(col("directive") === "user-agent")
      .select(col("host"), col("group_id"), col("value").as("ua"))
    val exact = agents.filter(col("ua") === agent.toLowerCase)
      .select(col("host"), col("group_id")).distinct()
    val star = agents.filter(col("ua") === "*")
      .select(col("host"), col("group_id")).distinct()
      .join(exact.select(col("host")).distinct(), Seq("host"),
        "left_anti")
    exact.union(star)
  }

  /** Evaluate [[parseRobots]] rules for `agent` over a URL table:
    * (url, host, allowed, matched_rule, matched_path).
    *
    * Group selection per RFC 9309: the groups naming our agent exactly
    * (case-insensitive) if any exist for the host, else the `*`
    * groups; multiple matching groups merge. Decision per URL: among
    * rules whose pattern matches the URL's PATH + `?` + QUERY (the
    * RFC-9309/Google match target — rules like `Disallow: /search?q=`
    * or a wildcard-then-`?sessionid=` pattern gate on the query
    * string, and a `$`-anchored
    * `Disallow: /search$` must NOT block `/search?q=x`; RFC wildcards:
    * `*` anywhere, `$` end anchor), the LONGEST rule wins and `allow`
    * wins length ties (the published Google semantics); no matching
    * rule — or no robots.txt for the host at all — allows. Empty rule
    * paths (`Disallow:` alone = no restriction) drop at parse-eval
    * boundary. A URL with an empty path evaluates as `/`.
    *
    * Shape: the chosen-rule table is host-keyed and small relative to
    * the URL table (one row per rule line); the join shuffles by host
    * (or broadcasts under AQE), then one max_by per URL — no window
    * over the URL side. */
  def evaluateRobots(urls: DataFrame, urlCol: String, rules: DataFrame,
      agent: String): DataFrame = {
    val chosen = chosenGroups(rules, agent)
    val paths = rules
      .filter(col("directive").isin("allow", "disallow") &&
        col("value") =!= "")
      .join(chosen, Seq("host", "group_id"), "left_semi")
      .select(col("host"), col("directive"), col("value"),
        robotsPattern(col("value")).as("__pat"))
    val path = coalesce(
      when(try_parse_url(col(urlCol), lit("PATH")) === "", lit("/"))
        .otherwise(try_parse_url(col(urlCol), lit("PATH"))),
      lit("/"))
    val query = try_parse_url(col(urlCol), lit("QUERY"))
    val u = urls.select(col(urlCol).as("url"),
        canonicalHost(col(urlCol)).as("host"),
        when(query.isNotNull, concat(path, lit("?"), query))
          .otherwise(path).as("__path"))
    val matched = u.join(paths, Seq("host"))
      .filter(regexp_like(col("__path"), col("__pat")))
      .groupBy(col("url"), col("host"))
      .agg(max_by(
        struct(col("directive"), col("value")),
        // longest rule wins; allow beats disallow on equal length; the
        // path string itself breaks exact ties deterministically
        struct(length(col("value")),
          (col("directive") === "allow").cast("int"),
          col("value"))).as("__win"))
      .select(col("url"), col("host"),
        (col("__win.directive") === "allow").as("allowed"),
        col("__win.directive").as("matched_rule"),
        col("__win.value").as("matched_path"))
    u.select(col("url"), col("host")).join(matched.drop("host"),
        Seq("url"), "left")
      .select(col("url"), col("host"),
        coalesce(col("allowed"), lit(true)).as("allowed"),
        col("matched_rule"), col("matched_path"))
  }

  /** Per-host `Crawl-delay` for `agent` — the politeness knob most
    * crawlers honor (non-standard but ubiquitous; [[parseRobots]]'s
    * default directive set drops it, so this re-parses with it kept).
    * Group selection is [[evaluateRobots]]'s; among the merged
    * groups' delays the LARGEST wins (the most polite reading of
    * conflicting directives). Values parse as non-negative seconds
    * (fractions legal), emitted as integer `delay_ms`; hosts with no
    * parseable delay are absent (a downstream scheduler left-joins
    * and applies its own default). */
  def robotsCrawlDelay(robots: DataFrame, hostCol: String,
      textCol: String, agent: String): DataFrame = {
    val rules = parseRobots(robots, hostCol, textCol,
      directives = Seq("user-agent", "allow", "disallow", "crawl-delay"))
    rules.filter(col("directive") === "crawl-delay")
      .join(chosenGroups(rules, agent), Seq("host", "group_id"),
        "left_semi")
      .withColumn("__d", expr("try_cast(value AS DOUBLE)"))
      .filter(col("__d").isNotNull && col("__d") >= 0)
      .groupBy(col("host"))
      .agg(max(round(col("__d") * 1000).cast("long")).as("delay_ms"))
  }

  /** Sitemap discovery from robots.txt — the directive [[parseRobots]]
    * intentionally drops, surfaced here as crawl SEEDS:
    * (host, line_no, sitemap_url) per `Sitemap:` line (the directive
    * is group-independent per RFC 9309 §2.3 / sitemaps.org, so no
    * group machinery applies). Comments strip; CRLF-safe split; the
    * URL value keeps its case (URLs are case-sensitive). Map-only. */
  def robotsSitemaps(robots: DataFrame, hostCol: String,
      textCol: String): DataFrame =
    robots.select(col(hostCol).as("host"),
        posexplode(split(coalesce(col(textCol), lit("")), "\r?\n"))
          .as(Seq("line_no", "__raw")))
      .withColumn("__line",
        trim(regexp_replace(col("__raw"), "#.*$", "")))
      .filter(lower(col("__line")).startsWith("sitemap:"))
      .select(col("host"), col("line_no").cast("long").as("line_no"),
        trim(expr("substring(__line, instr(__line, ':') + 1)"))
          .as("sitemap_url"))
      .filter(col("sitemap_url") =!= "")

  /** Parse sitemap XML bodies (sitemaps.org `<urlset>` or
    * `<sitemapindex>`): one row per `<url>`/`<sitemap>` entry —
    * (id, entry_idx, loc, lastmod, is_index). `is_index` marks
    * entries that point at FURTHER sitemaps (the crawl walks those
    * before it has page seeds). `<loc>` values entity-decode (&amp;
    * is mandatory XML escaping in sitemap URLs); absent `<lastmod>`
    * is NULL. Pure regexp walk over the entry blocks — map-only, no
    * XML library, tolerant of malformed tails (unclosed entries
    * simply do not match). */
  def parseSitemap(docs: DataFrame, idCol: String,
      xmlCol: String): DataFrame = {
    // two backreference-free extracts (RE2-safe, twin-replayable): a
    // real sitemap file carries ONE kind, so concatenating the two
    // lists preserves document order
    def kind(re: String, isIndex: Boolean) =
      transform(regexp_extract_all(col(xmlCol), lit(re), lit(1)),
        e => struct(e.as("e"), lit(isIndex).as("idx")))
    val entries = concat(
      kind("(?is)<url>(.*?)</url>", isIndex = false),
      kind("(?is)<sitemap>(.*?)</sitemap>", isIndex = true))
    val xmlUnescape: Column => Column = c =>
      Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&apos;" -> "'", "&amp;" -> "&")
        .foldLeft(c) { case (acc, (e, ch)) =>
          regexp_replace(acc, java.util.regex.Pattern.quote(e), ch) }
    val lastmod = regexp_extract(col("__e.e"),
      "(?is)<lastmod>(.*?)</lastmod>", 1)
    docs.select(col(idCol).as("id"),
        posexplode(entries).as(Seq("entry_idx", "__e")))
      .select(col("id"), col("entry_idx").cast("long").as("entry_idx"),
        xmlUnescape(trim(regexp_extract(col("__e.e"),
          "(?is)<loc>(.*?)</loc>", 1))).as("loc"),
        when(lastmod =!= "", trim(lastmod)).as("lastmod"),
        col("__e.idx").as("is_index"))
      .filter(col("loc") =!= "")
  }

  /** Two-level public suffixes for [[registrableDomain]] — the pinned
    * HEURISTIC core of the public-suffix list (the full PSL is
    * thousands of rules and ships as data in production; this bounded
    * set covers the dominant ccTLD second-level registries and is
    * part of the operator contract, mirrored in oracle twins). */
  val twoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.mx", "com.ar", "co.in",
    "co.nz", "co.za", "com.tr", "com.cn", "com.sg", "com.hk", "com.tw")

  /** The registrable domain (eTLD+1) of a host column — the
    * per-SITE rollup key crawl caps and mixture budgets actually want
    * (`news.bbc.co.uk` and `www.bbc.co.uk` are one site, `bbc.co.uk`;
    * host-level caps treat them as two). Rule: a host ending in a
    * listed two-level suffix keeps its last THREE labels, any other
    * dotted host its last TWO; bare hosts (localhost) and IPv4
    * literals pass through unchanged. */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val lastK: Int => Column = k =>
      array_join(slice(labels, n - (k - 1), lit(k)), ".")
    val isIp = host.rlike("^\\d+\\.\\d+\\.\\d+\\.\\d+$")
    val twoLevel = lastK(2).isin(twoLevelSuffixes.map(lit(_)): _*)
    when(host.isNull || isIp || n <= 1, host)
      .when(twoLevel && n >= 3, lastK(3))
      .when(twoLevel, host) // the bare registry suffix itself
      .otherwise(lastK(2))
  }

  /** Per-registrable-domain crawl rollup: (domain, n_urls, n_hosts) —
    * the audit a domain-capped mix reads before budgeting. Hostless
    * rows fail closed, consistent with [[perHostCap]]. */
  def domainRollup(df: DataFrame, urlCol: String): DataFrame = {
    val host = canonicalHost(col(urlCol))
    df.select(registrableDomain(host).as("domain"), host.as("__h"))
      .where(col("domain").isNotNull && col("domain") =!= "")
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"),
        count_distinct(col("__h")).as("n_hosts"))
  }

  /** Politeness-respecting fetch schedule for an (already-governed)
    * frontier: cap each host at `cap` URLs ([[perHostCap]]'s md5-order
    * bounded heaps), then space that host's fetches by its
    * [[robotsCrawlDelay]] (or `defaultDelayMs` when the host declares
    * none): `fetch_at_ms = (pos − 1) · delay_ms`, the offset from the
    * host's first fetch. The relational form of a crawl scheduler's
    * per-host queue — what turns an admitted URL SET into a fetch
    * TIMELINE that honors Crawl-delay.
    *
    * Output: (id, url, host, pos, delay_ms, fetch_at_ms).
    *
    * 100 TB shape: the heap pass bounds every host at `cap` rows BEFORE
    * any exchange (a mega-host never forces a sort); the rank window
    * and the delay join are both host-keyed, reusing the heap pass's
    * hash partitioning — one effective exchange end to end. The delay
    * table is per-host (robots-sized), never corpus-sized. */
  def frontierSchedule(df: DataFrame, urlCol: String, idCol: String,
      delays: DataFrame, defaultDelayMs: Long, cap: Int): DataFrame = {
    require(defaultDelayMs >= 0, "frontierSchedule needs defaultDelayMs >= 0")
    val base = df.select(col(idCol).as("id"), col(urlCol).as("url"),
        canonicalHost(col(urlCol)).as("host"))
      .where(col("host").isNotNull && col("host") =!= "")
      .withColumn("__k", md5(col("id").cast("string")))
    val capped = graft.plans.TopKPerGroup(base,
        Seq(col("host")), Seq(col("__k").asc, col("id").asc), cap)
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("host")).orderBy(col("__k"), col("id"))))
      .drop("__k")
    capped
      .join(delays.select(col("host"), col("delay_ms").as("__d")),
        Seq("host"), "left")
      .withColumn("delay_ms", coalesce(col("__d"), lit(defaultDelayMs)))
      .select(col("id"), col("url"), col("host"), col("pos"),
        col("delay_ms"),
        ((col("pos") - 1) * col("delay_ms")).as("fetch_at_ms"))
  }

  /** Recrawl reconciliation of a sitemap against the previous crawl
    * snapshot — the freshness loop an incremental crawl runs between
    * visits. `entries` is [[parseSitemap]]'s page table (loc [, lastmod
    * W3C date]); `snapshot` carries (url, fetched_on 'yyyy-MM-dd') from
    * the prior wave's manifest. Per URL:
    *   - `new`     — listed, never fetched;
    *   - `refetch` — listed with a parseable lastmod DATE strictly
    *                 after the snapshot's fetch date (time-of-day
    *                 precision beyond the date is ignored — the
    *                 conservative daily-granularity reading);
    *   - `keep`    — listed, fetched, and not provably stale (absent
    *                 or unparseable lastmod cannot prove staleness);
    *   - `gone`    — fetched before but no longer listed (the
    *                 tombstone candidate a take-down audit reads).
    * Output: (url, action, lastmod, fetched_on).
    *
    * 100 TB shape: ONE full-outer join keyed on url; date compare is
    * map-side. Both inputs are URL-grain (sitemap and manifest), never
    * content-grain — the plan touches no page bytes. */
  def recrawlPlan(entries: DataFrame, locCol: String, lastmodCol: String,
      snapshot: DataFrame, urlCol: String, fetchedCol: String)
      : DataFrame = {
    val e = entries.select(col(locCol).as("url"),
      col(lastmodCol).as("lastmod"), lit(true).as("__listed"))
    val sn = snapshot.select(col(urlCol).as("url"),
      col(fetchedCol).as("fetched_on"), lit(true).as("__seen"))
    val lm = expr("try_cast(substring(lastmod, 1, 10) AS DATE)")
    val fd = expr("try_cast(fetched_on AS DATE)")
    e.join(sn, Seq("url"), "full_outer")
      .withColumn("action",
        when(col("__seen").isNull, lit("new"))
          .when(col("__listed").isNull, lit("gone"))
          .when(lm.isNotNull && fd.isNotNull && lm > fd, lit("refetch"))
          .otherwise(lit("keep")))
      .select(col("url"), col("action"), col("lastmod"),
        col("fetched_on"))
  }
}
