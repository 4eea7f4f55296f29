package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL/domain canonicalization + dedup — the WET-pipeline front door for a
  * web-scale training corpus (the operation CommonCrawl-derived pipelines
  * run before any text dedup: collapse scheme/case/port/tracking-param
  * variants of one page, then cap per-domain document counts so no single
  * host dominates the mix).
  *
  * Canonical form (documented, both the engine and the DuckDB oracle
  * implement exactly these rules):
  *   - scheme lowercased; host lowercased; a leading `www.` stripped;
  *   - a default port dropped (`:80` for http, `:443` for https), any
  *     other port kept;
  *   - path: trailing `/` stripped; empty path becomes `/`;
  *   - fragment dropped;
  *   - query: tracking params removed (`utm_*`, `fbclid`, `gclid`,
  *     `ref`), the rest SORTED bytewise and re-joined; empty → no `?`.
  *
  * Registered domain: full public-suffix-list matching via [[Psl]]
  * (longest rule wins, wildcard and exception rules, pinned snapshot of
  * publicsuffix.org data) with the minimal heuristic (last two labels,
  * or three when the second-to-last is co/com/org/net/ac/gov) as the
  * unknown-TLD fallback. Map-only either way — the rule lists compile
  * to InSet hash lookups, no join, no broadcast state.
  *
  * Scale posture: canonicalization is map-only native string expressions
  * (no UDFs, no interpreted lambdas — the only array ops are lambda-free
  * `array_sort`/`array_join`/`slice`, which stay codegen-friendly);
  * `dedupByUrl` is one hash aggregation keyed by the canonical string;
  * `domainCap` is one window keyed by registered domain. Shuffles carry
  * urls/domains, never document text.
  */
object UrlCanon {

  /** Tracking params stripped by the canonicalizer (one alternation, so
    * the strip is a single regexp_replace pass). */
  val trackingPattern = "(^|&)(utm_[a-z]+|fbclid|gclid|ref)=[^&]*"

  private def hostPort(url: Column): Column =
    regexp_extract(url, "^[A-Za-z]+://([^/?#]+)", 1)

  def scheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z]+)://", 1))

  /** Lowercased host, `www.` and port stripped. */
  def host(url: Column): Column =
    regexp_replace(
      regexp_replace(lower(hostPort(url)), ":[0-9]+$", ""), "^www\\.", "")

  /** Non-default port with its colon, else empty ("":80 http, ":443"
    * https are defaults). */
  def nonDefaultPort(url: Column): Column = {
    val p = regexp_extract(lower(hostPort(url)), ":([0-9]+)$", 1)
    when(p === "", lit(""))
      .when(scheme(url) === "http" && p === "80", lit(""))
      .when(scheme(url) === "https" && p === "443", lit(""))
      .otherwise(concat(lit(":"), p))
  }

  /** Path with trailing slash stripped; empty → "/". */
  def path(url: Column): Column = {
    val raw = regexp_extract(url, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    val trimmed = regexp_replace(raw, "/+$", "")
    when(trimmed === "", lit("/")).otherwise(trimmed)
  }

  /** Query string with tracking params removed and the remainder sorted
    * bytewise; empty when nothing survives. */
  def canonicalQuery(url: Column): Column = {
    val q = regexp_extract(url, "\\?([^#]*)", 1)
    val stripped = regexp_replace(
      regexp_replace(q, trackingPattern, ""), "^&+", "")
    when(stripped === "", lit(""))
      .otherwise(array_join(array_sort(split(stripped, "&")), "&"))
  }

  def canonicalUrl(url: Column): Column = {
    val q = canonicalQuery(url)
    concat(scheme(url), lit("://"), host(url), nonDefaultPort(url), path(url),
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** Registered domain (PSL-backed, see header and [[Psl]]). A host
    * with fewer than two labels (localhost, an empty host from a
    * malformed URL — routine in real web corpora) IS its own domain,
    * as is a host that is itself a public suffix (github.io, b.ck). */
  def registeredDomain(url: Column): Column =
    Psl.registeredDomainOfHost(host(url))

  /** Adds url_canonical / url_host / url_domain / url_path columns. */
  def canonicalize(df: DataFrame, urlCol: String): DataFrame = {
    val u = col(urlCol)
    df.withColumn("url_canonical", canonicalUrl(u))
      .withColumn("url_host", host(u))
      .withColumn("url_domain", registeredDomain(u))
      .withColumn("url_path", path(u))
  }

  /** Exact URL-level dedup: one keeper (lowest id) per canonical URL,
    * with the collapsed variant count. One hash aggregation. */
  def dedupByUrl(df: DataFrame, urlCol: String, idCol: String): DataFrame =
    canonicalize(df, urlCol)
      .groupBy(col("url_canonical"), col("url_domain"))
      .agg(min(col(idCol)).as("keeper_id"),
        count(lit(1)).as("n_variants"))

  /** Per-registered-domain cap over the DEDUPED set: keep the `cap`
    * lowest-keeper-id pages of each domain (the anti-domination mix rule).
    * One window keyed by domain — domains are the natural parallel unit;
    * a pathological single-domain corpus would need the salted two-phase
    * rank instead (Sharding's pattern). */
  def domainCap(df: DataFrame, urlCol: String, idCol: String, cap: Int): DataFrame =
    capDeduped(dedupByUrl(df, urlCol, idCol), cap)

  /** The cap alone, over an already-deduped frame (`dedupByUrl` output) —
    * so a pipeline that needs both the dedup stats AND the capped set
    * canonicalizes/aggregates once instead of twice.
    *
    * `salt` is the skew escape hatch for a pathological corpus where one
    * domain holds a data-sized share of the pages (a single-domain crawl
    * would otherwise serialize into ONE window task). With `salt = s > 1`
    * the rank runs in two phases (Sharding's pattern): phase 1 ranks
    * within (domain, keeper_id-hash bucket) — s parallel tasks per
    * domain — and keeps at most `cap` rows per bucket; phase 2 re-ranks
    * the ≤ s·cap survivors per domain, which is now a BOUNDED set
    * regardless of corpus size. Exact: every true top-`cap` row of a
    * domain is within the top `cap` of its own bucket, so phase 1 never
    * drops a keeper. Default `salt = 1` is the plain single window —
    * domains are the natural parallel unit for real web corpora. */
  def capDeduped(deduped: DataFrame, cap: Int, salt: Int = 1): DataFrame =
    if (salt <= 1)
      deduped
        .withColumn("__rk", row_number().over(
          Window.partitionBy(col("url_domain")).orderBy(col("keeper_id"))))
        .filter(col("__rk") <= cap)
        .drop("__rk")
    else
      deduped
        .withColumn("__b", pmod(xxhash64(col("keeper_id")), lit(salt.toLong)))
        .withColumn("__rk1", row_number().over(
          Window.partitionBy(col("url_domain"), col("__b"))
            .orderBy(col("keeper_id"))))
        .filter(col("__rk1") <= cap)
        .withColumn("__rk", row_number().over(
          Window.partitionBy(col("url_domain")).orderBy(col("keeper_id"))))
        .filter(col("__rk") <= cap)
        .drop("__b", "__rk1", "__rk")

  /** [[capDeduped]] with a PER-DOMAIN budget: `caps` is a
    * domain-cardinality frame `(url_domain, cap)` — e.g. a base budget
    * shrunk for domains whose mass is mostly syndicated-in (the
    * q319 `synd_in_bp` signal): a domain that mostly copies earns fewer
    * keeper slots than one that originates. Domains absent from `caps`
    * get `defaultCap`. Same single domain-keyed rank window as the flat
    * cap; the caps side is broadcast (web-host cardinality, two
    * columns).
    *
    * The caps frame is defensively collapsed to one row per domain
    * (min(cap) — the conservative budget) BEFORE the join: a duplicate
    * `url_domain` row would otherwise fan the left join out and corrupt
    * the rank silently, and min-collapse fails safe instead of failing
    * loud on a caller contract nobody enforces.
    *
    * `salt` is the same one-domain-dominates escape hatch as
    * [[capDeduped]]'s (Sharding's two-phase rank): phase 1 ranks within
    * (domain, keeper_id-hash bucket) and keeps at most the domain's OWN
    * effective cap per bucket — the per-domain cap is already joined on
    * by then, so the bucket filter uses the exact budget, not a global
    * max — and phase 2 re-ranks the ≤ salt·cap bounded survivors. Exact
    * for the same reason as the flat version: a domain's true top-cap
    * rows are each within the top cap of their own bucket. Default
    * `salt = 1` keeps the plan of the original single-window shape. */
  def capDedupedBy(
      deduped: DataFrame, caps: DataFrame, defaultCap: Int,
      salt: Int = 1): DataFrame = {
    val capsUnique = caps.groupBy("url_domain").agg(min("cap").as("cap"))
    val joined = deduped
      .join(broadcast(capsUnique), Seq("url_domain"), "left")
      .withColumn("__cap", coalesce(col("cap"), lit(defaultCap)))
    val ranked =
      if (salt <= 1) joined
      else joined
        .withColumn("__b", pmod(xxhash64(col("keeper_id")), lit(salt.toLong)))
        .withColumn("__rk1", row_number().over(
          Window.partitionBy(col("url_domain"), col("__b"))
            .orderBy(col("keeper_id"))))
        .filter(col("__rk1") <= col("__cap"))
        .drop("__b", "__rk1")
    ranked
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("url_domain")).orderBy(col("keeper_id"))))
      .filter(col("__rk") <= col("__cap"))
      .drop("__rk", "__cap", "cap")
  }
}
