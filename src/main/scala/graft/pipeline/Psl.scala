package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Public-suffix-list-backed registered-domain extraction.
  *
  * A pinned SNAPSHOT SUBSET of the Mozilla Public Suffix List
  * (https://publicsuffix.org — public MPL-2.0 data): the high-traffic
  * ICANN second-level registries plus the private-section hosting
  * suffixes a web corpus actually hits (github.io, blogspot.com,
  * amazonaws.com subtrees, …). A production deployment swaps
  * `exactRules`/`wildcardBases`/`exceptions` for the full generated
  * list — the matching algorithm below is the complete PSL algorithm
  * (longest match wins, exception rules beat wildcard rules, unknown
  * TLD falls through to the documented heuristic), so only the data
  * grows, not the plan.
  *
  * Scale posture: the rule sets are literal `isin` lists — Catalyst
  * converts them to `InSet` hash lookups (O(1) per row, codegen'd),
  * so registered-domain extraction stays MAP-ONLY with zero joins and
  * zero broadcast state. The DuckDB oracle twin (`domainCaseSql`,
  * `pubLenCaseSql`) is GENERATED from the same rule vals, so the two
  * engines cannot drift.
  *
  * PSL algorithm notes (publicsuffix.org/list/ spec):
  *   - an exact rule of K labels matching the host's K-label suffix
  *     makes that suffix the public suffix (pubLen = K);
  *   - a wildcard rule `*.B` (base B of K labels) makes any
  *     (K+1)-label suffix ending in B a public suffix (pubLen = K+1);
  *   - an exception rule `!E` (E of K labels) overrides: the public
  *     suffix is E minus its leftmost label (pubLen = K-1);
  *   - the prevailing rule is the longest match; exceptions win;
  *   - registered domain = public suffix + one more label; a host
  *     that IS a public suffix (or a single label) returns itself —
  *     the same convention the pre-PSL heuristic used.
  */
object Psl {

  /** Exact public-suffix rules (ICANN section: country second-level
    * registries; private section: hosting platforms). Mixed label
    * counts; split by depth below. */
  val exactRules: Seq[String] = Seq(
    // ---- ICANN: United Kingdom
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "sch.uk",
    "ac.uk", "gov.uk", "nhs.uk", "police.uk",
    // ---- Japan
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    // ---- Australia / New Zealand
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "ac.nz", "co.nz", "geek.nz", "gen.nz", "govt.nz", "iwi.nz",
    "maori.nz", "net.nz", "org.nz", "school.nz",
    // ---- Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br", "art.br",
    // ---- India
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "ac.in",
    "edu.in", "res.in", "gov.in", "mil.in", "nic.in",
    // ---- China
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "net.cn", "org.cn", "mil.cn",
    // ---- South Korea
    "co.kr", "ne.kr", "or.kr", "re.kr", "pe.kr", "go.kr", "mil.kr",
    "ac.kr", "hs.kr", "ms.kr", "es.kr", "sc.kr", "kg.kr",
    // ---- South Africa / Kenya / Nigeria / Egypt
    "co.za", "net.za", "org.za", "gov.za", "edu.za", "ac.za", "web.za",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "me.ke",
    "mobi.ke", "info.ke",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng", "mil.ng",
    "name.ng", "sch.ng", "i.ng",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg", "mil.eg", "sci.eg",
    "eun.eg", "name.eg",
    // ---- Latin America
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar", "int.ar", "mil.ar",
    "tur.ar",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "mil.co", "nom.co",
    "gob.cl", "gov.cl", "co.cl", "mil.cl",
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe", "mil.pe", "nom.pe",
    "com.ve", "net.ve", "org.ve", "edu.ve", "gob.ve", "mil.ve", "web.ve",
    "co.ve", "info.ve",
    // ---- Turkey / Israel / Saudi Arabia / UAE / Pakistan
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "mil.tr", "k12.tr",
    "av.tr", "bel.tr", "gen.tr", "web.tr",
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il", "k12.il",
    "idf.il",
    "com.sa", "net.sa", "org.sa", "gov.sa", "med.sa", "pub.sa", "edu.sa",
    "sch.sa",
    "co.ae", "net.ae", "org.ae", "sch.ae", "ac.ae", "gov.ae", "mil.ae",
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk",
    // ---- East / Southeast Asia
    "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "game.tw", "club.tw", "mil.tw",
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg",
    "co.th", "ac.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    "co.id", "ac.id", "go.id", "mil.id", "net.id", "or.id", "sch.id",
    "web.id", "biz.id", "my.id",
    "com.my", "net.my", "org.my", "gov.my", "edu.my", "mil.my",
    "name.my",
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph", "ngo.ph", "mil.ph",
    "i.ph",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn", "ac.vn",
    "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
    // ---- Europe
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    "info.pl", "biz.pl",
    "gov.it", "edu.it",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "asso.fr", "com.fr", "gouv.fr", "nom.fr", "prd.fr", "tm.fr",
    "com.gr", "edu.gr", "net.gr", "org.gr", "gov.gr",
    "com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "nome.pt",
    "org.pt", "publ.pt",
    "com.ro", "org.ro", "nom.ro", "tm.ro", "info.ro",
    "ac.ru", "edu.ru", "gov.ru", "int.ru", "mil.ru",
    "ac.at", "co.at", "gv.at", "or.at",
    "ac.be",
    // ---- Canada provinces + federal
    "ab.ca", "bc.ca", "mb.ca", "nb.ca", "nf.ca", "nl.ca", "ns.ca",
    "nt.ca", "nu.ca", "on.ca", "pe.ca", "qc.ca", "sk.ca", "yk.ca",
    "gc.ca",
    // ---- US state registries
    "al.us", "ak.us", "az.us", "ar.us", "ca.us", "co.us", "ct.us",
    "de.us", "dc.us", "fl.us", "ga.us", "hi.us", "id.us", "il.us",
    "in.us", "ia.us", "ks.us", "ky.us", "la.us", "me.us", "md.us",
    "ma.us", "mi.us", "mn.us", "ms.us", "mo.us", "mt.us", "ne.us",
    "nv.us", "nh.us", "nj.us", "nm.us", "ny.us", "nc.us", "nd.us",
    "oh.us", "ok.us", "or.us", "pa.us", "ri.us", "sc.us", "sd.us",
    "tn.us", "tx.us", "ut.us", "vt.us", "va.us", "wa.us", "wv.us",
    "wi.us", "wy.us",
    // ---- private section: hosting / PaaS / CDN suffixes
    "github.io", "gitlab.io", "blogspot.com", "appspot.com",
    "herokuapp.com", "netlify.app", "vercel.app", "pages.dev",
    "web.app", "firebaseapp.com", "azurewebsites.net", "cloudfront.net",
    "glitch.me", "surge.sh", "neocities.org", "readthedocs.io",
    "wixsite.com", "fly.dev", "onrender.com", "workers.dev", "deno.dev",
    // private section, 3-label
    "blogspot.co.uk", "blogspot.com.br", "s3.amazonaws.com")

  /** Wildcard rules `*.B`, stored as their bases B. (elb.amazonaws.com
    * is a WILDCARD in the real PSL — each region zone is the public
    * suffix — not an exact rule.) */
  val wildcardBases: Seq[String] = Seq(
    "bd", "ck", "er", "fk", "jm", "kh", "mm", "np", "pg",
    "compute.amazonaws.com", "compute-1.amazonaws.com",
    "elb.amazonaws.com")

  /** Exception rules `!E` (win over wildcards). */
  val exceptions: Seq[String] = Seq("www.ck")

  /** Unknown-TLD fallback (the pre-PSL heuristic, kept as the no-data
    * path): under a TLD with no rule at all, `<x>.co.<tld>`-shaped
    * hosts still get a 3-label registered domain. */
  val fallbackSecondLevels: Seq[String] =
    Seq("co", "com", "org", "net", "ac", "gov")

  private def nLabels(s: String): Int = s.count(_ == '.') + 1
  val rules2: Seq[String] = exactRules.filter(nLabels(_) == 2)
  val rules3: Seq[String] = exactRules.filter(nLabels(_) == 3)
  val wild1: Seq[String] = wildcardBases.filter(nLabels(_) == 1)
  val wild3: Seq[String] = wildcardBases.filter(nLabels(_) == 3)
  val exc2: Seq[String] = exceptions.filter(nLabels(_) == 2)
  require(rules2.size + rules3.size == exactRules.size,
    "exact rules must be 2 or 3 labels (extend the matcher for deeper rules)")
  require(wild1.size + wild3.size == wildcardBases.size &&
    exc2.size == exceptions.size,
    "wildcard/exception depths outside the matcher's range")

  private val rules2Set = rules2.toSet
  private val rules3Set = rules3.toSet
  private val wild1Set = wild1.toSet
  private val wild3Set = wild3.toSet
  private val exc2Set = exc2.toSet
  private val fallbackSet = fallbackSecondLevels.toSet

  /** JVM kernel for [[PslDomain]] (called from generated code via the
    * static forwarder — keep it a top-level object method). One hash-set
    * lookup per candidate suffix. `split(_, -1)` keeps trailing empty
    * labels, matching Spark's `split` / DuckDB's `string_split` on an
    * FQDN-style trailing dot. */
  def registeredDomainJvm(h: UTF8String): UTF8String = {
    val labels = h.toString.split("\\.", -1)
    val n = labels.length
    if (n <= 1) return h
    def sfx(k: Int): String = {
      val sb = new java.lang.StringBuilder
      var i = n - k
      while (i < n) {
        if (sb.length > 0) sb.append('.'); sb.append(labels(i)); i += 1
      }
      sb.toString
    }
    val s2 = sfx(2)
    val s3 = if (n >= 3) sfx(3) else "" // "" never matches a 3-label rule
    val pubLen =
      if (exc2Set(s2)) 1                                 // exceptions win
      else if (wild3Set(s3)) 4                           // then longest
      else if (rules3Set(s3)) 3
      else if (rules2Set(s2) || wild1Set(labels(n - 1))) 2
      else if (n >= 3 && fallbackSet(labels(n - 2))) 2   // unknown-TLD heuristic
      else 1
    // a host that IS a public suffix (or a single label) is its own domain
    if (n <= pubLen) h
    else UTF8String.fromString(labels.slice(n - pubLen - 1, n).mkString("."))
  }

  /** Registered domain of an already-normalized host (lowercase, no
    * leading www., no port). ONE compact expression node calling the
    * JVM kernel: a literal-tree encoding of the ~290 rules (isin →
    * InSet) would execute fine but costs SECONDS of driver time per
    * query — Catalyst re-canonicalizes the giant tree wherever the
    * domain column is referenced across plan branches (measured: +2.5 s
    * scale-INDEPENDENT on q295's two-branch reuse). The kernel keeps
    * the optimizer's view O(1) and whole-stage codegen a single static
    * call; the rule sets live once in the JVM. */
  def registeredDomainOfHost(h: Column): Column =
    org.apache.spark.sql.GraftBridge.col(PslDomain(
      org.apache.spark.sql.GraftBridge.expr(h)))

  // ---- DuckDB oracle twin, GENERATED from the same rule vals ----

  private def sqlList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString(", ")

  /** SQL for the public-suffix length over a host column, given a
    * list-of-labels expression `ls`. Mirrors `registeredDomainOfHost`
    * branch for branch (DuckDB's `ls[-k:]` of a shorter list yields
    * the whole list — fewer dots than a k-label rule, so it can never
    * false-match, same argument as the Spark side's "" sentinel). */
  def pubLenCaseSql(ls: String): String = {
    val s1 = s"array_to_string($ls[-1:], '.')"
    val s2 = s"array_to_string($ls[-2:], '.')"
    val s3 = s"array_to_string($ls[-3:], '.')"
    s"""CASE WHEN $s2 IN (${sqlList(exc2)}) THEN 1
       |     WHEN $s3 IN (${sqlList(wild3)}) THEN 4
       |     WHEN $s3 IN (${sqlList(rules3)}) THEN 3
       |     WHEN $s2 IN (${sqlList(rules2)}) OR $s1 IN (${sqlList(wild1)}) THEN 2
       |     WHEN len($ls) >= 3 AND $ls[-2] IN (${sqlList(fallbackSecondLevels)}) THEN 2
       |     ELSE 1 END""".stripMargin
  }

  /** SQL for the registered domain given host column `host`, its label
    * list `ls`, and a precomputed pubLen column `pub`. */
  def domainCaseSql(host: String, ls: String, pub: String): String =
    s"""CASE WHEN len($ls) <= $pub THEN $host
       |     ELSE array_to_string($ls[-($pub + 1):], '.') END""".stripMargin
}

/** PSL registered-domain extraction as one codegen-friendly expression
  * node (see [[Psl.registeredDomainOfHost]] for why not a literal
  * `isin` tree). Full `doGenCode` — no CodegenFallback — so map-only
  * canonicalization stays inside whole-stage codegen. */
case class PslDomain(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "psl_registered_domain"

  override protected def nullSafeEval(h: Any): Any =
    Psl.registeredDomainJvm(h.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.pipeline.Psl.registeredDomainJvm($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
