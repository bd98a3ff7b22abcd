package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Tables._

/** F58 (round 19, VERDICT r18 top ask): HTML→text extraction with
  * boilerplate-block removal — the FRONT DOOR of every published curation
  * pipeline the F rows implement (C4 [Raffel et al., JMLR 2020] extracts
  * from Common Crawl WET/HTML; CCNet [Wenzek et al., LREC 2020] likewise;
  * Gopher/MassiveWeb [Rae et al., 2021] and RefinedWeb/FineWeb run
  * trafilatura-style extraction first). The rules here are the
  * deterministic integer skeleton of the jusText/trafilatura block
  * heuristics (Pomikálek 2011: classify block-level segments by link
  * density and length, drop navigation chrome): tag-aware block
  * segmentation, per-block LINK DENSITY and word count, a pinned verdict
  * lattice, and the kept-block text rollup.
  *
  * PINNED EXTRACTION MODEL (every rule byte-exactly recomputable by the
  * DuckDB oracle — regexes are RE2∩Java-compatible: no backreferences,
  * no lookaround, explicit whitespace classes):
  *
  *   1. `<script>…</script>` and `<style>…</style>` spans are removed
  *      whole (non-greedy, dotall) — their text is code, never content.
  *   2. The page splits into BLOCKS on the close tags of the pinned
  *      block-level set [[Html.BlockTags]] (p, div, li, h1, h2, nav,
  *      footer, header, aside). A fragment is a block iff it contains an
  *      open tag of the set; its `tag` is the FIRST such open tag, and
  *      its `content` is everything after that open tag. Fragments with
  *      no block tag (inter-block text, trailing junk) are not blocks.
  *      Tag names are matched LOWERCASE — feed `lower(html)` upstream if
  *      a crawl mixes cases (the graded corpus manufactures lowercase).
  *   3. `link_chars` = Σ length of the RAW inner text of `<a …>…</a>`
  *      anchors in the content (anchors hold no nested tags in this
  *      model — the manufactured corpus honors that; real crawls flatten
  *      nested anchors rarely enough that link density stays honest).
  *   4. `text` = content with all tags → ' ', then the 5 core entities +
  *      `&nbsp;` decoded (`&nbsp;`→' ', `&lt;` `&gt;` `&quot;` `&#39;`
  *      first, `&amp;` LAST — the standard order that never
  *      double-decodes), then `[ \t\n\r]+` → ' ' and trim. (Explicit
  *      class, NOT `\s`: Java's `\s` includes `\x0B`, RE2's does not.)
  *   5. `text_chars` = length(text); `words` = single-space token count
  *      (0 for empty text); `link_density_millionths` =
  *      min(10⁶, link_chars·10⁶ div text_chars), pinned 10⁶ when
  *      text_chars = 0 — all integers, no floats anywhere.
  *   6. Block verdict (pinned precedence):
  *        'chrome'     — tag ∈ {nav, footer, header, aside} (structural
  *                       navigation/furniture, dropped regardless of text)
  *        'empty'      — text_chars = 0
  *        'link_heavy' — link_density_millionths > maxLinkMillionths
  *                       (default 200000 — jusText's max_link_density 0.2)
  *        'short'      — words < minWords (default 3, the C4 line rule)
  *        'content'    — otherwise (kept)
  *   7. Per page: `clean_text` = content blocks' text joined '\n' in
  *      block order ('' when nothing survives); docs whose html contains
  *      NO block fragment produce no row (not a parseable page — the
  *      caller's quarantine decision, mirroring B2).
  *
  * Scale shape: steps 1–6 are per-row regex/string predicates — pure
  * whole-stage-codegen projections, zero shuffle; the only shuffle is the
  * final doc-keyed partial agg whose collect bound is one PAGE's blocks
  * (the F49/F50 rollup bound, never a corpus structure). At 100 TB this
  * is scan-speed extraction, exactly like F50's line battery.
  */
object Html {

  /** The pinned block-level tag set (segmentation + tag extraction). */
  val BlockTags: Seq[String] =
    Seq("p", "div", "li", "h1", "h2", "nav", "footer", "header", "aside")

  /** Tags whose blocks are chrome (dropped regardless of content). */
  val ChromeTags: Seq[String] = Seq("nav", "footer", "header", "aside")

  private val alt = BlockTags.mkString("|")
  // `(?:>|[ ][^>]*>)` closes an open tag WITHOUT prefix-matching longer
  // names (`<pre>` must not match `p`): the tag name is followed either
  // directly by '>' or by a space + attributes.
  private[graft] val CloseSplitRe = s"</(?:$alt)>"
  private[graft] val OpenTagExtractRe = s"<($alt)(?:>|[ ][^>]*>)"
  private[graft] val OpenStripRe = s"(?s)^.*?<(?:$alt)(?:>|[ ][^>]*>)"
  private[graft] val AnchorRe = "(?s)<a(?:>|[ ][^>]*>)([^<]*)</a>"
  private val ScriptRe = "(?s)<script(?:>|[ ][^>]*>).*?</script>"
  private val StyleRe = "(?s)<style(?:>|[ ][^>]*>).*?</style>"

  /** The per-BLOCK relation: (doc_id, block_pos, tag, text_chars,
    * link_chars, words, link_density_millionths, verdict, text) over a
    * (doc_id, html) page frame. block_pos is the fragment's position in
    * the close-tag split (sparse when non-block fragments interleave —
    * deterministic without any window). */
  /** The pre-round-20 link_chars form — an interpreted
    * `aggregate(transform(regexp_extract_all(…)))` HOF fold, kept as
    * the `anchor_chars` kernel's spec-reference twin (Round20OpsSpec
    * pins bit-equality; the kernel is the shipped form because an
    * interpreted HOF breaks the projection out of whole-stage codegen —
    * the F19b/lm_score lesson, VERDICT r19 "what's wrong" 3). */
  private[graft] def linkCharsFoldCol(content: Column): Column = {
    val anchors =
      call_function("regexp_extract_all", content, lit(AnchorRe), lit(1))
    coalesce(aggregate(transform(anchors, a => length(a).cast("long")),
      lit(0L), (acc, x) => acc + x), lit(0L))
  }

  def htmlBlocks(pages: DataFrame, minWords: Int = 3,
      maxLinkMillionths: Long = 200000L): DataFrame = {
    require(minWords >= 0, s"minWords must be >= 0, got $minWords")
    require(maxLinkMillionths >= 0 && maxLinkMillionths <= 1000000L,
      s"maxLinkMillionths must be in [0, 1e6], got $maxLinkMillionths")
    graft.functions.VectorFunctions.register(pages.sparkSession) // anchor_chars
    val stripped = regexp_replace(
      regexp_replace(col("html"), ScriptRe, ""), StyleRe, "")
    val tagless = regexp_replace(col("content"), "<[^>]*>", " ")
    // entity decode: nbsp/lt/gt/quot/#39 first, amp LAST (never
    // double-decodes `&amp;lt;` into '<'); plain-literal patterns, so
    // regexp_replace ≡ replace on both engines
    val decoded = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(regexp_replace(tagless,
        "&nbsp;", " "), "&lt;", "<"), "&gt;", ">"),
      "&quot;", "\""), "&#39;", "'"), "&amp;", "&")
    pages.filter(col("html").isNotNull)
      .select(col("doc_id"),
        posexplode(split(stripped, CloseSplitRe)).as(Seq("block_pos", "frag")))
      .select(col("doc_id"), col("block_pos").cast("long").as("block_pos"),
        col("frag"), regexp_extract(col("frag"), OpenTagExtractRe, 1).as("tag"))
      .filter(col("tag") =!= "")
      .withColumn("content", regexp_replace(col("frag"), OpenStripRe, ""))
      .withColumn("link_chars",
        // coalesce for exactness with linkCharsFoldCol's outer coalesce:
        // the kernel NULL-propagates (idiomatic SQL), the fold pinned
        // NULL→0. `content` is non-null on this path (regexp_replace of
        // a non-null frag), so the optimizer elides it — this is the
        // spec-twin contract made explicit, not a runtime cost.
        coalesce(call_function("anchor_chars", col("content")), lit(0L)))
      .withColumn("text", trim(regexp_replace(decoded, "[ \\t\\n\\r]+", " ")))
      .withColumn("text_chars", length(col("text")).cast("long"))
      .withColumn("words", when(col("text") === "", lit(0L))
        .otherwise(size(split(col("text"), " ")).cast("long")))
      .withColumn("link_density_millionths",
        when(col("text_chars") === 0L, lit(1000000L))
          .otherwise(least(lit(1000000L),
            expr("link_chars * 1000000L div text_chars"))))
      .select(col("doc_id"), col("block_pos"), col("tag"), col("text_chars"),
        col("link_chars"), col("words"), col("link_density_millionths"),
        when(col("tag").isin(ChromeTags: _*), lit("chrome"))
          .when(col("text_chars") === 0L, lit("empty"))
          .when(col("link_density_millionths") > maxLinkMillionths,
            lit("link_heavy"))
          .when(col("words") < minWords, lit("short"))
          .otherwise(lit("content")).as("verdict"),
        col("text"))
  }

  /** The per-PAGE rollup: (doc_id, n_blocks, n_content, clean_text,
    * n_chars) — clean_text is the content blocks' text joined '\n' in
    * block order ('' when no block survives). Pages with no block
    * fragment produce no row (step 7 of the pinned model). */
  def htmlExtract(pages: DataFrame, minWords: Int = 3,
      maxLinkMillionths: Long = 200000L): DataFrame =
    htmlBlocks(pages, minWords, maxLinkMillionths)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("verdict") === "content", 1L).otherwise(0L))
          .as("n_content"),
        concat_ws("\n", transform(
          array_sort(collect_list(when(col("verdict") === "content",
            struct(col("block_pos"), col("text"))))),
          x => x.getField("text"))).as("clean_text"))
      .withColumn("n_chars", length(col("clean_text")).cast("long"))

  // ---- graded queries -----------------------------------------------------

  /** The manufactured page frame both graded queries extract from: the
    * corpus carries no HTML (the F50 situation — plain `documents.text`),
    * so deterministic structure is manufactured IN-QUERY, identically on
    * both engines. Blocks are 10-token windows ([[Dedup.paragraphWindows]],
    * the F50 template); each block's TAG is an md5 draw over its text
    * (first byte mod 8 over a mixed content/chrome tag list) and its LINK
    * SHAPE a second draw (hex chars 3-4 mod 4: plain / whole-anchor /
    * short-anchor prefix / `&amp;` entity suffix); every page opens with
    * a script span and closes with tag-less trailing junk, exercising
    * steps 1 and 2's non-block rule. The oracle rebuilds the windows,
    * both draws, the page string, and then the ENTIRE extraction model
    * from scratch, so the hash grades segmentation, link density, entity
    * decoding, the verdict lattice, and the rollup byte-for-byte.
    */
  private[graft] def syntheticPages(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    val wins = Dedup.paragraphWindows(documents(s, d), 10)
    val h = md5(col("para_text"))
    val tag = element_at(
      typedLit(Seq("p", "div", "li", "h1", "nav", "footer", "aside", "h2")),
      (conv(substring(h, 1, 2), 16, 10).cast("int") % 8) + 1)
    val mode = conv(substring(h, 3, 2), 16, 10).cast("int") % 4
    val inner = when(mode === 1,
        concat(lit("<a href=\"#\">"), col("para_text"), lit("</a>")))
      .when(mode === 2, concat(lit("<a href=\"#\">go</a> "), col("para_text")))
      .when(mode === 3, concat(col("para_text"), lit(" &amp; more")))
      .otherwise(col("para_text"))
    val block = concat(lit("<"), tag, lit(">"), inner, lit("</"), tag, lit(">"))
    wins.select(col("doc_id"), col("para_idx"), block.as("blk"))
      .groupBy(col("doc_id"))
      .agg(concat(lit("<script>var x = 1;</script>"),
        concat_ws("", transform(
          array_sort(collect_list(struct(col("para_idx"), col("blk")))),
          x => x.getField("blk"))),
        lit("trailing junk")).as("html"))
  }

  /** The manufacture + extraction steps 1-6 as shared DuckDB CTEs ending
    * in `vb` — the per-block verdict relation both oracles read. */
  private val htmlOracleCtes =
    """sp AS (SELECT doc_id, string_split(text, ' ') AS t
      |            FROM documents WHERE text IS NOT NULL),
      |b AS (SELECT doc_id, t, len(t) AS n FROM sp),
      |p AS (SELECT doc_id, CAST(floor(s / 10) AS BIGINT) AS pidx,
      |             array_to_string(t[s+1:s+10], ' ') AS base
      |      FROM b, unnest(generate_series(0, n - 1, 10)) AS u(s)),
      |dr AS (SELECT doc_id, pidx, base,
      |         (['p','div','li','h1','nav','footer','aside','h2'])[
      |           CAST(('0x' || substr(md5(base), 1, 2))::INT % 8 AS INT) + 1]
      |           AS tag,
      |         CAST(('0x' || substr(md5(base), 3, 2))::INT % 4 AS INT) AS mode
      |       FROM p),
      |bs AS (SELECT doc_id, pidx, '<' || tag || '>' ||
      |         CASE WHEN mode = 1 THEN '<a href="#">' || base || '</a>'
      |              WHEN mode = 2 THEN '<a href="#">go</a> ' || base
      |              WHEN mode = 3 THEN base || ' &amp; more'
      |              ELSE base END || '</' || tag || '>' AS blk
      |       FROM dr),
      |pg AS (SELECT doc_id, '<script>var x = 1;</script>' ||
      |         string_agg(blk, '' ORDER BY pidx) || 'trailing junk' AS html
      |       FROM bs GROUP BY doc_id),
      |st AS (SELECT doc_id, regexp_replace(regexp_replace(html,
      |         '(?s)<script(?:>|[ ][^>]*>).*?</script>', '', 'g'),
      |         '(?s)<style(?:>|[ ][^>]*>).*?</style>', '', 'g') AS h2
      |       FROM pg),
      |fr AS (SELECT doc_id, string_split_regex(h2,
      |         '</(?:p|div|li|h1|h2|nav|footer|header|aside)>') AS fs
      |       FROM st),
      |fx AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS block_pos, fs[i] AS frag
      |       FROM fr, unnest(generate_series(1, len(fs))) AS u(i)),
      |bt AS (SELECT doc_id, block_pos, frag,
      |         regexp_extract(frag,
      |           '<(p|div|li|h1|h2|nav|footer|header|aside)(?:>|[ ][^>]*>)',
      |           1) AS tag
      |       FROM fx),
      |bc AS (SELECT doc_id, block_pos, tag,
      |         regexp_replace(frag,
      |           '(?s)^.*?<(?:p|div|li|h1|h2|nav|footer|header|aside)(?:>|[ ][^>]*>)',
      |           '') AS content
      |       FROM bt WHERE tag <> ''),
      |lk AS (SELECT doc_id, block_pos, tag, content,
      |         coalesce(list_sum(list_transform(
      |           regexp_extract_all(content,
      |             '(?s)<a(?:>|[ ][^>]*>)([^<]*)</a>', 1),
      |           x -> length(x))), 0) AS link_chars
      |       FROM bc),
      |tx AS (SELECT doc_id, block_pos, tag, link_chars,
      |         trim(regexp_replace(
      |           replace(replace(replace(replace(replace(replace(
      |             regexp_replace(content, '<[^>]*>', ' ', 'g'),
      |             '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
      |             '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&'),
      |           '[ \t\n\r]+', ' ', 'g')) AS text
      |       FROM lk),
      |bl AS (SELECT doc_id, block_pos, tag,
      |         CAST(length(text) AS BIGINT) AS text_chars,
      |         CAST(link_chars AS BIGINT) AS link_chars,
      |         CAST(CASE WHEN text = '' THEN 0
      |              ELSE len(string_split(text, ' ')) END AS BIGINT) AS words,
      |         text
      |       FROM tx),
      |vd AS (SELECT *, CASE WHEN text_chars = 0 THEN 1000000
      |         ELSE least(1000000, link_chars * 1000000 // text_chars) END
      |         AS link_density_millionths
      |       FROM bl),
      |vb AS (SELECT doc_id, block_pos, tag, text_chars, link_chars, words,
      |         link_density_millionths,
      |         CASE WHEN tag IN ('nav', 'footer', 'header', 'aside')
      |                THEN 'chrome'
      |              WHEN text_chars = 0 THEN 'empty'
      |              WHEN link_density_millionths > 200000 THEN 'link_heavy'
      |              WHEN words < 3 THEN 'short'
      |              ELSE 'content' END AS verdict, text
      |       FROM vd)""".stripMargin

  /** Graded F58 query: the page rollup over the manufactured corpus. */
  val qHtmlExtract = Q(
    "q_f58_html_extract",
    s"""WITH $htmlOracleCtes
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks,
      |       CAST(sum(CASE WHEN verdict = 'content' THEN 1 ELSE 0 END)
      |         AS BIGINT) AS n_content,
      |       coalesce(string_agg(CASE WHEN verdict = 'content' THEN text END,
      |         chr(10) ORDER BY block_pos), '') AS clean_text,
      |       CAST(length(coalesce(string_agg(
      |         CASE WHEN verdict = 'content' THEN text END,
      |         chr(10) ORDER BY block_pos), '')) AS BIGINT) AS n_chars
      |FROM vb GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    htmlExtract(syntheticPages(s, d)).orderBy(col("doc_id"))
  }

  /** Graded F58b query: the per-block relation itself — every tag draw,
    * link-density integer, and verdict graded row-by-row. */
  val qHtmlBlocks = Q(
    "q_f58b_html_blocks",
    s"""WITH $htmlOracleCtes
      |SELECT doc_id, block_pos, tag, text_chars, link_chars, words,
      |       link_density_millionths, verdict, text
      |FROM vb ORDER BY doc_id, block_pos""".stripMargin) { (s, d) =>
    htmlBlocks(syntheticPages(s, d)).orderBy(col("doc_id"), col("block_pos"))
  }

  def all: Seq[Q] = Seq(qHtmlExtract, qHtmlBlocks)
}
