package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.HtmlKernels
import graft.operators.TextAnalysis

/** The d54 HTML main-content extraction contract
  * ([[graft.functions.HtmlKernels]]): kernel-level pins for every
  * regex-faithfulness quirk the oracle depends on, plus the
  * DataFrame/codegen path. */
class HtmlExtractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(html: String, minLen: Int = 10, maxLinkPct: Int = 20) = {
    val r = HtmlKernels.extractMain(UTF8String.fromString(html), minLen, maxLinkPct)
    (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
  }

  test("boilerplate page: script/style/comment gone, nav+footer dropped, paragraphs kept") {
    val html = "<html><head><title>t1</title><style>p{x}</style>" +
      "<script>var q = '<p>not a block</p>';</script></head><body>" +
      "<div><a href=\"/\">home</a> <a href=\"/a\">about page</a></div>" +
      "<p>this paragraph carries the actual content of the page</p>" +
      "<!-- hidden <p>comment</p> -->" +
      "<p>and a second paragraph with more real text</p>" +
      "<div>copyright <a href=\"/t\">terms</a></div></body></html>"
    val (main, nBlocks, nKept, textChars, linkChars) = run(html)
    assert(main == "this paragraph carries the actual content of the page\n" +
      "and a second paragraph with more real text")
    // blocks with visible text: title(t1), nav, p1, p2, footer
    assert(nBlocks == 5 && nKept == 2)
    // script/comment content never leaks into any count
    assert(!main.contains("not a block") && textChars ==
      "t1".length + "home about page".length + 53 + 42 +
        "copyright terms".length)
    assert(linkChars == "home".length + "about page".length + "terms".length)
  }

  test("unclosed script stays literal text (failed regex alternative semantics)") {
    val (main, _, _, _, _) =
      run("<p>keep this sentence around</p><script>var x=1; no close")
    // the opener's '<' fails the removal regex; '<script...' is then an
    // ordinary tag stripped by <[^>]*>, its trailing text remains
    assert(main.startsWith("keep this sentence around"))
    assert(main.contains("no close"))
  }

  test("style closer with attributes-ish tail still closes (</style[^>]*>)") {
    val (main, _, _, _, _) =
      run("<p>visible paragraph text here</p><style>a{}</style x>")
    assert(main == "visible paragraph text here")
  }

  test("block-split alternation quirks: <pre> splits via p, <header> does not, <h3> does") {
    // <pre> matches the 'p' alternative + [^>]* — it IS a separator
    val (m1, _, _, _, _) = run("<p>alpha beta gamma delta</p><pre>echo foxtrot golf hotel</pre>")
    assert(m1 == "alpha beta gamma delta\necho foxtrot golf hotel")
    // <header> has no h+digit and no block word prefix ('head' — wait,
    // it DOES start with 'head') — pin the actual contract: 'header'
    // starts with block word 'head', so it splits too
    val (m2, n2, _, _, _) = run("<header>one two three four five</header>")
    assert(m2 == "one two three four five" && n2 == 1)
    // <h3> splits via h[1-6]; <h7> does not (no alternative matches),
    // so it is stripped inline and its text joins the survivor block
    val (m3, n3, _, _, _) = run("<h3>first block body text</h3><h7>second chunk body text</h7>")
    assert(n3 == 2 || m3 == "first block body text\nsecond chunk body text")
    val (m4, n4, _, _, _) = run("juxtaposed <h7>inline tag</h7> stripped quietly")
    assert(n4 == 1 && m4 == "juxtaposed inline tag stripped quietly")
  }

  test("anchor capture: [^<]* content only, advance-by-one recovery, <abbr…</a> quirk") {
    // nested tag inside the anchor -> no capture for the outer <a>
    val (_, _, _, _, lc1) = run("<p><a href=x><b>bold</b></a> plain words fill space</p>")
    assert(lc1 == 0)
    // failed start recovers a later anchor within the same block
    val (_, _, _, _, lc2) = run("<p><a x><a y>inner</a> tail words fill space</p>")
    assert(lc2 == "inner".length)
    // any tag starting '<a' opens a capture if '</a>' follows the
    // first '<' after it — the <abbr> quirk is part of the contract
    val (_, _, _, _, lc3) = run("<p><abbr>abbrv</a> more filler words here</p>")
    assert(lc3 == "abbrv".length)
  }

  test("link-density boundary is integer-exact: alen*100 <= pct*tlen") {
    // tlen=10, alen=2 -> 200 <= 200: keep
    val keep = run("<p>abcdefgh<a href=x>qr</a></p>", minLen = 10, maxLinkPct = 20)
    assert(keep._3 == 1 && keep._1 == "abcdefghqr")
    // tlen=10, alen=3 -> 300 > 200: drop
    val drop = run("<p>abcdefg<a href=x>qrs</a></p>", minLen = 10, maxLinkPct = 20)
    assert(drop._3 == 0 && drop._1 == "")
    // minLen boundary: tlen=9 drops, tlen=10 keeps
    assert(run("<p>abcdefghi</p>")._3 == 0)
    assert(run("<p>abcdefghij</p>")._3 == 1)
  }

  test("whitespace collapses to single spaces; kept blocks join with newline in order") {
    val (main, nb, nk, tc, _) =
      run("<p>  spaced   out\t\ttokens\nhere  </p><p>second block of text</p>")
    assert(main == "spaced out tokens here\nsecond block of text")
    assert(nb == 2 && nk == 2 && tc == main.length - 1)
  }

  test("no kept blocks -> empty main_text, counts still reported") {
    val (main, nb, nk, tc, lc) = run("<p>tiny</p><div><a href=x>allofit</a></div>")
    assert(main == "" && nb == 2 && nk == 0 && tc == "tiny".length + "allofit".length
      && lc == "allofit".length)
  }

  test("DataFrame path: codegen'd projection, null html dropped, plan is scan-only") {
    // spark.range base (not a LocalRelation, which constant-folds the
    // whole projection at plan time) so the executed plan proves the
    // kernel runs inside a WholeStageCodegen span
    val df = TextAnalysis.extractMainHtml(
      spark.range(2).select(col("id").as("doc_id"),
        when(col("id") === 0,
          lit("<p>a real paragraph of content</p><div><a href=/>x y z q r</a></div>"))
          .otherwise(lit(null).cast("string")).as("html")),
      "doc_id", "html")
    val rows = df.collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("main_text") == "a real paragraph of content")
    assert(r.getAs[Int]("n_blocks") == 2 && r.getAs[Int]("n_kept") == 1)
    assert(r.getAs[Int]("link_chars") == "x y z q r".length)
    assert(r.getAs[Long]("doc_id") == 0L)
    // pure scan projection: no exchange, no generate; the "*(1)"
    // prefix on the kernel's Project marks the WholeStageCodegen span
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Generate"), p.take(1500))
    assert(p.linesIterator.exists(l =>
      l.contains("htmlmaincontent(") && l.trim.startsWith("+- *(")), p.take(1500))
  }
}
