"""Deterministic realistic-HTML fixture corpus (golden pages for the
extraction chain): WordPress/Drupal/Postmedia templates, nav-heavy density
pages, JSON-LD variants, readability-only layouts, listing/stub/sign-in
shapes. Mirrors the page shapes exercised by the reference's
rawcontent/extractor_test.go and regression_test.go."""

FILLER = '''<p>Additional filler paragraph supplying the extra narrative words the post extraction gate expects, covering background, reactions, context, timelines, quotes, figures, and the broader implications of the events described above in suitably generous detail for every test case.</p>'''

WORDPRESS = """
<html><head><title>WP Title - Site</title>
<meta name="generator" content="WordPress 6.4"/>
<meta property="og:title" content="A WordPress Story"/>
</head><body>
<header class="site-header"><nav><a href="/a">Home</a><a href="/b">About</a></nav></header>
<article>
  <h1 class="entry-title">A WordPress Story</h1>
  <div class="entry-content">
    <p class="lead">First paragraph of the story with <b>bold</b> text inside.</p>
    <p>Second paragraph, which is long enough to matter for extraction quality checks.</p>{FILLER}
  </div>
</article>
<footer class="site-footer">Copyright</footer>
</body></html>
"""

DRUPAL = """
<html><head><meta name="generator" content="Drupal 10 (https://www.drupal.org)"/>
<title>Drupal Node</title></head><body>
<h1 class="page-title">Council Meeting Notes</h1>
<div class="field--name-body">
  <p>The council met on Tuesday and discussed the new bylaw at length.</p>
  <p>Further consultations are planned for the coming months ahead.</p>{FILLER}
</div>
</body></html>
"""

POSTMEDIA = """
<html><head><title>Herald</title></head><body>
<article class="article-content">
  <h1 class="article-title">Calgary Story Headline</h1>
  <div class="article-content__content-group">
    <p>Paragraph one of the Calgary story, with plenty of words to read.</p>
    <p>Paragraph two continues the reporting in considerable detail here.</p>{FILLER}
  </div>
</article>
</body></html>
"""

NAV_HEAVY = """
<html><head><title>Nav Heavy</title></head><body>
<div class="nav-menu">{links}</div>
<div class="story-wrap">
  <p>{para} {para} {para}</p>
  <p>{para} {para}</p>
</div>
</body></html>
""".format(
    links="".join(f'<a href="/l{i}">Link number {i}</a>' for i in range(30)),
    para="Substantial sentence with many meaningful words to extract properly.",
)

JSONLD_NEWS = """
<html><head><title>Ignored</title>
<script type="application/ld+json">
{"@context":"https://schema.org","@type":"NewsArticle",
 "headline":"JSON-LD Headline","datePublished":"2024-03-01T10:00:00Z",
 "author":{"@type":"Person","name":"Jane Writer"},
 "publisher":{"@type":"Organization","name":"The Paper"},
 "image":{"@type":"ImageObject","url":"https://x.test/img.jpg"},
 "keywords":["city","council"],"wordCount":240}
</script></head><body>
<article><p>Body paragraph that goes on long enough to count as content here.</p>
<p>And another paragraph to push the word count a little bit higher still.</p>{FILLER}</article>
</body></html>
"""

JSONLD_EVENT = """
<html><head>
<script type="application/ld+json">
{"@type":"Event","name":"Fall Fair","startDate":"2024-09-01T09:00:00Z",
 "location":{"@type":"Place","name":"Fairgrounds"},
 "description":"The annual fall fair returns."}
</script></head><body><main>
<p>The fair will feature rides, food, and music for the whole family to enjoy.</p>
</main></body></html>
"""

READABILITY_ONLY = """
<html><head><title>Odd Layout</title></head><body>
<table><tr><td>
<span>
Sentence one of an article hidden in a table layout, with commas, clauses, and length.
</span>
<p>Paragraph inside the cell that carries the real article body, with commas, and more.</p>
<p>Second paragraph inside the cell, also substantial, also containing several clauses.</p>
</td></tr></table>
</body></html>
"""

EXCLUDES = """
<html><head><title>With Junk</title></head><body>
<article>
  <div class="share-tools">Share on socials</div>
  <p>Real content paragraph number one, with enough words for the gate.</p>
  <p>Real content paragraph number two, also carrying plenty of words.</p>{FILLER}
</article>
</body></html>
"""

DATE_FALLBACK = """
<html><head><title>Dated</title></head><body>
<article>
<div class="published-date"><time datetime="2024-05-05T08:00:00Z">May 5</time></div>
<p>Body text that needs to be long enough for the extraction threshold gate.</p>
<p>And one more sentence with a reasonable number of additional words in it.</p>{FILLER}
</article></body></html>
"""

BYLINE = """
<html><head><title>Bylined</title></head><body>
<article>
<div class="byline">By Alex Reporter</div>
<p>Content paragraph that is sufficiently long for the extractor to keep it.</p>
<p>Another content paragraph that adds more detail about the events covered.</p>{FILLER}
</article></body></html>
"""

LISTING = """
<html><head><title>Section Index</title></head><body>
<main>{links}</main>
</body></html>
""".format(links="".join(f'<a href="/s{i}">Story {i}</a> ' for i in range(40)))

STUB = """
<html><head><title>Stubby</title></head><body>
<main><p>Too short to be an article.</p></main></body></html>
"""

SIGNIN = """
<html><head><title>Members</title></head><body>
<main><p>Please sign in to continue reading this members-only article today.</p>
</main></body></html>
"""

OG_ARTICLE = """
<html><head><title>OG</title>
<meta property="og:type" content="article"/>
<meta property="og:title" content="OG Titled Piece"/>
</head><body>
<article><div class="entry-content">
<p>Open-graph marked article body with a full first paragraph of content.</p>
<p>Second paragraph keeps the body comfortably above every length gate.</p>{FILLER}
</div></article>
</body></html>
"""

JSONLD_RECIPE = """
<html><head><title>Maple Oat Cookies | Kitchen Site</title>
<script type="application/ld+json">
[
 {"@context":"https://schema.org","@type":"BreadcrumbList","itemListElement":[]},
 {"@context":"https://schema.org","@type":"Recipe",
  "name":"Maple Oat Cookies",
  "recipeIngredient":["2 cups rolled oats","1 cup flour","1/2 cup maple syrup"],
  "recipeInstructions":[
    {"@type":"HowToStep","text":"Mix the dry ingredients."},
    {"@type":"HowToStep","text":"Fold in the maple syrup."},
    {"@type":"HowToStep","text":"Bake at 350F for 12 minutes."}],
  "prepTime":"PT15M","cookTime":"PT12M","totalTime":"PT27M",
  "recipeYield":"24 cookies","recipeCategory":"Dessert","recipeCuisine":"Canadian",
  "nutrition":{"@type":"NutritionInformation","calories":"110 calories"},
  "image":{"@type":"ImageObject","url":"https://kitchen.test/maple-oat.jpg"},
  "aggregateRating":{"@type":"AggregateRating","ratingValue":4.6,"ratingCount":87}}
]
</script></head><body>
<article><p>These maple oat cookies come together in under half an hour.</p>
<p>They keep well in a tin and freeze beautifully for later batches.</p>{FILLER}</article>
</body></html>
"""

JSONLD_JOB = """
<html><head><title>Heavy Equipment Operator - North Mining Co</title>
<script type="application/ld+json">
{"@context":"https://schema.org","@type":"JobPosting",
 "title":"Heavy Equipment Operator",
 "hiringOrganization":{"@type":"Organization","name":"North Mining Co"},
 "jobLocation":{"@type":"Place","address":{"@type":"PostalAddress",
   "addressLocality":"Sudbury","addressRegion":"ON"}},
 "employmentType":"FULL_TIME",
 "datePosted":"2024-04-02","validThrough":"2024-05-02",
 "description":"Operate haul trucks and loaders at the open pit site.",
 "industry":"Mining","qualifications":"Class DZ licence and two years experience.",
 "jobBenefits":"Extended health and dental.",
 "baseSalary":{"@type":"MonetaryAmount","currency":"CAD",
   "value":{"@type":"QuantitativeValue","minValue":62000,"maxValue":78000}}}
</script></head><body>
<main><p>North Mining Co is hiring operators for its Sudbury operations.</p>
<p>Apply now with your resume and licence details to join the team.</p>{FILLER}</main>
</body></html>
"""



TORSTAR = """
<html><head><title>Star Page Title</title></head><body>
<header><nav><a href="/a">Sections</a><a href="/b">Subscribe</a></nav></header>
<article>
  <h1>Star Investigation Headline</h1>
  <div class="c-article-body__content">
    <p>Opening paragraph of the Star investigation with substantial words.</p>
    <p>Second paragraph developing the investigation in further detail here.</p>{FILLER}
  </div>
</article>
</body></html>
"""

VILLAGE_MEDIA = """
<html><head><title>Village</title></head><body>
<div class="article-detail">
  <h1 class="article-detail__title">Northern Town Headline</h1>
  <div class="article-detail__meta">By Someone | 2 hrs ago</div>
  <div class="article-detail__body">
    <p>Local reporting paragraph one with a healthy number of words inside.</p>
    <p>Local reporting paragraph two continuing the community coverage story.</p>{FILLER}
  </div>
</div>
</body></html>
"""

BLACK_PRESS = """
<html><head><title>Bulletin</title></head><body>
<article>
  <h1>Island Community Headline</h1>
  <div class="article-body-text">
    <p>Coverage paragraph number one of the island community news story.</p>
    <p>Coverage paragraph number two with additional reported specifics.</p>{FILLER}
  </div>
  <div class="related-stories"><a href="/r1">Related one</a></div>
</article>
</body></html>
"""

# generator-less page that only the og:type article + <article> HTML
# detection path can catch (templates.go generic_og_article ordering:
# MUST lose to wordpress/drupal when their generators are present)
GENERIC_OG = """
<html><head><title>Generic</title>
<meta property="og:type" content="article"/>
<meta property="og:title" content="Generic OG Headline"/>
</head><body>
<article>
  <div class="entry-content">
    <p>Generic article body paragraph one with plenty of textual content.</p>
    <p>Generic article body paragraph two to satisfy the extraction gate.</p>{FILLER}
  </div>
</article>
</body></html>
"""

# JSON-LD image ARRAY of mixed string/object entries (extractor_jsonld.go
# image normalization: first usable url wins)
JSONLD_IMAGE_ARRAY = """
<html><head>
<script type="application/ld+json">
{"@type":"NewsArticle","headline":"Array Image Headline",
 "datePublished":"2024-06-02T12:00:00Z",
 "image":[{"@type":"ImageObject","url":"https://x.test/first.jpg"},
          "https://x.test/second.jpg"],
 "author":[{"@type":"Person","name":"First Author"},
           {"@type":"Person","name":"Second Author"}]}
</script></head><body>
<article><p>Body for the array-image page with enough words to extract.</p>
<p>Another body paragraph so the page passes the minimum length checks.</p>{FILLER}</article>
</body></html>
"""

# top-level JSON-LD LIST with a non-articleish object first: dispatch must
# skip the BreadcrumbList and take the BlogPosting
JSONLD_LIST_BLOG = """
<html><head>
<script type="application/ld+json">
[{"@type":"BreadcrumbList","itemListElement":[]},
 {"@type":"BlogPosting","headline":"Blog Post Headline",
  "datePublished":"2024-04-04T09:30:00Z",
  "author":"Solo Blogger","wordCount":180}]
</script></head><body>
<article><p>Blog body paragraph that definitely carries sufficient words.</p>
<p>Second blog paragraph to keep the extraction quality gate satisfied.</p>{FILLER}</article>
</body></html>
"""

# malformed JSON-LD (trailing comma) must not break the chain: title
# falls through to og:title
JSONLD_MALFORMED = """
<html><head><title>Tag Title</title>
<meta property="og:title" content="OG Wins Here"/>
<script type="application/ld+json">
{"@type":"NewsArticle","headline":"Broken",}
</script></head><body>
<article><p>Content paragraph that still extracts when the JSON is broken.</p>
<p>Further prose giving the density extractor something real to work on.</p>{FILLER}</article>
</body></html>
"""

# WordPress generator present but the entry-content body is MISSING:
# resolve_template picks wordpress, extract_raw_text must fall through to
# the density heuristic instead of returning empty
TEMPLATE_BODY_MISSING = """
<html><head><meta name="generator" content="WordPress 6.4"/>
<title>No Entry Content</title></head><body>
<div class="weird-wrap">
  <p>The body lives outside the WordPress selectors in this odd theme.</p>
  <p>It still reads like an article with multiple reasonable sentences.</p>{FILLER}
</div>
</body></html>
"""

# figure/figcaption + aside junk around the body: captions and asides must
# not leak into raw_text
FIGURE_CAPTION = """
<html><head><title>Figures</title></head><body>
<article>
  <figure><img src="/a.jpg"/><figcaption>Caption text to exclude</figcaption></figure>
  <aside class="newsletter-signup">Sign up for our newsletter now</aside>
  <p>The genuine article text surrounding the figure with enough words.</p>
  <p>More genuine article text after the aside block, again substantial.</p>{FILLER}
</article>
</body></html>
"""

# article:published_time meta must WIN over JSON-LD datePublished
# (extractor_test.go DateFallbackChain: meta is step 1, JSON-LD step 2)
META_PUBLISHED_TIME = """
<html><head><title>Meta Dated</title>
<meta property="article:published_time" content="2024-01-15T06:00:00Z"/>
<script type="application/ld+json">
{"@type":"NewsArticle","headline":"Meta Date Headline",
 "datePublished":"2023-12-31T23:00:00Z"}
</script></head><body>
<article><p>The body of the meta-dated page carries enough words to pass.</p>
<p>Another sentence follows so the extraction quality gate is satisfied.</p>{FILLER}</article>
</body></html>
"""

# NO title tag, og:title or JSON-LD: the title chain must fall through to
# the first h1 (extractor_test.go TitleFallbackChain step 4)
H1_TITLE = """
<html><head></head><body>
<h1>The H1 Fallback Headline</h1>
<div class="story">
<p>Body text for the h1-titled page with a comfortable number of words.</p>
<p>A second paragraph keeps the page above the extraction word gates.</p>{FILLER}</div>
</body></html>
"""

# author via <a rel="author"> — the chain step between JSON-LD author and
# the byline CSS selectors (extractor_metadata.go author fallbacks)
REL_AUTHOR = """
<html><head><title>Rel Author Page</title></head><body>
<article>
<p>Story by <a rel="author" href="/staff/pat">Pat Journalist</a> follows.</p>
<p>The article body proceeds with sufficient words for every length gate.</p>{FILLER}
</article></body></html>
"""

# @context OBJECT + mainEntityOfPage object + nameless publisher +
# wordCount int: the raw-blob normalizers all fire on one page
JSONLD_OBJECT_CONTEXT = """
<html><head>
<script type="application/ld+json">
{"@context":{"@vocab":"https://schema.org/"},
 "@type":"Article","headline":"Object Context Headline",
 "datePublished":"2024-08-08T11:00:00Z",
 "mainEntityOfPage":{"@type":"WebPage","@id":"https://obj.test/canon"},
 "publisher":{"@type":"Organization"},
 "author":{"@type":"Person","name":"Objectful Author"},
 "wordCount":215}
</script></head><body>
<article><p>Object-context article body with plenty of descriptive words.</p>
<p>The second paragraph continues and keeps the word counter climbing.</p>{FILLER}</article>
</body></html>
"""

# accented content + HTML entities in title and body: entity decoding must
# survive the chain into raw_text/title byte-identically
FRENCH_ENTITIES = """
<html><head><title>L&#39;actualit&eacute; r&eacute;gionale &amp; plus</title></head><body>
<article>
<p>Le conseil municipal s&#39;est r&eacute;uni mardi pour discuter du r&egrave;glement.</p>
<p>Des consultations suppl&eacute;mentaires sont pr&eacute;vues d&egrave;s l&#39;automne prochain.</p>{FILLER}
</article></body></html>
"""

# two SEPARATE ld+json script tags: the first (BreadcrumbList) must be
# skipped, the second (NewsArticle) extracted — dispatch iterates scripts,
# not just list elements within one script
TWO_SCRIPTS = """
<html><head>
<script type="application/ld+json">
{"@type":"BreadcrumbList","itemListElement":[]}
</script>
<script type="application/ld+json">
{"@type":"NewsArticle","headline":"Second Script Headline",
 "datePublished":"2024-02-02T10:00:00Z","author":"Script Author"}
</script></head><body>
<article><p>Two-script page body paragraph with the usual healthy length.</p>
<p>One more paragraph of body text to clear the minimum word threshold.</p>{FILLER}</article>
</body></html>
"""

# PressRelease articleish variant + publisher object + keywords
JSONLD_PRESS_RELEASE = """
<html><head>
<script type="application/ld+json">
{"@type":"PressRelease","headline":"Press Release Headline",
 "datePublished":"2024-07-07T08:00:00Z",
 "publisher":{"@type":"Organization","name":"Agency Corp"},
 "keywords":["mining","permit"]}
</script></head><body>
<article><p>Press release body paragraph one announcing the development.</p>
<p>Press release body paragraph two with the obligatory further details.</p>{FILLER}</article>
</body></html>
"""


# ---- round-5 additions: real-page quirk families from the reference's
# regression corpus (rawcontent/regression_test.go + extractor_test.go):
# CDATA-wrapped JSON-LD, malformed encodings/entities, mixed-template
# pages, density-extractor edge shapes, legacy markup recovery ----

# JSON-LD wrapped in an HTML-comment CDATA shim (a common CMS emission):
# encoding/json (and json.loads) reject the wrapper, so the JSON-LD tier
# yields NOTHING and extraction falls back to og/meta — same as the
# reference, which passes the raw script text to json.Unmarshal
JSONLD_CDATA = """
<html><head><title>CDATA Page</title>
<meta property="og:title" content="OG CDATA Headline"/>
<script type="application/ld+json">//<![CDATA[
{"@context":"https://schema.org","@type":"NewsArticle","headline":"Hidden"}
//]]></script></head><body>
<article><p>Body text that extraction still finds when the script is CDATA wrapped.</p>
<p>Second sentence giving the heuristic a realistic amount of material.</p>{FILLER}</article>
</body></html>
"""

# nested CDATA markers inside an XML-style comment block — still skipped,
# og/meta still win, and the parser must not swallow the article body
JSONLD_NESTED_CDATA = """
<html><head><title>Nested CDATA</title>
<meta property="og:title" content="OG Nested Headline"/>
<script type="application/ld+json"><!--//--><![CDATA[//><!--
{"@context":"https://schema.org","@type":"NewsArticle","headline":"Nested Hidden"}
//--><!]]></script></head><body>
<article><p>Article prose that survives the nested comment and CDATA markers.</p>
<p>A further paragraph keeps the page comfortably above the word gates.</p>{FILLER}</article>
</body></html>
"""

# BOTH a WordPress generator meta and Drupal body classes on one page
# (migrated sites do this): registry ORDER decides — wordpress is checked
# first, so its template must win and its entry-content body extract
MIXED_TEMPLATE = """
<html><head><meta name="generator" content="WordPress 6.4"/>
<title>Migrated Site</title></head><body>
<h1 class="entry-title">Migrated Story Headline</h1>
<div class="entry-content">
  <p>The WordPress body block carries the real article text here, with a
  couple of added sentences so the template extraction clears the post
  extraction word gate comfortably on its own merits.</p>{FILLER}
</div>
<div class="field--name-body"><p>Stale Drupal residue block.</p></div>
</body></html>
"""

# malformed numeric character references and stray ampersands: the parser
# must recover, keep the surrounding words, and never crash
MALFORMED_ENTITIES = """
<html><head><title>Entity Soup</title></head><body>
<article>
<p>Smart quote &#x2019; raw replacement &#65533; stray ampersand & and unterminated &#x27 mid sentence.</p>
<p>Another sentence M&M's &amp; friends with enough additional words to pass the gate.</p>{FILLER}
</article>
</body></html>
"""

# windows-1252 charset declared with typographic punctuation as numeric
# entities (0x92-range), the malformed-encoding family of real pages
DECLARED_CP1252 = """
<html><head><meta http-equiv="Content-Type" content="text/html; charset=windows-1252"/>
<title>Legacy Charset</title></head><body>
<article>
<p>The city&#146;s council &#150; after a long debate &#150; approved the plan.</p>
<p>Residents&#146; reactions ranged from relief to concern across town.</p>{FILLER}
</article>
</body></html>
"""

# density extractor must SKIP sidebar-classed containers even when they
# are word-heavy (ExtractByTextDensity sidebar rule)
DENSITY_SIDEBAR = """
<html><head><title>Sidebar Trap</title></head><body>
<div class="sidebar"><p>Sidebar promotional prose repeated at length to look dense and tempt the extractor away from the genuine body content entirely.</p></div>
<div class="main-content">
<p>The genuine main article body with its own substantial wording here,
expanded by a sentence or two so the density extractor wins outright.</p>{FILLER}
</div>
</body></html>
"""

# nothing reaches the density minimum: readability fallback gets its
# chance and the page types as a stub/other shape
DENSITY_TOO_SHORT = """
<html><head><title>Thin Page</title></head><body>
<div><p>Short text.</p></div>
</body></html>
"""

# HTML comments inside the article body must not leak into raw_text
COMMENTS_IN_BODY = """
<html><head><title>Commented</title></head><body>
<article>
<p>Visible sentence before the comment block with plenty of words.</p>
<!-- INVISIBLE editorial note that must never appear in the text -->
<p>Visible sentence after the comment continues the article nicely.</p>{FILLER}
</article>
</body></html>
"""

# duplicate og:title tags — the FIRST must win (goquery First semantics)
DUPLICATE_OG = """
<html><head><title>Dupe OG</title>
<meta property="og:title" content="First OG Title"/>
<meta property="og:title" content="Second OG Title"/>
</head><body>
<article><p>Body content for the duplicated open graph metadata page.</p>
<p>Second paragraph with the usual quantity of supporting words.</p>{FILLER}</article>
</body></html>
"""

# <br>-separated prose with no <p> tags (legacy article markup)
BR_PARAGRAPHS = """
<html><head><title>BR Article</title></head><body>
<div class="article-body">
First block of sentence text separated by line breaks rather than paragraphs.<br/><br/>
Second block continues the narrative with realistic sentence lengths and vocabulary.<br/><br/>
Third block covering background, reactions, context, timelines, quotes, figures, and the broader implications of the events described above in suitably generous detail for this legacy page, with several more words appended here.
</div>
</body></html>
"""

# table-cell layout (very old CMS): text lives in <td> cells
TABLE_LAYOUT = """
<html><head><title>Table Era</title></head><body>
<table><tr><td class="content">
<p>Article text living inside a table cell as nineties sites once did.</p>
<p>The extractor should still harvest these words without complaint.</p>{FILLER}
</td></tr></table>
</body></html>
"""

# inline <script> and <style> INSIDE the article container are excluded
SCRIPT_STYLE_IN_BODY = """
<html><head><title>Inline Junk</title></head><body>
<article>
<p>Opening sentence of the real article content with ample wording.</p>
<script>var tracker = "must not leak into the extracted text";</script>
<style>.x { color: red }</style>
<p>Closing sentence of the real article content, equally substantial.</p>{FILLER}
</article>
</body></html>
"""

# uppercase tag and attribute names: parsing is case-insensitive
UPPERCASE_TAGS = """
<HTML><HEAD><TITLE>Shouted Markup</TITLE>
<META NAME="generator" CONTENT="WordPress 6.4"/></HEAD><BODY>
<H1 CLASS="entry-title">Shouted Headline</H1>
<DIV CLASS="entry-content">
<P>Uppercase markup from an ancient editor still extracts correctly, and
these extra words keep the page above every extraction length gate.</P>{FILLER}
</DIV>
</BODY></HTML>
"""

# unquoted attribute values (malformed but common): recovery required
UNQUOTED_ATTRS = """
<html><head><title>Unquoted</title></head><body>
<div class=article-body id=main>
<p>Paragraph inside a container whose attributes have no quote marks.</p>
<p>A second paragraph to satisfy all of the usual word-count gates.</p>{FILLER}
</div>
</body></html>
"""

# mis-nested tags (unclosed div, stray closes): parser recovery keeps text
MISNESTED_TAGS = """
<html><head><title>Misnested</title></head><body>
<div class="story-body">
<p>First paragraph before the markup goes wrong in this document.
<p>Second paragraph — note the unclosed paragraph tags throughout.</div></b>
<p>Trailing paragraph after a stray close tag still belongs to the page.</p>{FILLER}
</body></html>
"""

# og:type video with an article-length body: generic_og_article must NOT
# match (it requires og:type=article) — heuristic path, page type from
# content signals
OG_TYPE_VIDEO = """
<html><head><title>Video Page</title>
<meta property="og:type" content="video.other"/>
<meta property="og:title" content="Video OG Title"/>
</head><body>
<article><p>Transcript-like prose accompanying the embedded video player.</p>
<p>The description continues with enough sentences to look article-like.</p>{FILLER}</article>
</body></html>
"""

for _n in ("WORDPRESS", "DRUPAL", "POSTMEDIA", "JSONLD_NEWS", "EXCLUDES",
           "DATE_FALLBACK", "BYLINE", "OG_ARTICLE", "JSONLD_RECIPE",
           "JSONLD_JOB", "TORSTAR", "VILLAGE_MEDIA", "BLACK_PRESS",
           "GENERIC_OG", "JSONLD_IMAGE_ARRAY", "JSONLD_LIST_BLOG",
           "JSONLD_MALFORMED", "TEMPLATE_BODY_MISSING", "FIGURE_CAPTION",
           "JSONLD_PRESS_RELEASE", "META_PUBLISHED_TIME", "H1_TITLE",
           "REL_AUTHOR", "JSONLD_OBJECT_CONTEXT", "FRENCH_ENTITIES",
           "TWO_SCRIPTS", "JSONLD_CDATA", "JSONLD_NESTED_CDATA",
           "MIXED_TEMPLATE", "MALFORMED_ENTITIES", "DECLARED_CP1252",
           "DENSITY_SIDEBAR", "COMMENTS_IN_BODY", "DUPLICATE_OG",
           "TABLE_LAYOUT", "SCRIPT_STYLE_IN_BODY", "UPPERCASE_TAGS",
           "UNQUOTED_ATTRS", "MISNESTED_TAGS", "OG_TYPE_VIDEO"):
    globals()[_n] = globals()[_n].replace("{FILLER}", FILLER)

FIXTURES = {
    "wordpress": WORDPRESS,
    "drupal": DRUPAL,
    "postmedia": POSTMEDIA,
    "nav_heavy": NAV_HEAVY,
    "jsonld_news": JSONLD_NEWS,
    "jsonld_event": JSONLD_EVENT,
    "readability_only": READABILITY_ONLY,
    "excludes": EXCLUDES,
    "date_fallback": DATE_FALLBACK,
    "byline": BYLINE,
    "listing": LISTING,
    "stub": STUB,
    "signin": SIGNIN,
    "og_article": OG_ARTICLE,
    "jsonld_recipe": JSONLD_RECIPE,
    "jsonld_job": JSONLD_JOB,
    "torstar": TORSTAR,
    "village_media": VILLAGE_MEDIA,
    "black_press": BLACK_PRESS,
    "generic_og": GENERIC_OG,
    "jsonld_image_array": JSONLD_IMAGE_ARRAY,
    "jsonld_list_blog": JSONLD_LIST_BLOG,
    "jsonld_malformed": JSONLD_MALFORMED,
    "template_body_missing": TEMPLATE_BODY_MISSING,
    "figure_caption": FIGURE_CAPTION,
    "jsonld_press_release": JSONLD_PRESS_RELEASE,
    "meta_published_time": META_PUBLISHED_TIME,
    "h1_title": H1_TITLE,
    "rel_author": REL_AUTHOR,
    "jsonld_object_context": JSONLD_OBJECT_CONTEXT,
    "french_entities": FRENCH_ENTITIES,
    "two_scripts": TWO_SCRIPTS,
    "jsonld_cdata": JSONLD_CDATA,
    "jsonld_nested_cdata": JSONLD_NESTED_CDATA,
    "mixed_template": MIXED_TEMPLATE,
    "malformed_entities": MALFORMED_ENTITIES,
    "declared_cp1252": DECLARED_CP1252,
    "density_sidebar": DENSITY_SIDEBAR,
    "density_too_short": DENSITY_TOO_SHORT,
    "comments_in_body": COMMENTS_IN_BODY,
    "duplicate_og": DUPLICATE_OG,
    "br_paragraphs": BR_PARAGRAPHS,
    "table_layout": TABLE_LAYOUT,
    "script_style_in_body": SCRIPT_STYLE_IN_BODY,
    "uppercase_tags": UPPERCASE_TAGS,
    "unquoted_attrs": UNQUOTED_ATTRS,
    "misnested_tags": MISNESTED_TAGS,
    "og_type_video": OG_TYPE_VIDEO,
}
