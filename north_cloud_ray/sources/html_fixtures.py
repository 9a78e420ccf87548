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



for _n in ("WORDPRESS", "DRUPAL", "POSTMEDIA", "JSONLD_NEWS", "EXCLUDES",
           "DATE_FALLBACK", "BYLINE", "OG_ARTICLE", "JSONLD_RECIPE",
           "JSONLD_JOB"):
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
}
