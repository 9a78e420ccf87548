"""Parity vectors for the JSON-LD accessor kernels and the two-tier
recipe/job structured extractors, ported from the reference's own test
suites:

- classifier/internal/classifier/jsonld/parser_test.go (Extract,
  FindByType, ParseISO8601Duration, StringVal, StringSliceVal,
  NestedStringVal, FloatVal, IntVal)
- classifier/internal/classifier/recipe_extractor_test.go
- classifier/internal/classifier/job_extractor_test.go
"""

import pytest

from north_cloud_ray.stages import jsonld
from north_cloud_ray.stages.structured import (
    extract_job,
    extract_job_schema_org,
    extract_recipe,
    extract_recipe_schema_org,
)

# ---------------- Extract (parser_test.go) ----------------


def test_extract_finds_recipe_jsonld():
    html = """<html><head>
<script type="application/ld+json">
{
  "@context": "https://schema.org",
  "@type": "Recipe",
  "name": "Chocolate Cake",
  "prepTime": "PT30M",
  "cookTime": "PT1H",
  "recipeYield": "12 servings"
}
</script>
</head><body></body></html>"""
    blocks = jsonld.extract_blocks(html)
    assert len(blocks) == 1
    assert blocks[0]["@type"] == "Recipe"
    assert blocks[0]["name"] == "Chocolate Cake"


def test_extract_handles_array_with_multiple_types():
    html = """<html><head>
<script type="application/ld+json">
[
  {"@context": "https://schema.org", "@type": "BreadcrumbList",
   "itemListElement": []},
  {"@context": "https://schema.org", "@type": "Recipe",
   "name": "Pasta Carbonara"}
]
</script>
</head><body></body></html>"""
    blocks = jsonld.extract_blocks(html)
    assert len(blocks) == 2
    recipe = jsonld.find_by_type(blocks, "Recipe")
    assert recipe is not None
    assert recipe["name"] == "Pasta Carbonara"
    assert jsonld.find_by_type(blocks, "BreadcrumbList") is not None


def test_extract_ignores_non_jsonld_scripts():
    html = """<html><head>
<script type="text/javascript">var x = 1;</script>
<script type="application/ld+json">
{"@type": "Recipe", "name": "Soup"}
</script>
<script>console.log("hi")</script>
</head><body></body></html>"""
    blocks = jsonld.extract_blocks(html)
    assert len(blocks) == 1
    assert blocks[0]["@type"] == "Recipe"


def test_extract_handles_empty_html():
    assert jsonld.extract_blocks("") == []


def test_extract_skips_malformed_blocks():
    html = """<script type="application/ld+json">{ this is not valid JSON
</script>"""
    assert jsonld.extract_blocks(html) == []


# ---------------- FindByType ----------------


def test_find_by_type_returns_first_match():
    blocks = [
        {"@type": "BreadcrumbList", "name": "nav"},
        {"@type": "Recipe", "name": "First Recipe"},
        {"@type": "Recipe", "name": "Second Recipe"},
    ]
    result = jsonld.find_by_type(blocks, "Recipe")
    assert result is not None
    assert result["name"] == "First Recipe"


def test_find_by_type_returns_none_when_not_found():
    blocks = [{"@type": "BreadcrumbList"}, {"@type": "Organization"}]
    assert jsonld.find_by_type(blocks, "JobPosting") is None


def test_find_by_type_handles_empty_blocks():
    assert jsonld.find_by_type(None, "Recipe") is None
    assert jsonld.find_by_type([], "Recipe") is None


def test_find_by_type_handles_missing_type_field():
    blocks = [{"name": "No type here"}, {"@type": "Recipe", "name": "Found"}]
    result = jsonld.find_by_type(blocks, "Recipe")
    assert result is not None
    assert result["name"] == "Found"


# ---------------- ParseISO8601Duration ----------------


@pytest.mark.parametrize("s,want", [
    ("PT30M", 30), ("PT1H", 60), ("PT1H30M", 90),
    ("PT45M", 45), ("PT2H15M", 135),
])
def test_parse_iso8601_duration_valid(s, want):
    assert jsonld.parse_iso8601_duration(s) == want


@pytest.mark.parametrize("s", [
    "", "30M", "about 30 minutes", "PT", "P30M",
])
def test_parse_iso8601_duration_invalid(s):
    assert jsonld.parse_iso8601_duration(s) is None


# ---------------- StringVal / StringSliceVal / NestedStringVal ----------------


def test_string_val():
    assert jsonld.string_val({"name": "Test"}, "name") == "Test"
    assert jsonld.string_val({"name": "Test"}, "missing") == ""
    assert jsonld.string_val({"count": 42}, "count") == ""
    assert jsonld.string_val(None, "key") == ""


def test_string_slice_val_handles_string_slice():
    m = {"tags": ["cooking", "baking", "desserts"]}
    assert jsonld.string_slice_val(m, "tags") == [
        "cooking", "baking", "desserts"]


def test_string_slice_val_handles_single_string():
    assert jsonld.string_slice_val(
        {"recipeCategory": "Dessert"}, "recipeCategory") == ["Dessert"]


def test_string_slice_val_returns_none_for_missing_key():
    assert jsonld.string_slice_val({"name": "Test"}, "missing") is None


def test_string_slice_val_skips_non_string_elements():
    m = {"mixed": ["valid", 42, "also valid"]}
    assert jsonld.string_slice_val(m, "mixed") == ["valid", "also valid"]


def test_nested_string_val():
    m = {"hiringOrganization": {"name": "Acme Corp"}}
    assert jsonld.nested_string_val(m, "hiringOrganization", "name") == "Acme Corp"
    assert jsonld.nested_string_val({"name": "T"}, "missing", "name") == ""
    assert jsonld.nested_string_val(
        {"hiringOrganization": {"type": "Organization"}},
        "hiringOrganization", "name") == ""
    assert jsonld.nested_string_val(
        {"hiringOrganization": "just a string"},
        "hiringOrganization", "name") == ""


# ---------------- FloatVal / IntVal ----------------


def test_float_val():
    assert jsonld.float_val({"rating": 4.5}, "rating") == pytest.approx(4.5)
    assert jsonld.float_val({"rating": "4.5"}, "rating") == pytest.approx(4.5)
    assert jsonld.float_val({"name": "T"}, "rating") is None
    assert jsonld.float_val({"rating": "not a number"}, "rating") is None


def test_int_val():
    assert jsonld.int_val({"count": 42.0}, "count") == 42
    assert jsonld.int_val({"count": "42"}, "count") == 42
    assert jsonld.int_val({"name": "T"}, "count") is None
    assert jsonld.int_val({"count": "not a number"}, "count") is None
    # strconv.Atoi rejects "4.5"
    assert jsonld.int_val({"count": "4.5"}, "count") is None


# ---------------- Recipe extractor (recipe_extractor_test.go) ----------------


RECIPE_FULL_HTML = """<html><head>
<script type="application/ld+json">
{
  "@context": "https://schema.org",
  "@type": "Recipe",
  "name": "Chocolate Cake",
  "recipeIngredient": ["2 cups flour", "1 cup sugar", "3 eggs"],
  "recipeInstructions": "Mix flour and sugar. Add eggs. Bake at 350F for 30 minutes.",
  "prepTime": "PT15M",
  "cookTime": "PT30M",
  "totalTime": "PT45M",
  "recipeYield": "8 servings",
  "recipeCategory": "Dessert",
  "recipeCuisine": "American",
  "nutrition": {"calories": "350 kcal"},
  "image": "https://example.com/cake.jpg",
  "aggregateRating": {"ratingValue": 4.5, "ratingCount": 120}
}
</script>
</head><body></body></html>"""


def test_recipe_schema_org_full_fields():
    r = extract_recipe_schema_org(RECIPE_FULL_HTML)
    assert r is not None
    assert r["extraction_method"] == "schema_org"
    assert r["name"] == "Chocolate Cake"
    assert r["ingredients"] == ["2 cups flour", "1 cup sugar", "3 eggs"]
    assert r["instructions"] == (
        "Mix flour and sugar. Add eggs. Bake at 350F for 30 minutes.")
    assert r["prep_time_minutes"] == 15
    assert r["cook_time_minutes"] == 30
    assert r["total_time_minutes"] == 45
    assert r["servings"] == "8 servings"
    assert r["category"] == "Dessert"
    assert r["cuisine"] == "American"
    assert r["calories"] == "350 kcal"
    assert r["image_url"] == "https://example.com/cake.jpg"
    assert r["rating"] == pytest.approx(4.5)
    assert r["rating_count"] == 120


def test_recipe_heuristic_fallback():
    text = """Grandma's Famous Soup

This is the best soup you'll ever have.

Ingredients:
- 2 cups chicken broth
- 1 cup diced carrots
- 1 cup celery
- Salt and pepper to taste

Instructions:
Bring broth to a boil. Add carrots and celery. Simmer for 20 minutes. Season with salt and pepper."""
    r = extract_recipe("Grandma's Famous Soup", text,
                       html="<html><body><p>No JSON-LD here</p></body></html>")
    assert r is not None
    assert r["extraction_method"] == "heuristic"
    assert r["ingredients"] == [
        "2 cups chicken broth", "1 cup diced carrots", "1 cup celery",
        "Salt and pepper to taste"]
    assert "Bring broth to a boil" in r["instructions"]


def test_recipe_howto_step_instructions():
    html = """<html><head>
<script type="application/ld+json">
{
  "@type": "Recipe",
  "name": "Steps Recipe",
  "recipeInstructions": [
    {"@type": "HowToStep", "text": "Preheat the oven."},
    {"@type": "HowToStep", "text": "Mix the batter."},
    {"@type": "HowToStep", "text": "Bake until golden."}
  ]
}
</script>
</head><body></body></html>"""
    r = extract_recipe_schema_org(html)
    assert r is not None
    assert r["instructions"] == (
        "Preheat the oven. Mix the batter. Bake until golden.")


def test_recipe_image_as_object():
    html = """<html><head>
<script type="application/ld+json">
{"@type": "Recipe", "name": "Pic Recipe",
 "image": {"@type": "ImageObject", "url": "https://example.com/pic.jpg"}}
</script>
</head><body></body></html>"""
    r = extract_recipe_schema_org(html)
    assert r is not None
    assert r["image_url"] == "https://example.com/pic.jpg"


def test_recipe_string_array_instructions():
    html = """<html><head>
<script type="application/ld+json">
{
  "@context": "https://schema.org",
  "@type": "Recipe",
  "name": "Quick Omelette",
  "recipeIngredient": ["3 eggs", "1 tbsp butter"],
  "recipeInstructions": ["Beat the eggs.", "Melt butter in pan.", "Pour eggs and cook."]
}
</script>
</head><body></body></html>"""
    r = extract_recipe_schema_org(html)
    assert r is not None
    assert r["extraction_method"] == "schema_org"
    for step in ("Beat the eggs.", "Melt butter in pan.", "Pour eggs and cook."):
        assert step in r["instructions"]


def test_recipe_malformed_schema_org_falls_to_heuristic():
    html = """<html><head>
<script type="application/ld+json">
{ this is not valid JSON
</script>
</head><body></body></html>"""
    text = """Bad Schema Recipe

Ingredients:
- 1 cup rice
- 2 cups water

Directions:
Boil water. Add rice. Cook for 20 minutes."""
    r = extract_recipe("Bad Schema Recipe", text, html=html)
    assert r is not None
    assert r["extraction_method"] == "heuristic"
    assert r["ingredients"][0] == "1 cup rice"
    assert len(r["ingredients"]) == 2
    assert "Boil water" in r["instructions"]


def test_recipe_heuristic_various_prefixes():
    text = """A recipe with numbered items.

Ingredients:
1. 2 cups flour
2. 1 cup milk
* 3 eggs
• 1 tsp vanilla

Method:
Combine dry ingredients. Add wet ingredients. Mix well."""
    r = extract_recipe("Numbered Ingredients Recipe", text)
    assert r is not None
    assert r["extraction_method"] == "heuristic"
    assert r["ingredients"] == [
        "2 cups flour", "1 cup milk", "3 eggs", "1 tsp vanilla"]
    assert "Combine dry ingredients" in r["instructions"]


def test_recipe_schema_org_without_aggregate_rating():
    html = """<html><head>
<script type="application/ld+json">
{"@context":"https://schema.org","@type":"Recipe","name":"Simple Salad","recipeIngredient":["lettuce","tomato"]}
</script>
</head><body></body></html>"""
    r = extract_recipe_schema_org(html)
    assert r is not None
    assert r["rating"] is None
    assert r["rating_count"] is None
    assert r["name"] == "Simple Salad"


# ---------------- Job extractor (job_extractor_test.go) ----------------


JOB_FULL_HTML = """<html><head>
<script type="application/ld+json">
{
  "@context": "https://schema.org",
  "@type": "JobPosting",
  "title": "Senior Go Developer",
  "hiringOrganization": {"@type": "Organization", "name": "Acme Corp"},
  "jobLocation": {
    "@type": "Place",
    "address": {
      "@type": "PostalAddress",
      "addressLocality": "Toronto",
      "addressRegion": "ON"
    }
  },
  "baseSalary": {
    "@type": "MonetaryAmount",
    "currency": "CAD",
    "value": {
      "@type": "QuantitativeValue",
      "minValue": 120000,
      "maxValue": 160000
    }
  },
  "employmentType": "FULL_TIME",
  "datePosted": "2026-02-01",
  "validThrough": "2026-03-01",
  "description": "We are looking for a senior Go developer.",
  "industry": "Technology",
  "qualifications": "5+ years Go experience",
  "jobBenefits": "Health insurance, remote work"
}
</script>
</head><body></body></html>"""


def test_job_schema_org_full_fields():
    j = extract_job_schema_org(JOB_FULL_HTML)
    assert j is not None
    assert j["extraction_method"] == "schema_org"
    assert j["title"] == "Senior Go Developer"
    assert j["company"] == "Acme Corp"
    assert j["location"] == "Toronto, ON"
    assert j["salary_min"] == pytest.approx(120000.0)
    assert j["salary_max"] == pytest.approx(160000.0)
    assert j["salary_currency"] == "CAD"
    assert j["employment_type"] == "full_time"
    assert j["posted_date"] == "2026-02-01"
    assert j["expires_date"] == "2026-03-01"
    assert j["description"] == "We are looking for a senior Go developer."
    assert j["industry"] == "Technology"
    assert j["qualifications"] == "5+ years Go experience"
    assert j["benefits"] == "Health insurance, remote work"


def test_job_heuristic_fallback():
    text = """Software Engineer Position

Company: TechStartup Inc
Location: Vancouver, BC

We are hiring a software engineer to join our team.

Requirements:
Must have 3 years experience with Python.
Must have experience with AWS.

Qualifications:
BSc in Computer Science or equivalent.
Strong communication skills."""
    j = extract_job("Software Engineer Position", text,
                    html="<html><body><p>No JSON-LD here</p></body></html>")
    assert j is not None
    assert j["extraction_method"] == "heuristic"
    assert j["company"] == "TechStartup Inc"
    assert j["location"] == "Vancouver, BC"
    assert "Must have 3 years experience with Python" in j["qualifications"]


@pytest.mark.parametrize("raw,want", [
    ("FULL_TIME", "full_time"), ("PART_TIME", "part_time"),
    ("CONTRACT", "contract"), ("TEMPORARY", "temporary"),
    ("INTERN", "internship"), ("INTERNSHIP", "internship"),
    ("full_time", "full_time"), ("VOLUNTEER", "volunteer"),
])
def test_job_employment_type_normalization(raw, want):
    html = f"""<html><head>
<script type="application/ld+json">
{{"@context": "https://schema.org", "@type": "JobPosting",
  "title": "Test Job", "employmentType": "{raw}"}}
</script>
</head><body></body></html>"""
    j = extract_job_schema_org(html)
    assert j is not None
    assert j["employment_type"] == want


def test_job_schema_org_location_city_only():
    html = """<html><head>
<script type="application/ld+json">
{"@type": "JobPosting", "title": "Data Analyst",
 "jobLocation": {"@type": "Place",
   "address": {"@type": "PostalAddress", "addressLocality": "Montreal"}}}
</script>
</head><body></body></html>"""
    j = extract_job_schema_org(html)
    assert j is not None
    assert j["location"] == "Montreal"


def test_job_heuristic_returns_none_when_nothing_found():
    assert extract_job(
        "Random Content",
        "Just some random text with no job patterns at all.",
        html="<html><body><p>No structured data</p></body></html>") is None


def test_job_schema_org_location_and_salary_edge_cases():
    no_loc = """<html><head><script type="application/ld+json">
{"@context":"https://schema.org","@type":"JobPosting","title":"Developer","hiringOrganization":{"name":"Acme"}}
</script></head><body></body></html>"""
    j = extract_job_schema_org(no_loc)
    assert j is not None
    assert j["location"] == ""

    no_salary = """<html><head><script type="application/ld+json">
{"@context":"https://schema.org","@type":"JobPosting","title":"Volunteer","hiringOrganization":{"name":"NGO"}}
</script></head><body></body></html>"""
    j2 = extract_job_schema_org(no_salary)
    assert j2 is not None
    assert j2["salary_min"] is None
    assert j2["salary_max"] is None


# ---------------- fixture-corpus wiring ----------------


def test_fixture_corpus_schema_org_extraction():
    from north_cloud_ray.sources.html_fixtures import JSONLD_JOB, JSONLD_RECIPE

    r = extract_recipe("ignored", "", html=JSONLD_RECIPE)
    assert r is not None
    assert r["extraction_method"] == "schema_org"
    assert r["name"] == "Maple Oat Cookies"
    assert len(r["ingredients"]) == 3
    assert r["total_time_minutes"] == 27
    assert r["rating"] == pytest.approx(4.6)
    assert r["rating_count"] == 87

    j = extract_job("ignored", "", html=JSONLD_JOB)
    assert j is not None
    assert j["extraction_method"] == "schema_org"
    assert j["company"] == "North Mining Co"
    assert j["location"] == "Sudbury, ON"
    assert j["employment_type"] == "full_time"
    assert j["salary_min"] == pytest.approx(62000.0)
