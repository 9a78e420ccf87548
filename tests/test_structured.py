"""Unit tests for 12-type detection, structured extractors, gazetteer
location scoring and sidecar routing (M8 / sidecar domains / gazetteer)."""

import json

import pandas as pd

from north_cloud_ray.stages.structured import (
    StructuredExtractStage,
    classify_location,
    classify_subtype_from_text,
    detect_content_type,
    detect_content_type_from_url,
    extract_job,
    extract_need_signal,
    extract_recipe,
    extract_rfp,
    resolve_sidecars,
)


def test_url_pattern_detection_first_match_wins():
    assert detect_content_type_from_url("https://x.test/press/launch") == "press_release"
    assert detect_content_type_from_url("https://x.test/events/fair") == "event"
    assert detect_content_type_from_url("https://x.test/alerts/storm") == "advisory"
    assert detect_content_type_from_url("https://x.test/blotter/weekly") == "blotter"
    assert detect_content_type_from_url("https://x.test/investors/q3") == "company_announcement"
    assert detect_content_type_from_url("https://x.test/obits/jane") == "obituary"
    assert detect_content_type_from_url("https://x.test/recipes/pie") == "recipe"
    assert detect_content_type_from_url("https://x.test/careers/dev") == "job"
    assert detect_content_type_from_url("https://x.test/tenders/roads") == "rfp"
    assert detect_content_type_from_url("https://x.test/files/annual.pdf") == "report"
    assert detect_content_type_from_url("https://x.test/entry/12") == ""


def test_detection_priority_jsonld_over_url_over_og():
    assert detect_content_type("https://x.test/recipes/pie",
                               jsonld_type="NewsArticle") == "article"
    assert detect_content_type("https://x.test/recipes/pie", og_type="article") == "recipe"
    assert detect_content_type("https://x.test/entry/1", og_type="Article") == "article"
    assert detect_content_type("https://x.test/entry/1") == ""
    assert detect_content_type("https://x.test/e", jsonld_type="SpecialAnnouncement") == "advisory"


def test_keyword_heuristics():
    sub, conf, method = classify_subtype_from_text(
        "Best Pie", "Ingredients: flour\nMix 2 cups sugar and bake at 350.")
    assert (sub, conf, method) == ("recipe", 0.80, "keyword_heuristic")
    sub, _, _ = classify_subtype_from_text(
        "Dev wanted", "Apply now. Salary is competitive. Send a resume.")
    assert sub == "job"
    sub, _, _ = classify_subtype_from_text(
        "RFP 2024-01", "Request for proposal. Submission deadline is June 1.")
    assert sub == "rfp"
    sub, _, _ = classify_subtype_from_text(
        "Grant news", "The town receives funding for a website redesign.")
    assert sub == "need_signal"
    sub, _, _ = classify_subtype_from_text("Plain", "Nothing special here.")
    assert sub == ""


def test_recipe_extractor_sections():
    text = ("A lovely tart.\n\nIngredients:\n- 2 cups flour\n* 1 tsp salt\n"
            "3. butter\n\nInstructions:\nMix everything.\nBake it well.\n\n"
            "Prep time: 15 minutes\nServings: 8")
    r = extract_recipe("Tart", text)
    assert r["ingredients"] == ["2 cups flour", "1 tsp salt", "butter"]
    assert r["instructions"] == "Mix everything.\nBake it well."
    assert r["prep_time_minutes"] == 15
    assert r["servings"] == "8"
    assert extract_recipe("T", "no recipe sections at all") is None


def test_job_extractor():
    text = ("Apply now for this role. Salary $60,000 - $80,000 per year.\n"
            "Company: Acme Widgets\nLocation: Sudbury, ON\n"
            "This is a full-time position. Send your resume.")
    j = extract_job("Developer", text)
    assert j["salary_min"] == 60000.0 and j["salary_max"] == 80000.0
    assert j["employment_type"] == "full_time"
    assert j["company"] == "Acme Widgets"
    assert j["location"] == "Sudbury, ON"


def test_rfp_extractor():
    text = ("Request for proposal for road work. Procurement rules apply.\n"
            "Reference No: RFP-2024-17\nClosing date: 2024-07-01\n"
            "Budget: $100,000 to $250,000")
    r = extract_rfp("Road RFP", text, url="https://city.test/rfp/roads")
    assert r["reference_number"] == "RFP-2024-17"
    assert r["closing_date"] == "2024-07-01"
    assert r["budget_min"] == 100000.0 and r["budget_max"] == 250000.0
    assert r["document_type"] == ""
    rfi = extract_rfp("RFI", "Request for information: procurement scan. "
                             "Submission deadline soon.", "")
    assert rfi["document_type"] == "rfi"


def test_need_signal_extractor():
    text = ("The library announces a website redesign project moving off "
            "Drupal 7. Contact webmaster@library.test for details.")
    s = extract_need_signal("Greenfield Library - News", text,
                            "https://library.test/news")
    assert s["signal_type"] == "outdated_website"
    assert s["organization_name"] == "Greenfield Library"
    assert s["contact_email"] == "webmaster@library.test"
    assert "website redesign" in s["keywords"]


def test_location_dominance_and_specificity():
    # city dominates via headline weight
    r = classify_location("Sudbury council votes",
                          "The Sudbury decision affects northern residents.")
    assert r["city"] == "sudbury" and r["province"] == "ON"
    assert r["specificity"] == "city" and r["confidence"] >= 0.6
    # competing locations inside the 30% margin -> ambiguous
    r2 = classify_location("", "Toronto and Vancouver both made bids.")
    assert r2["specificity"] == "unknown" and r2["confidence"] == 0.5
    # province-only mention
    r3 = classify_location("Ontario budget", "The Ontario plan was tabled.")
    assert r3["province"] == "ON" and r3["specificity"] == "province"
    # no mentions
    r4 = classify_location("Nothing", "No places are named here.")
    assert r4 == {"city": "", "province": "", "country": "unknown",
                  "specificity": "unknown", "confidence": 0.0}


def test_routing_table_fallbacks():
    assert resolve_sidecars("article", "recipe") == ("recipe",)
    assert "crime" in resolve_sidecars("article", "")
    # unknown subtype falls back to the article route (all sidecars)
    assert "crime" in resolve_sidecars("article", "blotter")
    assert resolve_sidecars("listing") == ()
    assert resolve_sidecars("unknown_type") == ()


def test_structured_stage_batch(ray_session):
    import ray

    df = pd.DataFrame({
        "doc_id": ["a", "b", "c"],
        "url": ["https://x.test/recipes/pie", "https://x.test/careers/dev",
                "https://x.test/entry/9"],
        "title": ["Pie", "Developer - Acme", "Sudbury story"],
        "body": ["Ingredients:\n- 2 cups flour\n\nInstructions:\nBake.",
                 "Apply now, salary $50,000 - $60,000, send resume.",
                 "Sudbury news about the city of Sudbury."],
        "content_type": ["article", "article", "article"],
    })
    out = (ray.data.from_pandas(df)
           .map_batches(StructuredExtractStage(), batch_format="pandas")
           .to_pandas())
    by_id = {r["doc_id"]: r for _, r in out.iterrows()}
    assert by_id["a"]["content_subtype"] == "recipe"
    assert json.loads(by_id["a"]["recipe"])["ingredients"] == ["2 cups flour"]
    assert by_id["b"]["content_subtype"] == "job"
    assert json.loads(by_id["b"]["job"])["salary_min"] == 50000.0
    assert by_id["c"]["content_subtype"] == ""
    assert json.loads(by_id["c"]["location"])["city"] == "sudbury"


def test_cloudflare_challenge_detector():
    from north_cloud_ray.stages.fetch_parse import is_cloudflare_challenge

    assert is_cloudflare_challenge(
        {"Cf-Ray": "abc123", "Cf-Mitigated": "challenge"}, "")
    assert is_cloudflare_challenge(
        {"Server": "cloudflare"}, "<html>Just a moment...</html>")
    assert is_cloudflare_challenge(
        {"Cf-Ray": "abc"}, "Checking your browser before accessing")
    assert not is_cloudflare_challenge({}, "Just a moment...")  # no CF header
    assert not is_cloudflare_challenge({"Cf-Ray": "abc"}, "normal page")
    assert not is_cloudflare_challenge(None, None)


def test_url_truncation_guard():
    from north_cloud_ray.stages.classify import (
        MAX_URL_LENGTH,
        validate_url,
        validate_url_column,
    )

    long = "https://h.test/" + "a" * 3000
    assert len(validate_url(long)) == MAX_URL_LENGTH
    assert validate_url("https://h.test/ok") == "https://h.test/ok"
    s = pd.Series([long, "https://h.test/ok"])
    out = validate_url_column(s)
    assert out.str.len().max() == MAX_URL_LENGTH
    assert out[1] == "https://h.test/ok"


def test_count_by_origin_since(ray_session, tmp_path):
    from north_cloud_ray.config import CrawlConfig, SyntheticWebConfig
    from north_cloud_ray.pipelines.crawl import CrawlRunner

    runner = CrawlRunner(
        str(tmp_path / "out"),
        CrawlConfig(num_shards=2, fetch_concurrency=2, fetch_batch_size=64),
        SyntheticWebConfig(n_hosts=4),
    )
    runner.run(max_rounds=2)
    n_manual = runner.count_by_origin_since("manual", 0)
    n_spider = runner.count_by_origin_since("spider", 0)
    assert n_manual == 4  # one seed per host
    assert n_spider > 0
    fr = runner.frontier_dataset().to_pandas()
    assert n_spider == ((fr["origin"] == "spider") & (fr["discovered_at"] >= 0)).sum()
    assert runner.count_by_origin_since("spider", 10**18) == 0


def test_html_blob_archive(ray_session, tmp_path):
    """S10: with archive_html on, raw 200 bodies land in the blob sink as a
    binary column and round-trip through the blobs dataset."""
    from north_cloud_ray.config import CrawlConfig, SyntheticWebConfig
    from north_cloud_ray.pipelines.crawl import CrawlRunner
    from north_cloud_ray.sources.synthetic_web import SyntheticWeb

    web_cfg = SyntheticWebConfig(n_hosts=4)
    runner = CrawlRunner(
        str(tmp_path / "out"),
        CrawlConfig(num_shards=2, fetch_concurrency=2, fetch_batch_size=64,
                    archive_html=True),
        web_cfg,
    )
    runner.run(max_rounds=2)
    blobs = runner.blobs_dataset().to_pandas()
    assert len(blobs) > 0
    web = SyntheticWeb(web_cfg)
    row = blobs.iloc[0]
    assert isinstance(row["html"], bytes)
    # the archived bytes are exactly the synthetic page body for that URL
    assert row["html"].decode() == web.fetch(row["url"])["body"]


def test_slugify():
    from north_cloud_ray.stages.structured import slugify

    assert slugify("Sault Ste. Marie") == "sault-ste-marie"
    assert slugify("Thunder_Bay") == "thunder-bay"
    assert slugify("  Mixed   CASE  name ") == "mixed-case-name"
    assert slugify("already-a-slug") == "already-a-slug"
    assert slugify("") == ""


def test_cloudflare_counter_flows_to_round_metrics(ray_session, tmp_path):
    """M19 end-to-end: synthetic Cloudflare hosts produce challenges that
    the fetch stage counts and the round metrics surface."""
    from north_cloud_ray.config import CrawlConfig, SyntheticWebConfig
    from north_cloud_ray.pipelines.crawl import CrawlRunner

    runner = CrawlRunner(
        str(tmp_path / "out"),
        CrawlConfig(num_shards=2, fetch_concurrency=2, fetch_batch_size=64),
        SyntheticWebConfig(n_hosts=6, frac_cloudflare=0.9),
    )
    runner.run(max_rounds=2)
    total = 0
    for rnd in range(2):
        try:
            m = runner.store.read_metrics(rnd)
        except FileNotFoundError:
            continue
        total += m.get("counters", {}).get("cloudflare_challenges", 0)
    assert total > 0


def test_icp_matcher_semantics():
    """icp/matcher.go scoring: required_any gate, keyword fraction *1.5
    cap .85, topic fraction *0.5 cap .30, +0.10 at >=3 keyword hits,
    half-up 2dp rounding, min_score filter, (score desc, name asc) order."""
    from north_cloud_ray.stages.structured import ICP_SEGMENTS, match_icp

    # no required_any term present -> indigenous_channel gated out
    r = match_icp("Sawmill expansion", "the sudbury sawmill adds a shift "
                  "with forestry and mining jobs", topics=["mining"])
    assert r is not None
    names = [m["segment"] for m in r["segments"]]
    assert names == ["northern_ontario_industry"]
    m = r["segments"][0]
    # 4 keyword hits (sudbury, mining, sawmill, forestry... plus 'mine' in
    # 'mining') -> verify against the formula rather than a hard count
    seg = next(s for s in ICP_SEGMENTS if s["name"] == m["segment"])
    kw_hits = [k for k in seg["keywords"]
               if k in "sawmill expansion the sudbury sawmill adds a shift "
                       "with forestry and mining jobs"]
    import math
    ks = min(len(kw_hits) / len(seg["keywords"]) * 1.5, 0.85)
    ts = min(1 / len(seg["topics"]) * 0.5, 0.30)
    want = min(ks + ts + (0.10 if len(kw_hits) >= 3 else 0), 1.0)
    assert m["score"] == math.floor(want * 100 + 0.5) / 100
    assert m["matched_keywords"] == sorted(kw_hits + ["topic:mining"])

    # topics-only match passes the no-keyword gate via topic hits
    r2 = match_icp("Quarterly results", "canadian company growth and revenue",
                   topics=["business"])
    assert r2 is not None and r2["model_version"] == "v1"
    assert "private_sector_smb" in [m["segment"] for m in r2["segments"]]

    # nothing relevant -> None
    assert match_icp("Weather", "sunny with clouds", topics=[]) is None


def test_structured_stage_emits_icp_column(ray_session):
    import json

    import pandas as pd
    import ray

    from north_cloud_ray.stages.structured import StructuredExtractStage

    docs = pd.DataFrame({
        "doc_id": ["a", "b"],
        "url": ["https://h.test/news/2024/05/mining-story",
                "https://h.test/entry/1"],
        "title": ["Sudbury mining jobs", "Plain"],
        "body": ["the sudbury mine adds nickel jobs", "nothing here"],
        "content_type": ["article", "page"],
        "source_id": ["src-0", "src-1"],
        "topics": ["mining", ""],
    })
    out = ray.data.from_pandas(docs).map_batches(
        StructuredExtractStage, batch_format="pandas", concurrency=1
    ).to_pandas()
    icp_a = json.loads(out.loc[out["doc_id"] == "a", "icp"].iloc[0])
    assert icp_a["segments"][0]["segment"] == "northern_ontario_industry"
    assert json.loads(out.loc[out["doc_id"] == "b", "icp"].iloc[0]) is None


def test_crawl_warc_export_roundtrip(ray_session, tmp_path):
    """The S10 blob archive exports to WARC response members and
    re-reads with every payload byte-identical (sha + count equality vs
    the blob dataset)."""
    import hashlib

    from north_cloud_ray.config import CrawlConfig, SyntheticWebConfig
    from north_cloud_ray.pipelines.crawl import CrawlRunner
    from north_cloud_ray.sources.warc import (read_warc_records,
                                              write_warc_responses)

    runner = CrawlRunner(
        str(tmp_path / "out"),
        CrawlConfig(num_shards=2, fetch_concurrency=2, fetch_batch_size=64,
                    archive_html=True),
        SyntheticWebConfig(n_hosts=4),
    )
    runner.run(max_rounds=2)
    blobs = runner.blobs_dataset().to_pandas()
    out = str(tmp_path / "warc")
    manifest = write_warc_responses(runner.blobs_dataset(), out) \
        .to_pandas()
    assert manifest["n_records"].sum() == len(blobs)
    back = read_warc_records(out).to_pandas()
    assert len(back) == len(blobs)
    assert set(back["warc_type"]) == {"response"}
    want = {(r["url"], hashlib.sha256(r["html"]).hexdigest())
            for _, r in blobs.iterrows()}
    got = {(r["target_uri"], hashlib.sha256(bytes(r["payload"])).hexdigest())
           for _, r in back.iterrows()}
    assert got == want
    # crawl timestamps survive as both WARC-Date and the NC microsecond
    # header
    assert (back["crawled_at_us"].astype("int64") >= 0).all()
    assert back["warc_date"].str.match(r"\d{4}-\d{2}-\d{2}T").all()
