"""Benchmark harness.

Plain run: executes the headline pipeline (synthetic-web crawl generation
loop -> parse -> classify) plus a representative query set over
$GRAFT_SF_DIR (default /root/testdata/sf0.1), then prints ONE JSON line:
    {"metric": ..., "value": <headline seconds>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N,
     "pages_per_sec": ..., "frontier_ops_per_sec": ...}

--scaling: runs the identical steady-state crawl workload (one politeness
window over a sitemap-seeded 382k-page frontier) in fresh processes at
RAY_GRAFT_CPUS=8 and 32 (N and 4N), two interleaved runs per level (best
kept), and reports both throughputs plus the scaling efficiency
(BASELINE.md protocol).

--scaling-nodes: the multi-NODE variant — one isolated 8-core Ray node
over the full input vs FOUR isolated 8-core Ray nodes (own scheduler /
object store / store dir, disjoint taskset cores) concurrently crawling
their host_hash %% 4 partitions, barrier-synced. Closer to a real 4x-node
cluster than one 32-slot process; see scaling_nodes().
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# headline crawl size — identical at every num_cpus level. text_scale makes
# pages article-sized (~1600 words) so the fetch+parse stage is
# compute-dominated like a real crawl; the volume is sized so per-round
# fixed costs (pipeline setup, claim/merge barriers) are amortized.
BENCH_HOSTS = 6000
BENCH_PAGES_PER_HOST = 64
BENCH_ROUNDS = 3
BENCH_TEXT_SCALE = 8
BENCH_WINDOW_US = 480 * 1_000_000


def _quiet_data_context():
    import logging

    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    # Ray's sort/shuffle all-to-all operators emit EMPTY blocks with no
    # schema for key-range gaps (their own workaround notes this:
    # ray/data/_internal/planner/plan_udf_map_op.py "TODO(hchen): ... some
    # all-to-all operators output empty blocks with no schema"), which
    # trips the executor's schema-divergence warning. Every UDF here emits
    # typed (possibly empty) batches — the remaining warnings are that
    # known-benign Ray-internal artifact, so filter exactly that message.
    class _EmptySchemaFilter(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            msg = record.getMessage()
            return not (
                "produced a RefBundle with a different schema" in msg
                and ("new schema: ." in msg or "names=[], types=[]" in msg)
            )

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_EmptySchemaFilter())


def run_headline(num_cpus: int) -> dict:
    import ray

    from north_cloud_ray.config import CrawlConfig, SyntheticWebConfig
    from north_cloud_ray.pipelines.crawl import CrawlRunner
    from north_cloud_ray.stages.classify import classify_documents

    _quiet_data_context()
    out = tempfile.mkdtemp(prefix="ncray-bench-")
    web_cfg = SyntheticWebConfig(
        n_hosts=BENCH_HOSTS, base_pages_per_host=BENCH_PAGES_PER_HOST,
        mega_host_factor=12, text_scale=BENCH_TEXT_SCALE,
    )
    cfg = CrawlConfig(
        num_shards=min(16, max(4, num_cpus // 2)),
        fetch_concurrency=max(2, num_cpus - 2),
        fetch_batch_size=512,
        round_window_us=BENCH_WINDOW_US,
        state_keep_last=2,  # retention GC live in the headline crawl
    )
    runner = CrawlRunner(out, cfg, web_cfg)

    t0 = time.perf_counter()
    summary = runner.run(max_rounds=BENCH_ROUNDS)
    t_crawl = time.perf_counter() - t0

    t1 = time.perf_counter()
    docs_ds = runner.documents_dataset(override_num_blocks=4 * num_cpus)
    t_dedup = time.perf_counter() - t1  # eager first-writer-wins prep
    classified = classify_documents(docs_ds, batch_size=1024)
    n_docs = classified.count()
    t_classify = time.perf_counter() - t1

    # frontier ops = claims + status updates (=claims) + accepted submits
    new_urls = 0
    frontier_size = 0
    for mf in glob.glob(os.path.join(out, "rounds", "*", "metrics.json")):
        with open(mf) as f:
            m = json.load(f)
        for s in m["shards"]:
            new_urls += s.get("new_urls", 0)
            frontier_size = max(frontier_size, s.get("frontier_size", 0))
    ops = summary["claims"] * 2 + new_urls
    shutil.rmtree(out, ignore_errors=True)
    return {
        "claims": summary["claims"],
        "rounds": summary["rounds"],
        "docs": n_docs,
        "new_urls": new_urls,
        "sec_crawl": round(t_crawl, 3),
        "sec_classify": round(t_classify, 3),
        "sec_doc_dedup": round(t_dedup, 3),
        "sec_total": round(t_crawl + t_classify, 3),
        "pages_per_sec": round(summary["claims"] / t_crawl, 1),
        "frontier_ops_per_sec": round(ops / t_crawl, 1),
        "docs_per_sec": round(n_docs / max(t_classify, 1e-9), 1),
    }


SCALING_HOSTS = 6000
SCALING_PAGES = 64
SCALING_TEXT_SCALE = 8


def run_scaling_workload(num_cpus: int, node_k: int | None = None,
                         node_count: int | None = None,
                         barrier_dir: str | None = None) -> dict:
    """Steady-state pages/sec: ONE big politeness window over a
    sitemap-style pre-seeded frontier (every page pending at t=0), so the
    measurement is the sustained claim->fetch->parse->merge rate rather
    than many small-round barriers (BASELINE.md protocol: 'fetched+parsed
    docs per wall-clock second, steady state'). max_depth=0 keeps the
    workload identical at both levels (no discovery feedback).

    ``node_k``/``node_count``: node-parallel mode — this process acts as
    node k of a node_count-node cluster and seeds/crawls ONLY the hosts
    with (host_hash64 >> 32) % node_count == k. The node level uses the
    HIGH hash bits deliberately: shards use the low bits (hh %
    num_shards), and nesting two moduli over the same bits would strand
    each node's hosts in num_shards/node_count shards — 3/4 of the fetch
    blocks empty, half the cores idle (measured: 2.6x per-page slowdown).
    Two-level partitioning on a real cluster has the same constraint:
    node and shard keys must come from independent bits.
    ``barrier_dir`` synchronizes the measured window across nodes: each
    node drops a ready file after seeding and waits for all peers, so
    every node's run_round overlaps the others' (full cross-node
    contention is measured, not a stagger artifact)."""
    import hashlib

    import pandas as pd
    import numpy as np
    import ray  # noqa: F401

    from north_cloud_ray.config import CrawlConfig, SyntheticWebConfig
    from north_cloud_ray.frontier.normalize import host_hash64
    from north_cloud_ray.pipelines.crawl import (
        CrawlRunner,
        _frontier_to_table,
        HOST_STATE_RUNTIME_SCHEMA,
    )
    from north_cloud_ray.sources.synthetic_web import SyntheticWeb
    from north_cloud_ray.state.cuckoo import CuckooFilter

    _quiet_data_context()
    # GRAFT_STORE_DIR: optional tmpfs override (e.g. /dev/shm) for the
    # crawl store, isolating disk bandwidth from the scaling measurement
    out = tempfile.mkdtemp(prefix="ncray-scale-",
                           dir=os.environ.get("GRAFT_STORE_DIR") or None)
    web_cfg = SyntheticWebConfig(
        n_hosts=SCALING_HOSTS, base_pages_per_host=SCALING_PAGES,
        mega_host_factor=12, text_scale=SCALING_TEXT_SCALE,
    )
    cfg = CrawlConfig(
        # shards must be IDENTICAL at every parallelism level (same
        # workload); 32 keeps the claim/merge waves full-width at the
        # high level (16 left half the 32-CPU level idle during them)
        num_shards=int(os.environ.get("NCRAY_BENCH_SHARDS", "32")),
        fetch_concurrency=max(2, num_cpus - 2),
        fetch_batch_size=512,
        round_window_us=3600 * 1_000_000,
        max_depth=0,
    )
    runner = CrawlRunner(out, cfg, web_cfg)
    web = SyntheticWeb(web_cfg)

    # fast seeding: every page URL directly (sitemap-equivalent), skipping
    # per-URL normalization (generator URLs are canonical by construction)
    rows = []
    for i in range(web_cfg.n_hosts):
        host = web.host_name(i)
        hh = host_hash64(host)
        if node_count is not None and (hh >> 32) % node_count != node_k:
            continue
        for j in range(web.page_count(host)):
            u = web.url_for(host, j)
            rows.append(
                (u, hashlib.sha256(u.encode()).hexdigest(), host, hh,
                 f"src-{i % 4}", "sitemap", None, 0, 6, 0, 0)
            )
    df = pd.DataFrame(
        rows, columns=["url", "url_hash", "host", "host_hash", "source_id",
                       "origin", "parent_url", "depth", "priority",
                       "next_fetch_at", "discovered_at"],
    )
    df["status"] = "pending"
    df["last_fetched_at"] = np.int64(0)
    df["fetch_count"] = np.int32(0)
    df["content_hash"] = None
    df["etag"] = None
    df["last_modified"] = None
    df["retry_count"] = np.int8(0)
    df["last_error"] = None
    df["shard"] = (df["host_hash"].to_numpy() % cfg.num_shards).astype(np.int32)
    for s in range(cfg.num_shards):
        part = df[df["shard"] == s]
        runner.store.write_table(_frontier_to_table(part),
                                 runner.store.frontier_path(0, s))
        runner.store.write_table(HOST_STATE_RUNTIME_SCHEMA.empty_table(),
                                 runner.store.host_state_path(0, s))
        filt = CuckooFilter(capacity=2 * len(part) + 1024)
        filt.add_many(list(part["url_hash"]))
        runner.store.write_bytes(filt.to_bytes(), runner.store.cuckoo_path(0, s))
    runner.store.commit_state(0)

    # warm the Ray worker pool BEFORE the barrier/timer: worker process
    # forks + numpy/pandas/pyarrow imports otherwise land inside the
    # measured window (and in node-parallel mode all nodes fork their
    # pools simultaneously — an import storm the steady-state metric
    # should not charge to the pipeline)
    def _warm(b):
        import pandas  # noqa: F401
        import pyarrow  # noqa: F401

        import north_cloud_ray.stages.fetch_parse  # noqa: F401
        return b

    ray.data.range(num_cpus * 2, override_num_blocks=num_cpus * 2) \
        .map_batches(_warm, batch_format="pandas").count()

    if barrier_dir is not None:
        with open(os.path.join(barrier_dir, f"ready-{node_k}"), "w") as f:
            f.write("1")
        deadline = time.time() + 600
        while len(glob.glob(os.path.join(barrier_dir, "ready-*"))) \
                < (node_count or 1):
            if time.time() > deadline:
                raise TimeoutError("node barrier timed out")
            time.sleep(0.05)

    t0 = time.perf_counter()
    m = runner.run_round(0)
    dt = time.perf_counter() - t0
    ops = m["claims"] * 2
    shutil.rmtree(out, ignore_errors=True)
    return {
        "claims": m["claims"],
        "sec": round(dt, 3),
        "pages_per_sec": round(m["claims"] / dt, 1),
        "frontier_ops_per_sec": round(ops / dt, 1),
        "phase_timings": m.get("timings"),
    }


def run_queries(sf_dir: str) -> dict:
    # the drained wrapper waits (bounded) for the previous query's actor
    # pool to release its CPUs — see __ray_entry__._drained
    from __ray_entry__ import queries as _queries
    QUERIES = _queries()

    _quiet_data_context()
    names = [
        "q1_pricing_summary", "q3_top_orders", "region_revenue",
        "frontier_submit_merge", "events_tumbling_window", "events_sessionize",
        "doc_token_stats", "exact_dedup_docs", "minhash_dedup_docs",
        "knn_bruteforce", "simhash_docs", "orders_lineitem_join",
        "events_sliding_window", "f1_span_stats", "embedding_near_dup",
        "embedding_dup_pairs", "html_extraction", "location_scores",
        "ngram_jaccard_docs", "doc_repetition_stats", "dup_span_docs",
        "events_asof_join", "events_range_join", "knn_lsh",
        "doc_stratified_sample", "events_heavy_users",
        "lineitem_price_quantiles", "doc_decontaminate",
        "doc_pack_windows", "doc_unigram_lm", "training_export",
        "semdedup_docs", "pii_redacted_docs", "incremental_dedup_docs",
        "source_quality_rollup", "doc_vocabulary", "doc_quality_filter",
        "crawl_snapshot_diff", "f1_reassemble_docs", "corpus_two_gen",
        "best_doc_per_group", "corpus_report", "doc_normalized", "doc_graph_indegree", "doc_vocab_coverage", "jsonl_roundtrip_docs", "csv_roundtrip_docs", "f1_pack_windows",
        "line_dedup_docs", "warc_roundtrip_docs", "bpe_merges",
        "f1_media_dedup", "f1_caption_pairs", "f1_redact_spans",
        "f1_truncate_docs", "doc_tfidf_terms", "embedding_pca",
        "events_distinct_users_hll", "lang_word_quantiles",
        "feather_roundtrip_docs", "doc_collocations", "doc_chunk_windows",
        "embedding_quantize_int8", "doc_graph_components",
        "f1_render_text", "media_features_dedup_join",
        "doc_dsir_weights", "doc_bm25_topk", "events_running_totals",
        "doc_inverted_postings", "doc_weighted_sample",
        "doc_phrase_search", "embedding_kmeans", "doc_bigram_stats",
        "events_rollup", "events_user_gaps", "doc_rank_ntile",
        "lang_token_char_corr", "customer_order_totals",
        "events_props_stats", "events_funnel",
        "events_cohort_retention", "user_type_pivot",
        "lineitem_price_histogram", "user_event_signature",
        "doc_graph_triangles", "events_cube",
        "events_running_totals_salted", "events_since_purchase",
        "doc_tile_mixture", "lineitem_bloom_semijoin",
        "events_daily_top_users", "doc_split_assignment",
        "events_daily_deltas", "f1_media_budget_take",
        "user_value_trend", "event_value_mad",
        "doc_fuzzy_title_pairs", "events_rolling_sum",
        "lineitem_price_quantiles_kll", "events_type_distinct_hll",
        "events_cohort_overlap_kmv", "lineitem_flag_price_quantiles_kll",
        "doc_compacted_roundtrip", "doc_erasure_roundtrip",
        "events_pruned_read", "doc_evolved_read", "events_zorder_pruned",
        "events_late_data", "events_hour_moments", "events_user_streaks",
        "events_type_gini", "source_vocab_jaccard", "events_daily_autocorr",
        "parts_no_bulk_orders", "events_user_gap_median",
        "events_trailing_24h_sum", "events_top_sequences",
        "content_type_detection_docs", "content_type_cascade_docs",
        "crime_rules_docs", "indigenous_rules_docs",
        "quality_scores_docs", "sidecar_scores_docs",
        "jsonld_structured_extraction", "mining_drill_docs",
        "publisher_domain_routing",
    ]
    import ray.data

    # warm the hash-shuffle join path once: the first Dataset.join of a
    # session spins up HashShuffleAggregator actors (~6 s at 32 CPUs) —
    # session bring-up, not pipeline cost, same rationale as the worker
    # warm-up in run_scaling_workload
    a = ray.data.range(64).map_batches(
        lambda b: b.rename(columns={"id": "k"}), batch_format="pandas")
    b = ray.data.range(64).map_batches(
        lambda b: b.rename(columns={"id": "k"}), batch_format="pandas")
    a.join(b, join_type="inner", on=("k",), num_partitions=4).count()

    out = {}
    for name in names:
        t0 = time.perf_counter()
        res = QUERIES[name](sf_dir)
        if isinstance(res, ray.data.Dataset):
            n = res.count()  # force full execution
        else:
            n = len(res)
        assert n >= 0
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def main() -> None:
    import ray

    init_kwargs = {}
    if os.environ.get("GRAFT_OBJ_STORE_BYTES"):
        init_kwargs["object_store_memory"] = \
            int(os.environ["GRAFT_OBJ_STORE_BYTES"])
    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        **init_kwargs,
    )
    try:
        if os.environ.get("GRAFT_SCALING_WORKLOAD"):
            node_k = os.environ.get("GRAFT_NODE_K")
            kw = {}
            if node_k is not None:
                kw = {"node_k": int(node_k),
                      "node_count": int(os.environ["GRAFT_NODE_COUNT"]),
                      "barrier_dir": os.environ.get("GRAFT_BARRIER_DIR")}
            print(json.dumps({"metric": "steady-state crawl pages/sec",
                              "unit": "pages/sec", "num_cpus": NUM_CPUS,
                              **run_scaling_workload(NUM_CPUS, **kw)}))
            return
        head = run_headline(NUM_CPUS)
        qtimes = (
            {} if os.environ.get("GRAFT_HEADLINE_ONLY") else run_queries(SF_DIR)
        )
        # host-health context: this VM's deliverable CPU fluctuates ~3x
        # on a minute scale (BASELINE.md); stamping the pure-CPU probe
        # into every bench record makes absolute wall times comparable
        # across runs (healthy-host reference: ~39k @8 / ~84k @32)
        try:
            probe = {"cpu_probe_ops_8": round(_cpu_probe(8))}
            if NUM_CPUS != 8:  # key would collide (and re-run the probe)
                probe[f"cpu_probe_ops_{NUM_CPUS}"] = \
                    round(_cpu_probe(NUM_CPUS))
        except Exception:
            probe = {}
        result = {
            "metric": "crawl+classify headline seconds (synthetic web, "
            f"{BENCH_HOSTS} hosts, {BENCH_ROUNDS} rounds) + query wall times",
            "value": head["sec_total"],
            "unit": "sec",
            "queries": qtimes,
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            **head,
            **probe,
        }
        print(json.dumps(result))
    finally:
        ray.shutdown()


def _cpu_probe_worker(n: int) -> int:
    """Pure-CPU kernel (sha256 + split, no numpy/BLAS) for the hardware
    ceiling probe — what the host actually delivers for N processes."""
    import hashlib

    s = "word " * 1600
    acc = 0
    for i in range(n):
        h = hashlib.sha256((s + str(i)).encode()).hexdigest()
        acc += len((s + h).split())
    return acc


def _cpu_probe(procs: int, per: int = 200, pin: bool = True) -> float:
    """Aggregate ops/sec of `procs` worker processes, taskset-pinned to
    cores 0..procs-1 when possible. Run CONCURRENTLY with the protocol so
    the reported pipeline efficiency can be read against the hardware
    ceiling the host delivered at that moment (see BASELINE.md: the
    hypervisor CPU quota fluctuates and often caps 4x cores at ~2x
    aggregate compute)."""
    code = ("import multiprocessing as mp, time, sys; "
            "from bench import _cpu_probe_worker as w; "
            "p=int(sys.argv[1]); per=int(sys.argv[2]); "
            "t0=time.perf_counter(); "
            "pool=mp.Pool(p); pool.map(w, [per]*p); pool.close(); "
            "print(p*per/(time.perf_counter()-t0))")
    cmd = [sys.executable, "-c", code, str(procs), str(per)]
    if pin and shutil.which("taskset") and (os.cpu_count() or 0) >= procs:
        cmd = ["taskset", "-c", f"0-{procs - 1}"] + cmd
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         check=True).stdout
    return float(out.strip().splitlines()[-1])


def scaling() -> None:
    lo_cpus, hi_cpus = 8, 32
    # pin ALL levels or NONE: pinning only the low level (or only the
    # high one) would mix protocols and bias the efficiency ratio — the
    # decision is made once against the HIGHEST level's CPU need
    can_pin = bool(shutil.which("taskset")) and (os.cpu_count() or 0) >= hi_cpus

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_SCALING_WORKLOAD="1")
        # taskset pins the level to ncpu cores: ray.init(num_cpus=N)
        # only caps task slots, so on an idle host the low level would
        # borrow extra cores through Arrow/numpy thread pools and BLAS —
        # inflating the baseline and understating true hardware scaling
        # (an N-core cluster node has no spare cores to borrow).
        cmd = [sys.executable, os.path.abspath(__file__)]
        if can_pin:
            # (logical IDs 0..N-1; on SMT hosts these may be sibling
            # threads, not N physical cores — this box is 1 thread/core)
            cmd = ["taskset", "-c", f"0-{ncpu - 1}"] + cmd
        out = subprocess.run(
            cmd, env=env, capture_output=True, text=True, check=True,
        ).stdout
        time.sleep(10)  # let the previous Ray session fully tear down
        return json.loads(out.strip().splitlines()[-1])

    run(lo_cpus)  # warm page cache (untimed for comparison purposes)
    # VM noise on this sandbox is ±20% run-to-run: interleave two runs per
    # level and keep the best of each (same treatment for both levels)
    lo1, hi1 = run(lo_cpus), run(hi_cpus)
    lo2, hi2 = run(lo_cpus), run(hi_cpus)
    lo = max(lo1, lo2, key=lambda r: r["pages_per_sec"])
    hi = max(hi1, hi2, key=lambda r: r["pages_per_sec"])
    thr_lo, thr_hi = lo["pages_per_sec"], hi["pages_per_sec"]
    eff = (thr_hi / thr_lo) / (hi_cpus / lo_cpus)
    # concurrent hardware-ceiling probe: interleaved pinned pure-CPU runs
    # at both levels, best-of-2 (same treatment as the pipeline levels)
    try:
        p_lo1, p_hi1 = _cpu_probe(lo_cpus, pin=can_pin), _cpu_probe(hi_cpus, pin=can_pin)
        p_lo2, p_hi2 = _cpu_probe(lo_cpus, pin=can_pin), _cpu_probe(hi_cpus, pin=can_pin)
        p_lo, p_hi = max(p_lo1, p_lo2), max(p_hi1, p_hi2)
        probe_eff = round((p_hi / p_lo) / (hi_cpus / lo_cpus), 3)
    except Exception:
        p_lo = p_hi = probe_eff = None
    print(json.dumps({
        "sec_8": lo["sec"], "sec_32": hi["sec"],
        "pages_per_sec_8": thr_lo, "pages_per_sec_32": thr_hi,
        "frontier_ops_per_sec_8": lo["frontier_ops_per_sec"],
        "frontier_ops_per_sec_32": hi["frontier_ops_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "cpu_probe_ops_8": p_lo, "cpu_probe_ops_32": p_hi,
        "cpu_probe_efficiency": probe_eff,
    }))


def scaling_nodes(nodes: int = 4, cores_per_node: int = 8) -> None:
    """Multi-NODE scaling evidence: N = one isolated 8-core Ray 'node'
    over the full input vs 4N = four isolated 8-core Ray nodes (own
    scheduler, own object store, own store dir, disjoint taskset core
    sets) each crawling its host_hash %% 4 partition of the SAME input
    concurrently (barrier-synced measured windows). This simulates a
    real 4x-node cluster more faithfully than one 32-slot process: the
    single-process 8->32 protocol shares one scheduler, one object store
    and one GIL-bound driver across all 32 slots, none of which a real
    cluster shares. Only the memory bus and hypervisor CPU quota remain
    shared here (unavoidable on one box; BASELINE.md documents both).
    The crawl partitions exactly by host hash — the same shard math the
    engine uses — and max_depth=0 means zero cross-node traffic, which
    matches the reference rule's fixed-seed-list steady state."""
    total = nodes * cores_per_node
    if not shutil.which("taskset") or (os.cpu_count() or 0) < total:
        print(json.dumps({"error": "needs taskset and >= %d cores" % total}))
        return
    obj_bytes = str(8 * 1024 ** 3)  # same store size at BOTH levels; sized so no level spills

    def run_single() -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(cores_per_node),
                   GRAFT_SCALING_WORKLOAD="1",
                   GRAFT_OBJ_STORE_BYTES=obj_bytes)
        cmd = ["taskset", "-c", f"0-{cores_per_node - 1}",
               sys.executable, os.path.abspath(__file__)]
        out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             check=True).stdout
        time.sleep(8)
        return json.loads(out.strip().splitlines()[-1])

    def run_nodes() -> dict:
        barrier = tempfile.mkdtemp(prefix="ncray-barrier-")
        procs = []
        for k in range(nodes):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(cores_per_node),
                       GRAFT_SCALING_WORKLOAD="1",
                       GRAFT_OBJ_STORE_BYTES=obj_bytes,
                       GRAFT_NODE_K=str(k), GRAFT_NODE_COUNT=str(nodes),
                       GRAFT_BARRIER_DIR=barrier)
            lo, hi = k * cores_per_node, (k + 1) * cores_per_node - 1
            cmd = ["taskset", "-c", f"{lo}-{hi}",
                   sys.executable, os.path.abspath(__file__)]
            procs.append(subprocess.Popen(
                cmd, env=env, stdout=subprocess.PIPE,
                stderr=subprocess.PIPE, text=True))
        results = []
        for p in procs:
            out, err = p.communicate(timeout=1200)
            if p.returncode != 0:
                raise RuntimeError(f"node worker failed: {err[-2000:]}")
            results.append(json.loads(out.strip().splitlines()[-1]))
        shutil.rmtree(barrier, ignore_errors=True)
        time.sleep(8)
        claims = sum(r["claims"] for r in results)
        wall = max(r["sec"] for r in results)  # barrier-synced start
        return {"claims": claims, "sec": wall,
                "pages_per_sec": round(claims / wall, 1),
                "per_node": [{"claims": r["claims"], "sec": r["sec"],
                              "pages_per_sec": r["pages_per_sec"]}
                             for r in results]}

    # hardware yardstick: the host's OWN N->4N compute scaling (pure-CPU
    # probe at both widths) — a window's pipeline efficiency is only
    # interpretable against what the hypervisor quota actually delivered
    # (measured window 14: pipeline 0.637 vs hardware 0.644, ~99% of
    # deliverable scaling). The probe pair runs ADJACENT to each of the
    # two measured rounds (before s1/n1 and before s2/n2) with the same
    # best-of-2 treatment as the pipeline itself — one probe minutes
    # before both rounds would sample a different quota regime on this
    # minute-scale-throttled host. (Truly concurrent probing would
    # steal the pinned cores from the barrier-synced window, so
    # adjacent-interleaved is the faithful option here.)
    def probe_pair():
        try:
            pn = _cpu_probe(cores_per_node)
            p4 = _cpu_probe(nodes * cores_per_node)
            return pn, p4
        except Exception:
            return None, None

    # interleaved best-of-2 per level (same ±20% VM-noise treatment as
    # the single-process protocol)
    hw1 = probe_pair()
    s1, n1 = run_single(), run_nodes()
    hw2 = probe_pair()
    s2, n2 = run_single(), run_nodes()
    pairs = [p for p in (hw1, hw2) if p[0] is not None]
    if pairs:
        pn = max(p[0] for p in pairs)
        p4 = max(p[1] for p in pairs)
        hw = {"cpu_probe_ops_n": round(pn),
              "cpu_probe_ops_4n": round(p4),
              "cpu_probe_pairs": [[round(a), round(b)] for a, b in pairs],
              "hardware_scaling_efficiency": round(
                  p4 / (nodes * pn), 3)}
    else:
        hw = {"cpu_probe_ops_n": None, "cpu_probe_ops_4n": None,
              "cpu_probe_pairs": [],
              "hardware_scaling_efficiency": None}
    s = max(s1, s2, key=lambda r: r["pages_per_sec"])
    n = max(n1, n2, key=lambda r: r["pages_per_sec"])
    eff = (n["pages_per_sec"] / s["pages_per_sec"]) / nodes
    print(json.dumps({
        "mode": "node-parallel (isolated Ray clusters, disjoint cores)",
        "nodes": nodes, "cores_per_node": cores_per_node,
        "claims_1node": s["claims"], "claims_4node": n["claims"],
        "sec_1node": s["sec"], "sec_4node": n["sec"],
        "pages_per_sec_1node": s["pages_per_sec"],
        "pages_per_sec_4node": n["pages_per_sec"],
        "node_scaling_efficiency": round(eff, 3),
        **hw,
        "per_node": n["per_node"],
    }))


if __name__ == "__main__":
    if "--scaling-nodes" in sys.argv:
        scaling_nodes()
    elif "--scaling" in sys.argv:
        scaling()
    else:
        main()
