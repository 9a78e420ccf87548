"""`ray job submit` entrypoint for the crawl generation loop.

    ray job submit --working-dir . -- python crawl_job.py \
        --out /tmp/crawl-out --hosts 1000 --rounds 5 --num-shards 16 \
        --feeds --sitemaps

The driver process owns the Ray session (connects to the cluster via
RAY_ADDRESS, or starts a local one). Rounds checkpoint atomically; rerunning
the same command with the same --out resumes from the last committed round
(kill it mid-run and re-submit to verify).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True, help="checkpoint/output root")
    p.add_argument("--hosts", type=int, default=64)
    p.add_argument("--pages-per-host", type=int, default=24)
    p.add_argument("--rounds", type=int, default=10)
    p.add_argument("--num-shards", type=int, default=8)
    p.add_argument("--fetch-concurrency", type=int, default=8)
    p.add_argument("--window-sec", type=int, default=60)
    p.add_argument("--text-scale", type=int, default=1)
    p.add_argument("--feeds", action="store_true")
    p.add_argument("--sitemaps", action="store_true")
    p.add_argument("--classify", action="store_true",
                   help="classify documents after the crawl")
    p.add_argument("--compact", action="store_true",
                   help="compact per-task sink part files after the run "
                        "(crash-safe; resume-safe to re-run)")
    p.add_argument("--merge-stream-rows", type=int, default=2_000_000,
                   help="frontier partitions above this row count merge "
                        "via url_hash-range row-group streaming (bounded "
                        "heap); 0 forces whole-frame merges")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from north_cloud_ray.config import CrawlConfig, SyntheticWebConfig
    from north_cloud_ray.pipelines.crawl import CrawlRunner

    web_cfg = SyntheticWebConfig(
        n_hosts=args.hosts, base_pages_per_host=args.pages_per_host,
        text_scale=args.text_scale,
    )
    cfg = CrawlConfig(
        num_shards=args.num_shards,
        fetch_concurrency=args.fetch_concurrency,
        round_window_us=args.window_sec * 1_000_000,
        use_feeds=args.feeds,
        use_sitemaps=args.sitemaps,
        max_rounds=args.rounds,
        merge_stream_rows=args.merge_stream_rows,
    )
    runner = CrawlRunner(args.out, cfg, web_cfg)
    t0 = time.perf_counter()
    summary = runner.run(max_rounds=args.rounds)
    out = {
        "claims": summary["claims"],
        "rounds": summary["rounds"],
        "wall_sec": round(time.perf_counter() - t0, 2),
        "out_dir": args.out,
        "resumed_from": runner.store.latest_committed_round() - summary["rounds"],
    }
    if args.compact:
        cstats = runner.compact_results()
        out["compacted_files"] = sum(
            s["files_before"] - s["files_after"] for s in cstats.values())
    if args.classify:
        from north_cloud_ray.stages.classify import classify_documents

        out["classified_docs"] = classify_documents(
            runner.documents_dataset()
        ).count()
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
