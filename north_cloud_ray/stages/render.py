"""Render worker client (S7) — dynamic-page rendering for JS-heavy hosts.

Reference shape: a Playwright render SERVICE with an HTTP client
(crawler/internal/render/client.go:16-120 — RenderRequest{url, timeout,
wait_until, scroll/selector/viewport config} -> RenderResponse{html,
final_url, status_code, render_time_ms}). The fetch worker dispatches
render-mode hosts to the client instead of plain GET
(fetcher/render_worker_test.go).

Ray shape: the client is per-worker-process state inside the fetch stage
(same lifetime as the robots cache). Backends:
- 'synthetic': renders against the deterministic synthetic web (dynamic
  hosts serve a JS shell over plain GET; render returns the full page) —
  the sandbox path, oracle-equal by construction.
- 'real': a Playwright sidecar HTTP client — NOT available in this
  container; instantiating it raises so nothing silently no-ops.
"""

from __future__ import annotations


class RenderClient:
    def __init__(self, web=None, backend: str = "synthetic",
                 timeout_ms: int = 30_000, wait_until: str = "networkidle"):
        # timeout_ms/wait_until mirror RenderRequest fields; they shape the
        # 'real' backend's HTTP payload and are RESERVED here — the
        # synthetic renderer is instantaneous and ignores them.
        if backend == "real":
            raise NotImplementedError(
                "Playwright render sidecar is not available in this "
                "environment; use backend='synthetic'")
        if backend != "synthetic":
            raise ValueError(f"unknown render backend: {backend}")
        if web is None:
            raise ValueError("synthetic backend needs the SyntheticWeb")
        self.web = web
        self.timeout_ms = timeout_ms
        self.wait_until = wait_until

    def render(self, url: str, etag: str | None = None,
               last_modified: str | None = None, now_us: int = 0) -> dict:
        """RenderRequest -> fetch-result dict (same contract as
        SyntheticWeb.fetch, so route_fetch needs no special casing)."""
        return self.web.render(url, etag=etag, last_modified=last_modified,
                               now_us=now_us)


def perform_fetch(web, render_client, claim: dict) -> dict:
    """Fetch dispatch shared by the distributed fetch stage and the oracle
    simulator: render-mode hosts go through the render client (S7), the
    rest through plain GET — identical routing on both sides keeps the
    oracle equality meaningful. The claim's virtual fetch time selects the
    content epoch of changing pages (A4)."""
    now_us = int(claim.get("claim_at") or 0)
    if render_client is not None and web.needs_render(claim["host"]):
        return render_client.render(
            claim["url"], etag=claim.get("etag"),
            last_modified=claim.get("last_modified"), now_us=now_us)
    return web.fetch(claim["url"], etag=claim.get("etag"),
                     last_modified=claim.get("last_modified"), now_us=now_us)
