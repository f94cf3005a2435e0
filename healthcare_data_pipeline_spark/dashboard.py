"""Artifact dashboard — the reference's Streamlit browser as stdlib HTTP.

The reference ships ``run_dashboard.py`` (Streamlit app: artifact browser,
live pipeline-log tail, KPI metrics from eda_summary.json, readable-report
tables — run_dashboard.py:1-80 and onward).  Streamlit isn't in this image,
so the same surface is served with only the standard library:

* ``build_index(artifacts_dir)`` renders ``index.html`` — KPI tiles from
  ``eda_summary.json``, the tail of ``pipeline.log``, the run manifest, and
  links to every artifact (EDA report, data dictionary, validation report,
  readable reports, SQLite export).
* ``serve(artifacts_dir, port)`` serves the artifacts directory over HTTP
  (ThreadingHTTPServer), rebuilding the index on each page load so a
  concurrently-running pipeline shows live progress, like the reference's
  log tail.

CLI: ``python -m healthcare_data_pipeline_spark.dashboard
--artifacts local_data/artifacts [--port 8501] [--build-only]``
"""

from __future__ import annotations

import argparse
import functools
import html
import json
import os
from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer

_STYLE = """
body { background:#0e1117; color:#fafafa; font-family:system-ui,sans-serif;
       max-width:1100px; margin:24px auto; padding:0 16px; }
h1,h2 { font-weight:600; } a { color:#7cc4ff; }
.kpis { display:flex; flex-wrap:wrap; gap:12px; }
.kpi { background:#1a1d24; padding:10px 16px; border-radius:8px; min-width:140px; }
.kpi .v { font-size:1.4em; font-weight:700; } .kpi .k { color:#9aa4b2; font-size:.85em; }
pre { background:#11141b; color:#00ff99; padding:12px; border-radius:8px;
      overflow-x:auto; font-size:12px; max-height:360px; }
ul { line-height:1.8; }
"""


def _tail(path: str, n: int = 50) -> str:
    if not os.path.exists(path):
        return "(no pipeline.log yet)"
    with open(path, errors="replace") as fh:
        return "".join(fh.readlines()[-n:])


def _kpis(artifacts_dir: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    summary_path = os.path.join(artifacts_dir, "eda_summary.json")
    if os.path.exists(summary_path):
        with open(summary_path) as fh:
            summary = json.load(fh)
        # operators.eda writes the reference's object shape (generated_at /
        # tables / top_drugs / summaries, reference eda.py:296-301) with the
        # engine's per-table profiles under table_profiles; a bare list is
        # the pre-r7 layout, kept readable.
        profiles = (
            summary.get("table_profiles", []) if isinstance(summary, dict) else summary
        )
        if isinstance(summary, dict):
            kpis = summary.get("summaries", {})
            for key, label in (
                ("distinct_drugs", "distinct drugs"),
                ("distinct_prescribers", "distinct prescribers"),
                ("total_prescriptions", "total prescriptions"),
            ):
                v = kpis.get(key)
                if isinstance(v, int):
                    out.append((label, f"{v:,}"))
        if profiles:
            out.append(("tables profiled", str(len(profiles))))
            rows = sum(
                t["profile"][0].get("row_count", 0)
                for t in profiles
                if isinstance(t, dict) and t.get("profile")
            )
            if rows:
                out.append(("total rows", f"{rows:,}"))
    manifest_path = os.path.join(artifacts_dir, "pipeline_manifest.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            manifest = json.load(fh)
        out.append(("last runtime", f"{manifest.get('runtime_sec', '?')} s"))
        out.append(("ingested tables", str(len(manifest.get("tables", [])))))
    return out


def build_index(artifacts_dir: str) -> str:
    """Render index.html into the artifacts dir; returns its path."""
    os.makedirs(artifacts_dir, exist_ok=True)
    kpi_html = "".join(
        f'<div class="kpi"><div class="v">{html.escape(v)}</div>'
        f'<div class="k">{html.escape(k)}</div></div>'
        for k, v in _kpis(artifacts_dir)
    )
    links: list[str] = []
    for root, _dirs, fnames in sorted(os.walk(artifacts_dir)):
        for fname in sorted(fnames):
            if fname == "index.html":
                continue
            rel = os.path.relpath(os.path.join(root, fname), artifacts_dir)
            links.append(f'<li><a href="{html.escape(rel)}">{html.escape(rel)}</a></li>')
    page = f"""<!doctype html><html><head><meta charset="utf-8">
<title>Healthcare Pipeline — Dashboard</title><style>{_STYLE}</style></head><body>
<h1>Healthcare Pipeline — Dashboard</h1>
<div class="kpis">{kpi_html or "<em>no run yet</em>"}</div>
<h2>Pipeline log (tail)</h2>
<pre>{html.escape(_tail(os.path.join(artifacts_dir, "pipeline.log")))}</pre>
<h2>Artifacts</h2><ul>{"".join(links) or "<li><em>none</em></li>"}</ul>
</body></html>"""
    index_path = os.path.join(artifacts_dir, "index.html")
    with open(index_path, "w") as fh:
        fh.write(page)
    return index_path


class _Handler(SimpleHTTPRequestHandler):
    def do_GET(self):  # noqa: N802 (http.server API)
        if self.path in ("/", "/index.html"):
            # rebuild on each load: live log tail / fresh KPIs
            build_index(self.directory)
        super().do_GET()

    def log_message(self, *args):  # quiet
        pass


def serve(artifacts_dir: str, port: int = 8501) -> ThreadingHTTPServer:
    """Serve the artifacts dir; returns the (not yet running) server — call
    ``serve_forever()`` (CLI does) or drive it from a thread in tests."""
    build_index(artifacts_dir)
    handler = functools.partial(_Handler, directory=os.path.abspath(artifacts_dir))
    return ThreadingHTTPServer(("127.0.0.1", port), handler)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="Serve pipeline artifacts as a dashboard.")
    ap.add_argument("--artifacts", default="local_data/artifacts")
    ap.add_argument("--port", type=int, default=8501)
    ap.add_argument(
        "--build-only", action="store_true", help="render index.html and exit (CI mode)"
    )
    args = ap.parse_args(argv)
    index = build_index(args.artifacts)
    print(f"index: {index}")
    if args.build_only:
        return 0
    srv = serve(args.artifacts, args.port)
    print(f"serving {args.artifacts} at http://127.0.0.1:{args.port}/")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
