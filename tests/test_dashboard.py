"""Dashboard (stdlib artifact browser — reference run_dashboard.py parity)."""

from __future__ import annotations

import json
import os
import threading
import urllib.request

from healthcare_data_pipeline_spark.dashboard import build_index, serve


def _fake_artifacts(base: str) -> str:
    art = os.path.join(base, "artifacts")
    os.makedirs(os.path.join(art, "readable_reports"))
    with open(os.path.join(art, "eda_summary.json"), "w") as fh:
        json.dump(
            {
                "generated_at": "2026-01-01T00:00:00Z",
                "tables": ["drug", "presc"],
                "top_drugs": [{"drug": "aspirin", "prescriptions": 5}],
                "summaries": {
                    "tables": ["drug", "presc"],
                    "distinct_drugs": 1200,
                    "distinct_prescribers": "NA",
                    "total_prescriptions": 599651,
                },
                "table_profiles": [
                    {"table": "drug", "profile": [{"column": "c", "row_count": 1200}]},
                    {"table": "presc", "profile": [{"column": "c", "row_count": 240}]},
                ],
            },
            fh,
        )
    with open(os.path.join(art, "pipeline_manifest.json"), "w") as fh:
        json.dump({"runtime_sec": 12.3, "tables": ["drug", "presc"]}, fh)
    with open(os.path.join(art, "pipeline.log"), "w") as fh:
        fh.write("t0 ingest: 2 tables\nt1 pipeline done in 12.3s\n")
    with open(os.path.join(art, "readable_reports", "drug_report.csv"), "w") as fh:
        fh.write("drug,qty\naspirin,5\n")
    return art


def test_build_index_links_artifacts(tmp_path):
    art = _fake_artifacts(str(tmp_path))
    index = build_index(art)
    page = open(index).read()
    assert "readable_reports/drug_report.csv" in page
    assert "eda_summary.json" in page
    assert "pipeline done" in page  # log tail inlined
    assert "1,440" in page  # KPI: total rows across profiled tables
    assert "12.3 s" in page  # KPI: last runtime
    # reference KPI tiles (eda.py:150-153 feeds these from summaries)
    assert "599,651" in page and "total prescriptions" in page
    assert "distinct drugs" in page and "distinct prescribers" not in page  # NA skipped


def test_serve_renders_live_index(tmp_path):
    art = _fake_artifacts(str(tmp_path))
    srv = serve(art, port=0)  # ephemeral port
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as resp:
            body = resp.read().decode()
        assert resp.status == 200 and "Dashboard" in body
        # live rebuild: append to the log, reload, see the new line
        with open(os.path.join(art, "pipeline.log"), "a") as fh:
            fh.write("t2 extra stage\n")
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as resp:
            assert "extra stage" in resp.read().decode()
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/readable_reports/drug_report.csv"
        ) as resp:
            assert "aspirin" in resp.read().decode()
    finally:
        srv.shutdown()
        srv.server_close()
