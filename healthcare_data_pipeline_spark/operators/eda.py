"""EDA report generator (SURVEY §2.11; reference ``eda.py:205-322`` and
``runnerfile.py:177-245``).

The reference samples 10k rows to pandas and renders matplotlib PNGs into a
self-contained HTML file.  Here the heavy lifting (histograms, categorical
top-k, missing-value counts) runs as Spark aggregations over the FULL table —
no 10k sampling cap on the statistics — and only the tiny aggregate results
come to the driver, where they render as embedded base64 PNG (the
reference's artifact format, via the stdlib-only encoder in operators.png)
or inline SVG — no plotting libraries needed.  A bounded row sample is
still included for eyeballing, like the reference's 10-row preview.

At 100 TB this is the only shape that works: per-table stats are one
aggregation job each, the driver handles kilobytes.
"""

from __future__ import annotations

import html
import json
import os
from typing import Any

from pyspark.sql import DataFrame

from healthcare_data_pipeline_spark.operators.profiling import (
    categorical_top_k,
    numeric_histogram,
    profile_table,
)

_NUMERIC = {"int", "bigint", "double", "float", "smallint", "tinyint", "decimal"}


def _svg_bars(pairs: list[tuple[str, float]], width: int = 460, bar_h: int = 18) -> str:
    """Horizontal bar chart as inline SVG (no deps)."""
    if not pairs:
        return "<em>no data</em>"
    peak = max(v for _, v in pairs) or 1.0
    rows = []
    for i, (label, v) in enumerate(pairs):
        w = max(1, int((width - 180) * v / peak))
        y = i * (bar_h + 4)
        rows.append(
            f'<text x="0" y="{y + 13}" font-size="11">{html.escape(str(label)[:24])}</text>'
            f'<rect x="150" y="{y + 2}" width="{w}" height="{bar_h - 4}" fill="#4878a8"/>'
            f'<text x="{152 + w}" y="{y + 13}" font-size="11">{v:g}</text>'
        )
    h = len(pairs) * (bar_h + 4)
    return f'<svg width="{width}" height="{h}" xmlns="http://www.w3.org/2000/svg">{"".join(rows)}</svg>'


def eda_summary(df: DataFrame, name: str, top_k: int = 10, bins: int = 20) -> dict[str, Any]:
    """All EDA statistics for one table, computed distributedly."""
    prof = profile_table(df)
    numeric_cols = [p["column"] for p in prof if p["dtype"].split("(")[0] in _NUMERIC]
    cat_cols = [p["column"] for p in prof if p["dtype"] == "string"]
    hists = {}
    for c in numeric_cols[:6]:
        rows = numeric_histogram(df, c, bins=bins).orderBy("bin").collect()
        hists[c] = [
            (f"{r.lo:.4g}..{r.hi:.4g}" if r.lo is not None else "all", r.n) for r in rows
        ]
    tops = {}
    for c in cat_cols[:6]:
        rows = categorical_top_k(df, c, k=top_k).collect()
        tops[c] = [(r[c], r["n"]) for r in rows]
    sample = [r.asDict() for r in df.limit(10).collect()]
    return {
        "table": name,
        "profile": prof,
        "histograms": hists,
        "top_values": tops,
        "sample": sample,
    }


def _png_bars(pairs: list[tuple[str, float]], width: int = 300, bar_h: int = 18) -> str:
    """Bar chart as an embedded base64-PNG ``<img>`` (the reference's chart
    artifact format, eda.py:46-117) with labels/values as adjacent HTML text
    — the raster stays font-free, the text stays selectable."""
    from healthcare_data_pipeline_spark.operators.png import bar_chart_data_uri

    if not pairs:
        return "<em>no data</em>"
    gap = 4
    uri = bar_chart_data_uri([v for _, v in pairs], width=width, bar_h=bar_h - gap, gap=gap)
    row_style = f"height:{bar_h}px;font-size:11px;line-height:{bar_h}px"
    labels = "".join(
        f'<div style="{row_style}">{html.escape(str(label)[:24])}</div>' for label, _ in pairs
    )
    values = "".join(f'<div style="{row_style}">{v:g}</div>' for _, v in pairs)
    return (
        '<div style="display:flex;gap:8px;align-items:flex-start">'
        f'<div style="width:150px;text-align:right">{labels}</div>'
        f'<img src="{uri}" width="{width}" height="{len(pairs) * bar_h}" alt="bar chart"/>'
        f"<div>{values}</div></div>"
    )


def render_eda_html(summaries: list[dict[str, Any]], chart: str = "png") -> str:
    """Self-contained HTML, one section per table — same artifact contract as
    the reference's eda_report.html.  ``chart``: "png" embeds base64-PNG
    rasters (reference parity, matplotlib-free); "svg" uses inline SVG."""
    bars = _png_bars if chart == "png" else _svg_bars
    parts = [
        "<!doctype html><html><head><meta charset='utf-8'><title>EDA report</title>",
        "<style>body{font-family:sans-serif;margin:24px} table{border-collapse:collapse}",
        "td,th{border:1px solid #ccc;padding:3px 8px;font-size:12px}</style></head><body>",
        "<h1>EDA report</h1>",
    ]
    for s in summaries:
        parts.append(f"<h2>{html.escape(s['table'])}</h2>")
        parts.append("<h3>Column profile</h3><table><tr><th>column</th><th>dtype</th>"
                     "<th>nulls</th><th>distinct</th></tr>")
        for p in s["profile"]:
            parts.append(
                f"<tr><td>{html.escape(p['column'])}</td><td>{html.escape(p['dtype'])}</td>"
                f"<td>{p['null_count']}</td><td>{p['unique_count']}</td></tr>"
            )
        parts.append("</table>")
        for col, pairs in s["histograms"].items():
            parts.append(f"<h3>Histogram: {html.escape(col)}</h3>" + bars(pairs))
        for col, pairs in s["top_values"].items():
            parts.append(f"<h3>Top values: {html.escape(col)}</h3>" + bars(pairs))
        if s["sample"]:
            cols = list(s["sample"][0])
            parts.append("<h3>Sample</h3><table><tr>" +
                         "".join(f"<th>{html.escape(c)}</th>" for c in cols) + "</tr>")
            for row in s["sample"]:
                parts.append(
                    "<tr>" + "".join(f"<td>{html.escape(str(row[c])[:40])}</td>" for c in cols) + "</tr>"
                )
            parts.append("</table>")
    parts.append("</body></html>")
    return "".join(parts)


def render_interactive_html(summaries: list[dict[str, Any]]) -> str:
    """Interactive EDA page: plotly.js from CDN + data inlined as JSON — the
    reference's plotly variant (eda.py:311-312, ``include_plotlyjs='cdn'``)
    without needing the plotly PYTHON package (not in this image).  Charts are
    plain Plotly.newPlot specs built from the same summaries that feed the
    static SVG report, so both render identical statistics."""
    specs: list[dict[str, Any]] = []
    for s in summaries:
        for col, pairs in s["histograms"].items():
            specs.append(
                {
                    "id": f"{s['table']}-h-{col}",
                    "title": f"{s['table']}: histogram {col}",
                    "x": [str(lo) for lo, _ in pairs],
                    "y": [n for _, n in pairs],
                }
            )
        for col, pairs in s["top_values"].items():
            specs.append(
                {
                    "id": f"{s['table']}-t-{col}",
                    "title": f"{s['table']}: top values {col}",
                    "x": [str(v) for v, _ in pairs],
                    "y": [n for _, n in pairs],
                }
            )
    divs = "".join(
        f'<div id="{html.escape(sp["id"])}" style="height:280px"></div>' for sp in specs
    )
    payload = json.dumps(specs)
    return f"""<!doctype html><html><head><meta charset="utf-8">
<title>EDA report (interactive)</title>
<script src="https://cdn.plot.ly/plotly-2.32.0.min.js"></script>
<style>body{{background:#0e1117;color:#fafafa;font-family:sans-serif;margin:24px}}</style>
</head><body><h1>EDA report (interactive)</h1>{divs}
<script>
const specs = {payload};
const layout = {{paper_bgcolor:"#0e1117", plot_bgcolor:"#0e1117", font:{{color:"#fafafa"}}}};
for (const s of specs) {{
  Plotly.newPlot(s.id, [{{type:"bar", x:s.x, y:s.y}}],
                 Object.assign({{title:s.title}}, layout), {{displaylogo:false}});
}}
</script></body></html>"""


def kpi_summaries(dfs: dict[str, DataFrame]) -> dict[str, Any]:
    """The reference's dashboard KPI block (eda.py:220-238): row counts of
    the drug/prescriber dims and the summed claim volume of the fact —
    ``'NA'`` where a table or column is absent, exactly like the reference.
    Each KPI is one scalar Spark aggregate."""
    import pyspark.sql.functions as F

    out: dict[str, Any] = {"tables": sorted(dfs)}
    out["distinct_drugs"] = dfs["drug"].count() if "drug" in dfs else "NA"
    out["distinct_prescribers"] = dfs["prescriber"].count() if "prescriber" in dfs else "NA"
    fact = dfs.get("prescriber_drug")
    count_col = next(
        (c for c in ("total_claims", "prescriptions") if fact is not None and c in fact.columns),
        None,
    )
    out["total_prescriptions"] = (
        int(fact.agg(F.sum(count_col)).collect()[0][0] or 0) if count_col else "NA"
    )
    return out


def top_drugs(dfs: dict[str, DataFrame], n: int = 20) -> list[dict[str, Any]]:
    """Reference eda.py:246-258: group the fact by its drug-name-ish column,
    sum its claims-ish column, top ``n`` — one groupBy + ordered limit (the
    same column-name heuristics as the reference, so the artifacts agree)."""
    import pyspark.sql.functions as F

    fact = dfs.get("prescriber_drug")
    if fact is None:
        return []
    name_cols = [c for c in fact.columns if "drug" in c.lower() and "name" in c.lower()]
    count_markers = ("claim", "count", "total", "prescript", "qty", "quantity", "num")
    count_cols = [c for c in fact.columns if any(k in c.lower() for k in count_markers)]
    name_col = name_cols[0] if name_cols else fact.columns[0]
    count_col = count_cols[0] if count_cols else fact.columns[-1]
    rows = (
        fact.groupBy(name_col)
        # coalesce: a drug whose count column is all NULL sums to NULL in
        # Spark but 0 in the reference's pandas groupby-sum — emit 0.
        .agg(F.coalesce(F.sum(count_col), F.lit(0)).alias("prescriptions"))
        .orderBy(F.col("prescriptions").desc(), F.col(name_col))
        .limit(n)
        .collect()
    )
    return [{"drug": r[name_col], "prescriptions": int(r["prescriptions"])} for r in rows]


def generate_eda_report(
    dfs: dict[str, DataFrame], artifacts_dir: str
) -> tuple[str, str]:
    """Compute EDA for every table, write ``eda_report.html`` (static inline
    SVG) + ``eda_interactive.html`` (plotly.js CDN) + ``eda_summary.json``
    (reference artifacts eda.py:205-208,296-312).  Returns the static html +
    json paths.

    ``eda_summary.json`` matches the reference's object shape key-by-key
    (eda.py:296-301: ``generated_at`` / ``tables`` / ``top_drugs`` /
    ``summaries``) so the reference's dashboard KPI tiles read it directly;
    the engine's richer per-table profiles ride along under
    ``table_profiles`` (golden-diffed against the bundled reference artifact
    in tests/test_eda_audit_evaluate.py)."""
    import datetime

    os.makedirs(artifacts_dir, exist_ok=True)
    summaries = [eda_summary(df, name) for name, df in sorted(dfs.items())]
    html_path = os.path.join(artifacts_dir, "eda_report.html")
    json_path = os.path.join(artifacts_dir, "eda_summary.json")
    with open(html_path, "w") as f:
        f.write(render_eda_html(summaries))
    with open(os.path.join(artifacts_dir, "eda_interactive.html"), "w") as f:
        f.write(render_interactive_html(summaries))
    summary_obj = {
        "generated_at": datetime.datetime.now(datetime.timezone.utc)
        .isoformat()
        .replace("+00:00", "Z"),
        "tables": sorted(dfs),
        "top_drugs": top_drugs(dfs),
        "summaries": kpi_summaries(dfs),
        "table_profiles": [
            {k: v for k, v in s.items() if k != "sample"} for s in summaries
        ],
    }
    with open(json_path, "w") as f:
        json.dump(summary_obj, f, indent=2, default=str)
    return html_path, json_path
