"""GUI launcher logic (headless — the Tk shell itself needs a display)."""

from __future__ import annotations

import sys

from healthcare_data_pipeline_spark.gui import build_command, stream_process


def test_build_command_flags():
    assert build_command() == [
        sys.executable,
        "-m",
        "healthcare_data_pipeline_spark.pipeline",
        "--base-dir",
        "local_data",
    ]
    cmd = build_command("d", force_fresh=True, skip_anonymize=True, export_sqlite=True)
    assert cmd[-4:] == ["d", "--force-fresh", "--skip-anonymize", "--export-sqlite"]


def test_stream_process_lines_and_exit_code():
    lines: list[str] = []
    rc = stream_process(
        [sys.executable, "-c", "print('a'); print('b'); raise SystemExit(3)"],
        lines.append,
    )
    assert rc == 3
    assert [ln.strip() for ln in lines] == ["a", "b"]
