"""REPL smoke: drive tools/repl.py as a subprocess over a scripted stdin
session (the reference's CLI contract — multi-line ';' accumulation,
\\-commands, per-query timing) and assert on the rendered output. Upgrades
the CLI from "driven manually" to automated evidence."""

from __future__ import annotations

import subprocess
import sys

REPO = "/root/repo"

_SCRIPT = """create table kv_demo (k integer, v varchar);
insert into kv_demo values (1, 'one'), (2, 'two'), (3, NULL);
select k, v from kv_demo
  where k >= 1;
\\dt
\\explain select k from kv_demo where k = 2
select count(*) AS n from kv_demo;
"""


def test_repl_scripted_session():
    proc = subprocess.run(
        [sys.executable, "tools/repl.py", "/root/testdata/sf0.001"],
        input=_SCRIPT,
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    out = proc.stdout
    assert proc.returncode == 0, proc.stderr[-2000:]
    # CREATE/INSERT acknowledged, multi-line SELECT returns all rows
    assert "one" in out and "two" in out
    assert "NULL" in out  # NULL rendering per slt conventions
    # \dt lists the created table (plus the sf-dir registrations)
    assert "kv_demo" in out
    # \explain renders a physical plan
    assert "Scan" in out or "Filter" in out or "AdaptiveSparkPlan" in out
    # aggregate result and per-query wall-time line
    assert "3" in out
    assert "Time:" in out or "time" in out.lower()
