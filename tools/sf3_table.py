"""Emit the round-9 sf3 differential-sweep section for SCALE.md from the
sweep logs (/tmp/sf3_done.json + /tmp/sf3_rest.log). Re-run to re-stamp."""
import json, re, sys
sys.path.insert(0, "/root/repo")

done = {k: tuple(v) for k, v in json.load(open("/tmp/sf3_done.json")).items()}
for path in ("/tmp/sf3_rest.log",):
    try:
        for line in open(path, errors="replace"):
            for m in re.finditer(r"(PASS|ok-)\s+(\w+): rows=(\d+) \[([0-9.]+)s\]", line):
                done[m.group(2)] = (int(m.group(3)), float(m.group(4)))
    except OSError:
        pass
from templatedb_spark.suite import all_specs
order = list(all_specs())
remaining = [n for n in order if n not in done]
print(f"{len(done)}/{len(order)} specs differential-PASS at sf3; remaining: {len(remaining)}")
if remaining:
    print("remaining:", " ".join(remaining))
slow = sorted(done.items(), key=lambda kv: -kv[1][1])[:12]
print("\n| spec (12 slowest) | rows | s (contended, --jobs 2-6) |\n|---|---|---|")
for n, (r, t) in slow:
    print(f"| {n} | {r} | {t:.0f} |")
