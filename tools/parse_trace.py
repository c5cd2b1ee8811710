"""Summarize a jax.profiler device trace: total device time by op
category and the top individual ops ('XLA Ops' track: pid=3/tid=3 on the
axon relay's single-core trace)."""
import collections
import gzip
import json
import re
import subprocess
import sys

path = sys.argv[1] if len(sys.argv) > 1 else None
if path is None:
    path = subprocess.run(
        ["sh", "-c", "ls -t /tmp/jaxprof/plugins/profile/*/*.trace.json.gz"
         " | head -1"], capture_output=True, text=True).stdout.strip()
raw = json.load(gzip.open(path))
events = raw["traceEvents"]

# find the 'XLA Ops' track
pid_tid = None
for e in events:
    if e.get("ph") == "M" and e.get("name") == "thread_name" and \
            e.get("args", {}).get("name") == "XLA Ops":
        pid_tid = (e["pid"], e["tid"])
if pid_tid is None:
    # fall back: the densest complete-event track
    counts = collections.Counter(
        (e.get("pid"), e.get("tid")) for e in events if e.get("ph") == "X")
    pid_tid = counts.most_common(1)[0][0]

ops = [e for e in events
       if e.get("ph") == "X" and (e["pid"], e["tid"]) == pid_tid]
total = sum(e["dur"] for e in ops)


def category(name):
    n = name.lower()
    if "flash" in n or "attention" in n:
        return "pallas-attention"
    if n.startswith("while"):
        return "while-body(scan/ce)"
    if "conv" in n:
        return "convolution"
    if re.match(r".*(fusion|dot|matmul)", n) and "loop" not in n:
        return "matmul/fusion"
    if "copy" in n or "transpose" in n or "pad" in n or "bitcast" in n \
            or "slice" in n or "concatenate" in n:
        return "copy/layout"
    if "dynamic-update" in n:
        return "dyn-update"
    if "reduce" in n or "add" in n or "multiply" in n or "convert" in n:
        return "elementwise/reduce"
    return "other"


by_cat = collections.Counter()
by_op = collections.Counter()
for e in ops:
    by_cat[category(e["name"])] += e["dur"]
    by_op[e["name"]] += e["dur"]

print(f"trace: {path}")
print(f"device total: {total/1e3:.1f} ms over {len(ops)} op events")
print("\n-- by category --")
for cat, d in by_cat.most_common():
    print(f"{d/total*100:6.1f}%  {d/1e3:9.2f} ms  {cat}")
print("\n-- top 25 ops --")
for name, d in by_op.most_common(25):
    print(f"{d/total*100:6.1f}%  {d/1e3:9.2f} ms  {name[:110]}")
