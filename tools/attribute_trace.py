"""Attribute device-trace op time to model source lines.

Joins the latest jax.profiler trace (op name -> self time) with the
optimized-HLO dump from tools/dump_hlo.py (op name -> metadata
source_file:source_line), then aggregates by source file and by line.

Usage: python tools/attribute_trace.py [trace.json.gz] [hlo.txt]
"""
import collections
import gzip
import json
import re
import subprocess
import sys

trace_path = sys.argv[1] if len(sys.argv) > 1 else None
hlo_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/step_hlo.txt"
if trace_path is None:
    trace_path = subprocess.run(
        ["sh", "-c", "ls -t /tmp/jaxprof/plugins/profile/*/*.trace.json.gz"
         " | head -1"], capture_output=True, text=True).stdout.strip()

# --- HLO: op name -> (source, op_name path fragment) --------------------
name_re = re.compile(r"^\s*(?:ROOT )?%?([\w.\-]+) = ")
meta_re = re.compile(
    r'metadata=\{[^}]*?op_name="([^"]*)"[^}]*?'
    r'source_file="([^"]*)"[^}]*?source_line=(\d+)')
src_of = {}
op_of = {}
with open(hlo_path) as f:
    for line in f:
        m = name_re.match(line)
        if not m:
            continue
        mm = meta_re.search(line)
        if mm:
            src_of[m.group(1)] = f"{mm.group(2).split('/')[-1]}:{mm.group(3)}"
            op_of[m.group(1)] = mm.group(1)

raw = json.load(gzip.open(trace_path))
events = raw["traceEvents"]
pid_tid = None
for e in events:
    if e.get("ph") == "M" and e.get("name") == "thread_name" and \
            e.get("args", {}).get("name") == "XLA Ops":
        pid_tid = (e["pid"], e["tid"])
ops = [e for e in events
       if e.get("ph") == "X" and (e["pid"], e["tid"]) == pid_tid]

# container events (e.g. a `while` spanning its body ops) double-count:
# keep only leaf events — an event is a container if another event starts
# within its span.  O(n log n) sweep.
ops.sort(key=lambda e: (e["ts"], -e["dur"]))
starts = [e["ts"] for e in ops]
import bisect
container = set()
for i, e in enumerate(ops):
    j = bisect.bisect_right(starts, e["ts"])
    if j < len(ops) and starts[j] < e["ts"] + e["dur"]:
        container.add(i)
ops = [e for i, e in enumerate(ops) if i not in container]
total = sum(e["dur"] for e in ops)

by_src = collections.Counter()
by_opname = collections.Counter()
unmatched = collections.Counter()
for e in ops:
    nm = e["name"]
    src = src_of.get(nm)
    if src is None:
        unmatched[nm] += e["dur"]
        continue
    by_src[src] += e["dur"]
    # shorten op path: keep the last 3 scope components
    path = "/".join(op_of[nm].split("/")[-3:])
    by_opname[path] += e["dur"]

print(f"trace {trace_path}\ntotal {total/1e3:.1f} ms; "
      f"matched {sum(by_src.values())/total*100:.0f}%")
print("\n-- by source line --")
for src, d in by_src.most_common(30):
    print(f"{d/total*100:6.1f}%  {d/1e3:8.2f} ms  {src}")
print("\n-- by op path (last 3 scopes) --")
for p, d in by_opname.most_common(25):
    print(f"{d/total*100:6.1f}%  {d/1e3:8.2f} ms  {p[:120]}")
print("\n-- unmatched (no metadata: whiles, copies, params) --")
for nm, d in unmatched.most_common(12):
    print(f"{d/total*100:6.1f}%  {d/1e3:8.2f} ms  {nm[:90]}")
