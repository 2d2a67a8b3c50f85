"""Standalone on-chip probe of the perf-critical kernel sections.

Runs bench.py's int4 / attention / paged-attention sections in isolation
(no headline) and prints one JSON line — the fast iteration loop for
kernel work (VERDICT r4 item 4) without spending a full bench budget.

Run:  python benchmarks/kernel_probe.py [--sections int4,attn,paged]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import bench  # noqa: E402  (shares the compile cache + harness)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sections", default="int4,attn,paged")
    ap.add_argument("--lean", action="store_true")
    args = ap.parse_args(argv)
    detail = {}
    t0 = time.time()
    fns = {
        "int4": bench._bench_int4,
        "attn": bench._bench_attn_s8k,
        "paged": bench._bench_paged_attn,
        "llm": bench._bench_llm_decode,
    }
    for name in args.sections.split(","):
        t1 = time.time()
        fns[name](detail, lean=args.lean)
        detail[name + "_s"] = round(time.time() - t1, 1)
    detail["elapsed_s"] = round(time.time() - t0, 1)
    print(json.dumps(detail))


if __name__ == "__main__":
    main()
