"""One-shot measurement sweep: every benchmark, one JSONL file.

Run (on a TPU-attached host):  python benchmarks/run_all.py [out.jsonl]

Exists because the shared TPU tunnel comes and goes — when a window
opens, one command captures the full measurement set for BENCHMARKS.md:

  1. bench.py             (driver headline + detail: engines, train, int4,
                           LLM decode step)
  2. train_speed.py       (per-flavor training steps incl. bn_stats/
                           act_codes lowerings)
  3. llm_decode.py        (Llama-shaped W4+int8KV decode vs bf16)

Each script runs as a SUBPROCESS, serially (the tunnel is single-client),
with a per-script timeout; a crash or hang in one does not lose the rest.
Output lines that parse as JSON are appended to the JSONL with a
"source" field; everything else goes to stderr passthrough.
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

SCRIPTS = [
    ("bench", os.path.join(ROOT, "bench.py"), 3600),
    ("train_speed", os.path.join(HERE, "train_speed.py"), 3600),
    ("llm_decode", os.path.join(HERE, "llm_decode.py"), 1800),
]


def main(out_path: str = "BENCH_SWEEP.jsonl") -> int:
    rows = []
    for name, script, timeout in SCRIPTS:
        print(f"== {name} ({script}) ==", file=sys.stderr, flush=True)
        try:
            proc = subprocess.run(
                [sys.executable, script],
                capture_output=True,
                text=True,
                timeout=timeout,
                cwd=ROOT,
            )
        except subprocess.TimeoutExpired:
            rows.append({"source": name, "error": f"timeout after {timeout}s"})
            print(f"!! {name} timed out", file=sys.stderr, flush=True)
            continue
        if proc.returncode != 0:
            rows.append(
                {"source": name, "error": proc.stderr.strip()[-500:] or "nonzero exit"}
            )
        for line in proc.stdout.splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue
            row["source"] = name
            rows.append(row)
            print(json.dumps(row), flush=True)
    with open(out_path, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    print(f"wrote {len(rows)} rows to {out_path}", file=sys.stderr)
    return 0 if rows else 1


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))
