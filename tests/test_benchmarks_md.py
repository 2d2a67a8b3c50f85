"""Every BENCHMARKS.md headline number must trace to a committed artifact
(VERDICT r2 weak item 1 / next-round item 10).

BENCHMARKS.md carries a machine-checkable "## Headline numbers" table:

    | claim | value | source |
    |---|---|---|
    | int8 engine vs fp32 | 1.06 | BENCH_SWEEP.jsonl[metric=...].detail.w8a8_vs_fp32 |

``source`` grammar:
  - ``FILE.jsonl[KEY=VALUE].dotted.path`` — first row whose KEY equals
    VALUE, then walk the dotted path;
  - ``FILE.json:dotted.path`` — walk the dotted path of a JSON file.

The test resolves each source against the artifact in the repo root and
asserts the claimed value matches within 2% (claims are rounded for
prose). A claim whose artifact row is missing, or whose value drifted
(artifact regenerated without updating the doc), fails loudly — the
failure mode round 2 shipped (a 1.52x decode claim whose artifact row
was an error record).
"""

import json
import os
import re

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MD = os.path.join(ROOT, "BENCHMARKS.md")


def _walk(obj, dotted):
    for part in dotted.split("."):
        if isinstance(obj, list):
            obj = obj[int(part)]
        else:
            assert part in obj, f"missing key {part!r} (have {list(obj)[:12]})"
            obj = obj[part]
    return obj


def _resolve(source: str):
    m = re.match(r"([\w.]+\.jsonl)\[(\w+)=([^\]]+)\]\.(.+)", source)
    if m:
        fname, key, val, path = m.groups()
        rows = []
        with open(os.path.join(ROOT, fname)) as f:
            for line in f:
                line = line.strip()
                if line:
                    rows.append(json.loads(line))
        hits = [r for r in rows if str(r.get(key)) == val]
        assert hits, f"no row with {key}={val} in {fname}"
        return _walk(hits[0], path)
    m = re.match(r"([\w.]+\.json):(.+)", source)
    if m:
        fname, path = m.groups()
        with open(os.path.join(ROOT, fname)) as f:
            return _walk(json.load(f), path)
    raise AssertionError(f"unparseable source {source!r}")


def _headline_rows():
    assert os.path.exists(MD), "BENCHMARKS.md missing"
    text = open(MD).read()
    lines = text.splitlines()
    try:
        start = next(
            i for i, ln in enumerate(lines) if ln.startswith("## Headline numbers")
        )
    except StopIteration:
        raise AssertionError("BENCHMARKS.md lacks the '## Headline numbers' table")
    rows = []
    in_table = False
    for ln in lines[start + 1 :]:
        if ln.startswith("## "):
            break  # next section — only the headline table counts
        if ln.startswith("|"):
            in_table = True
            cells = [c.strip() for c in ln.strip().strip("|").split("|")]
            if len(cells) >= 3 and cells[1] and not set(cells[1]) <= {"-", " "}:
                if cells[0] != "claim":  # skip the header row
                    rows.append((cells[0], cells[1], cells[2]))
        elif in_table and ln.strip():
            break  # table ended
    assert rows, "headline table is empty"
    return rows


@pytest.mark.parametrize(
    "claim,value,source",
    _headline_rows() if os.path.exists(MD) else [],
    ids=lambda v: str(v)[:40],
)
def test_headline_traces_to_artifact(claim, value, source):
    claimed = float(value.replace("×", "").replace(",", ""))
    actual = float(_resolve(source))
    assert actual == pytest.approx(claimed, rel=0.02), (
        f"{claim}: BENCHMARKS.md says {claimed}, artifact {source} says "
        f"{actual} — regenerate the doc or the artifact"
    )
