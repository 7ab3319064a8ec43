"""Docs-vs-artifacts consistency (VERDICT r3 weak #1: three rounds of
claims-without-committed-evidence drift).

Every `benchmarks/*.json` file cited in a repo-authored markdown doc must
exist, and BASELINE.md's generated measured block must be populated (not
the placeholder).
"""

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# docs WE author (VERDICT.md / ADVICE.md are judge-written)
DOCS = ["BASELINE.md", "PARITY.md", "README.md", "CLAUDE.md"]


def test_cited_benchmark_jsons_exist():
    missing = []
    for doc in DOCS:
        path = os.path.join(REPO, doc)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            text = f.read()
        for name in set(re.findall(r"benchmarks/([\w.\-]+\.json)", text)):
            if not os.path.exists(os.path.join(REPO, "benchmarks", name)):
                missing.append(f"{doc} cites benchmarks/{name}")
    assert not missing, "dangling benchmark citations: " + "; ".join(missing)


def test_baseline_measured_block_is_populated():
    with open(os.path.join(REPO, "BASELINE.md")) as f:
        text = f.read()
    begin = text.index("<!-- BENCH:BEGIN")
    end = text.index("<!-- BENCH:END -->")
    block = text[begin:end]
    assert "placeholder" not in block, (
        "BASELINE.md measured block is the placeholder — run "
        "`python benchmarks/gen_baseline.py <BENCH json>`")
    assert "points/s" in block


def test_bench_jsons_cited_by_baseline_are_valid_json():
    import json

    with open(os.path.join(REPO, "BASELINE.md")) as f:
        text = f.read()
    for name in set(re.findall(r"benchmarks/([\w.\-]+\.json)", text)):
        path = os.path.join(REPO, "benchmarks", name)
        if os.path.exists(path):
            with open(path) as f:
                json.load(f)
