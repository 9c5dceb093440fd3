#!/usr/bin/env python3
"""Host-window calibration for the per-round bench.

Problem this solves (round-14 adjudication): the shared host's
throughput oscillates ~±20% between rounds, so a BENCH_r{N}.json total
cannot be compared to BENCH_r{N-1}.json directly — a judge must either
re-run both binaries quietly or guess the window skew. The fix is
mechanical: at round close, bench the PRIOR round's committed binary
INTERLEAVED with HEAD in the same session, and record the anchor series
inside BENCH_DETAIL.json. The next judge divides HEAD/anchor measured
in the SAME window instead of re-deriving the host factor:

    true_ratio ≈ (head_total / anchor_total)          # this session
    host_factor ≈ anchor_total / anchor_round_record  # window vs record

Usage:
    python3 tools/bench_anchor.py <anchor_commit> [sf_dir] [runs]

- anchor_commit: the prior round's final commit (e.g. the round tag).
- sf_dir: defaults to /root/testdata/sf0.1 (the driver's bench tier).
- runs: interleaved pairs (default 2 → HEAD,ANCHOR,HEAD,ANCHOR).

Builds the anchor in a shared-object clone under /tmp/graft_anchor (the
repo itself is never touched), runs `sbt runMain graft.Bench` in each
tree alternately, then rewrites /root/repo/BENCH_DETAIL.json as the
HEAD detail plus an "anchor" object carrying both series. Dev tooling
only — not part of the shipped library.
"""
import json
import os
import shutil
import subprocess
import sys

REPO = "/root/repo"
CLONE = "/tmp/graft_anchor"


def run_bench(tree, sf_dir):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS="32")
    subprocess.run(["sbt", "-batch", "runMain graft.Bench"], cwd=tree,
                   env=env, check=True, stdout=subprocess.DEVNULL,
                   stderr=subprocess.DEVNULL)
    with open(f"{tree}/BENCH_DETAIL.json") as f:
        return json.load(f)


def main():
    anchor_commit = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    if os.path.exists(CLONE):
        shutil.rmtree(CLONE)
    subprocess.run(["git", "clone", "--shared", "--quiet", REPO, CLONE],
                   check=True)
    subprocess.run(["git", "checkout", "--quiet", anchor_commit],
                   cwd=CLONE, check=True)
    subprocess.run(["sbt", "-batch", "compile"], cwd=CLONE, check=True,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    subprocess.run(["sbt", "-batch", "compile"], cwd=REPO, check=True,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)

    # alternate within-pair order (H,A then A,H): on a host whose load
    # decays or grows monotonically through the session, a fixed order
    # biases whichever side always runs first — alternating cancels the
    # first-order drift out of the pooled ratio
    head_series, anchor_series = [], []
    for i in range(runs):
        order = [("HEAD", REPO, head_series),
                 (f"anchor {anchor_commit}", CLONE, anchor_series)]
        if i % 2 == 1:
            order.reverse()
        for label, tree, series in order:
            print(f"[anchor] pair {i + 1}/{runs}: {label} ...", flush=True)
            series.append(run_bench(tree, sf_dir))

    # HEAD detail = the LAST head run (same window as the last anchor);
    # the anchor object carries every sample of both series so a judge
    # can see the within-session spread, not just one division.
    # The anchor ALSO lands in BENCH_ANCHOR.json: graft.Bench re-attaches
    # it on every BENCH_DETAIL.json rewrite, so the driver's own
    # round-close bench run cannot clobber the calibration.
    # the HEAD commit actually measured: later commits make the anchor
    # stale, and without this field a reader cannot tell — graft.Bench
    # re-attaches the anchor verbatim on every BENCH_DETAIL rewrite
    head_commit = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=REPO, check=True,
        capture_output=True, text=True).stdout.strip()
    head_dirty = subprocess.run(
        ["git", "status", "--porcelain"], cwd=REPO, check=True,
        capture_output=True, text=True).stdout.strip() != ""
    detail = dict(head_series[-1])
    detail["anchor"] = {
        "commit": anchor_commit,
        "head_commit": head_commit,
        "head_dirty": head_dirty,
        "sf": sf_dir,
        "head_samples": [
            {"value": h["value"], "query_total": h["query_total"],
             "setup_total": h["setup_total"]} for h in head_series],
        "anchor_samples": [
            {"value": a["value"], "query_total": a["query_total"],
             "setup_total": a["setup_total"]} for a in anchor_series],
        "anchor_queries": anchor_series[-1]["queries"],
        "ratio_total": round(
            sum(h["value"] for h in head_series) /
            sum(a["value"] for a in anchor_series), 4),
        "ratio_query_total": round(
            sum(h["query_total"] for h in head_series) /
            sum(a["query_total"] for a in anchor_series), 4),
    }
    with open(f"{REPO}/BENCH_ANCHOR.json", "w") as f:
        json.dump(detail["anchor"], f)
    with open(f"{REPO}/BENCH_DETAIL.json", "w") as f:
        json.dump(detail, f)
    print(f"[anchor] ratio_total={detail['anchor']['ratio_total']} "
          f"ratio_query_total={detail['anchor']['ratio_query_total']} "
          f"(HEAD/anchor, same host window)", flush=True)


if __name__ == "__main__":
    main()
