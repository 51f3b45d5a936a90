#!/usr/bin/env python3
"""Promote a clean bench artifact to a committed regime-fingerprint
baseline (round-13 verdict item 6: the host floor has held for 4+
rounds, so the anchors are re-based onto it to restore discriminating
power — an anchor nobody can reach flags every run as 'floor' and a
real 25% regression hides inside that reading).

Usage: python3 tools/make_baseline.py <artifact.json> <grain> "<note>"
  grain in {sf01, 10x, 100x}

Refuses artifacts with errors, contention, or a non-empty outlier set,
and strips the artifact's own fingerprint block (a baseline must not
carry a comparison against its predecessor). The replaced baseline is
kept at tools/golden/history/bench_baseline_<grain>_<n>.json.
"""
import json
import os
import shutil
import sys


def main():
    art_path, grain, note = sys.argv[1], sys.argv[2], sys.argv[3]
    assert grain in ("sf01", "10x", "100x"), grain
    with open(art_path) as f:
        art = json.load(f)
    errs = art.get("errors") or {}
    assert not errs, f"artifact has errors: {list(errs)[:5]}"
    assert art.get("contended") is False, "artifact is contended"
    fp = art.get("fingerprint") or {}
    if fp:
        assert fp.get("outliers") in (None, {},), \
            f"artifact has fingerprint outliers: {fp.get('outliers')}"
    art.pop("fingerprint", None)
    art.pop("regime", None)
    art["baseline_provenance"] = {
        "source_artifact": os.path.basename(art_path),
        "note": note,
    }
    dest = os.path.join(os.path.dirname(__file__), "golden",
                        f"bench_baseline_{grain}.json")
    if os.path.exists(dest):
        hist = os.path.join(os.path.dirname(__file__), "golden", "history")
        os.makedirs(hist, exist_ok=True)
        n = 0
        while os.path.exists(os.path.join(
                hist, f"bench_baseline_{grain}_{n}.json")):
            n += 1
        shutil.copy(dest, os.path.join(
            hist, f"bench_baseline_{grain}_{n}.json"))
        print(f"previous baseline kept at history/bench_baseline_{grain}_{n}.json")
    with open(dest, "w") as f:
        json.dump(art, f)
    print(f"wrote {dest} (total {art['value']:.1f}s, "
          f"{len(art.get('queries', {}))} queries)")


if __name__ == "__main__":
    main()
