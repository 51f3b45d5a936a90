#!/usr/bin/env python3
"""Promote a clean bench artifact to a committed regime-fingerprint
baseline (round-13 verdict item 6: the host floor has held for 4+
rounds, so the anchors are re-based onto it to restore discriminating
power — an anchor nobody can reach flags every run as 'floor' and a
real 25% regression hides inside that reading).

Usage:
  python3 tools/make_baseline.py <artifact.json> <grain> "<note>"
  python3 tools/make_baseline.py --min <a1.json> <a2.json> [...] <grain> "<note>"
  grain in {sf01, 10x, 100x}

Single-artifact mode refuses artifacts with errors, contention, or a
non-empty outlier set. --min mode takes the per-query MINIMUM across
several SAME-TREE zero-error artifacts (the cross-run form of Bench's
own best-of-reps rule — a shared-host noise spike never survives into
the anchor as long as ONE run saw the query clean); the synthesized
total is the sum of mins and every source is named in the provenance.
Either way the artifact's own fingerprint block is stripped (a baseline
must not carry a comparison against its predecessor) and the replaced
baseline is kept at tools/golden/history/bench_baseline_<grain>_<n>.json.
"""
import json
import os
import shutil
import sys


def load_checked(path, allow_contended):
    with open(path) as f:
        art = json.load(f)
    errs = art.get("errors") or {}
    assert not errs, f"{path} has errors: {list(errs)[:5]}"
    if not allow_contended:
        assert art.get("contended") is False, f"{path} is contended"
    return art


def main():
    if sys.argv[1] == "--min":
        paths, grain, note = sys.argv[2:-2], sys.argv[-2], sys.argv[-1]
        assert len(paths) >= 2, "--min needs at least two artifacts"
        arts = [load_checked(p, allow_contended=True) for p in paths]
        assert any(a.get("contended") is False for a in arts), \
            "--min needs at least one uncontended artifact"
        keys = set(arts[0]["queries"])
        for a in arts[1:]:
            assert set(a["queries"]) == keys, "query sets differ across artifacts"
        art = dict(arts[0])
        art["queries"] = {k: min(a["queries"][k] for a in arts) for k in keys}
        art["value"] = sum(art["queries"].values())
        art["synthesized"] = "per-query min across sources"
        for k in ("canary", "loadavg", "steal_frac", "contended",
                  "contended_by", "wall_sec"):
            art.pop(k, None)
        src = [os.path.basename(p) for p in paths]
    else:
        art_path, grain, note = sys.argv[1], sys.argv[2], sys.argv[3]
        art = load_checked(art_path, allow_contended=False)
        fp = art.get("fingerprint") or {}
        if fp:
            assert fp.get("outliers") in (None, {},), \
                f"artifact has fingerprint outliers: {fp.get('outliers')}"
        src = os.path.basename(art_path)
    assert grain in ("sf01", "10x", "100x"), grain
    art.pop("fingerprint", None)
    art.pop("regime", None)
    art["baseline_provenance"] = {
        "source_artifact": src,
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
