#!/usr/bin/env python3
"""Independent golden generator for the gated q_frame_cuts query
(temporal shot-boundary detection over multi-frame volumes).

Recomputes, in plain Python with NO access to the Scala code under
test, the expected per-frame SAD table over the planted fixture tree
defined in src/main/scala/graft/sources/VideoFixtures.scala, and
writes tools/golden/video_cuts_golden.parquet (the DuckDB oracle
replays it).

Mirrored contracts (any drift breaks the driver's hash gate, by
design):
  - shape 24x8x8 (24 frames of 8x8 uint8), segment s = t//8;
  - px(t,r,c) = (r*8 + c) * mults[s] + t*2 (always < 256, no wrap);
  - volumes: vid-cuts mults=[1,2,3] (cuts at t=8,16),
    vid-smooth mults=[2,2,2] (no cuts); the 2-D still is excluded by
    the ndim==3 filter on the Scala side and simply absent here;
  - sad(t) = sum |px(t) - px(t-1)| over the frame, t = 1..23;
  - is_cut iff sad > 16 * n_px (exact integers, n_px = 64).
"""
import os

import duckdb
import pandas as pd

HERE = os.path.dirname(os.path.abspath(__file__))
NT, ROWS, COLS = 24, 8, 8

VOLUMES = [("vid-cuts", [1, 2, 3]), ("vid-smooth", [2, 2, 2])]


def frame(mults, t):
    return [(r * 8 + c) * mults[t // 8] + t * 2
            for r in range(ROWS) for c in range(COLS)]


def main():
    rows = []
    for uid, mults in VOLUMES:
        frames = [frame(mults, t) for t in range(NT)]
        for t in range(1, NT):
            sad = sum(abs(a - b) for a, b in zip(frames[t], frames[t - 1]))
            rows.append(dict(uid=uid, t=t, sad=sad,
                             is_cut=sad > 16 * ROWS * COLS))
    df = pd.DataFrame(rows)
    con = duckdb.connect()
    con.register("v", df)
    con.execute(
        "COPY (SELECT uid, CAST(t AS INTEGER) t, CAST(sad AS BIGINT) sad,"
        " is_cut FROM v ORDER BY uid, t)"
        f" TO '{HERE}/golden/video_cuts_golden.parquet' (FORMAT PARQUET)")
    cuts = [(r["uid"], r["t"]) for r in rows if r["is_cut"]]
    print("rows:", len(rows), "cuts:", cuts)
    assert cuts == [("vid-cuts", 8), ("vid-cuts", 16)], cuts


if __name__ == "__main__":
    main()
