#!/usr/bin/env python3
"""Independent golden generator for the gated q_frame_phash_near query.

Recomputes, in plain Python with NO access to the Scala code under test,
the expected perceptual-near-dup pair table over the planted fixture
tree defined in src/main/scala/graft/sources/DicomNearDupFixtures.scala,
and writes it to tools/golden/phash_near_golden.parquet (the DuckDB
oracle replays it).

Mirrored contracts (any drift breaks the driver's hash gate, by design):
  - every volume has shape 2x16x16 (2 slices of 16x16 uint8);
  - base payload byte i for sawtooth multiplier m: (i*m + 7) mod 200;
    variant "bright" adds 40 to every byte (never clamps: 199+40=239);
    variant "spot" sets slice-0 rows 0-1 x cols 0-1 to 255;
  - aHash64: 8x8 grid, cell (gi,gj) covers rows [gi*rows/8,(gi+1)*rows/8)
    x cols [gj*cols/8,(gj+1)*cols/8) (integer division); bit gi*8+gj set
    iff cellSum*N > frameSum*cellCount (exact integers, no floats);
  - the pair set: frames from DIFFERENT volumes (uid_a < uid_b) whose
    hashes differ in at most 3 bits. (The Scala side reaches the same
    set through 16-bit band blocking - hamming<=3 pigeonholes an exact
    band match - so the semantic truth here is just the thresholded
    all-pairs set.)
"""
import os

import duckdb
import pandas as pd

SHAPE = (2, 16, 16)

VOLUMES = [
    # (uid, mult, variant)
    ("nd-a1", 13, "base"),
    ("nd-a2", 13, "bright"),
    ("nd-a3", 13, "spot"),
    ("nd-b1", 57, "base"),
    ("nd-b2", 57, "bright"),
    ("nd-c1", 101, "base"),
]


def pixels(mult, variant):
    n_sl, rows, cols = SHAPE
    out = []
    for i in range(n_sl * rows * cols):
        base = (i * mult + 7) % 200
        if variant == "bright":
            px = base + 40
        elif variant == "spot":
            sl = i // (rows * cols)
            r = (i % (rows * cols)) // cols
            c = i % cols
            px = 255 if (sl == 0 and r < 2 and c < 2) else base
        else:
            px = base
        out.append(px)
    return out


def ahash64(px, rows, cols):
    n = rows * cols
    s = sum(px)
    h = 0
    for gi in range(8):
        r0, r1 = gi * rows // 8, (gi + 1) * rows // 8
        for gj in range(8):
            c0, c1 = gj * cols // 8, (gj + 1) * cols // 8
            nb = (r1 - r0) * (c1 - c0)
            if nb == 0:
                continue
            sb = sum(px[r * cols + c] for r in range(r0, r1)
                     for c in range(c0, c1))
            if sb * n > s * nb:
                h |= 1 << (gi * 8 + gj)
    return h


def main():
    n_sl, rows, cols = SHAPE
    per = rows * cols
    frames = []  # (uid, slice, hash)
    for uid, mult, variant in VOLUMES:
        px = pixels(mult, variant)
        for s in range(n_sl):
            frames.append((uid, s, ahash64(px[s * per:(s + 1) * per],
                                           rows, cols)))
    pairs = []
    for i, (ua, sa, ha) in enumerate(frames):
        for ub, sb, hb in frames[i + 1:]:
            if ua >= ub:
                continue
            d = bin(ha ^ hb).count("1")
            if d <= 3:
                pairs.append({"uid_a": ua, "slice_a": sa,
                              "uid_b": ub, "slice_b": sb, "hamming": d})
    pairs.sort(key=lambda p: (p["uid_a"], p["slice_a"],
                              p["uid_b"], p["slice_b"]))
    df = pd.DataFrame(pairs, dtype=object).reset_index(drop=True)
    for c in ("slice_a", "slice_b", "hamming"):
        df[c] = pd.array([int(v) for v in df[c]], dtype="Int64")
    out = os.path.join(os.path.dirname(__file__), "golden",
                       "phash_near_golden.parquet")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    con = duckdb.connect()
    con.register("t", df)
    con.execute(f"COPY (SELECT * FROM t) TO '{out}' (FORMAT PARQUET)")
    print(df.to_string())
    print(f"wrote {out} ({len(df)} pairs)")


if __name__ == "__main__":
    main()
