#!/usr/bin/env python3
"""Independent golden generator for the gated q_binary_scan query.

Recomputes, in plain Python with NO access to the Scala code under test,
the exact table that graft's DicomLike V2 source must extract from the
canonical fixture tree defined in
src/main/scala/graft/sources/DicomFixtures.scala, and writes it to
tools/golden/binary_scan_golden.parquet (the DuckDB oracle replays it).

Mirrored contracts (any drift breaks the driver's hash gate, by design):
  - container layout: b"GDCM" | int32 BE metaLen | sorted "k=v" lines
    joined by "\n" (UTF-8, ImageShape serialized as "AxBxC") | payload
  - payload byte i of volume seed s: (i*31 + s*7 + 11) mod 256
  - pixel_checksum: signed-64-bit fold sum = sum*31 + byte over payload
  - frames decode valid iff product(shape) == payload length; stats are
    uint8 min/max and mean = exact integer sum / count (IEEE double)
"""
import os
import struct

import duckdb
import pandas as pd

VOLUMES = [
    # (patient, study, uid, extra_fields, shape, seed, payload_len)
    ("EA1141-8001", "19400101", "vol-a1",
     {"FrameLaterality": "R", "SliceThickness": "1", "Modality": "MG",
      "SeriesDescription": "R CC Breast Tomosynthesis Image"},
     (4, 6, 5), 1, 120),
    ("EA1141-8001", "19400101", "vol-a2",
     {"FrameLaterality": "L", "SliceThickness": "2", "Modality": "MG",
      "SeriesDescription": "L MLO Breast Tomosynthesis Image"},
     (3, 8, 7), 2, 168),
    ("EA1141-8002", "19500101", "vol-b1",
     {"FrameLaterality": "R", "Modality": "MG",
      "SeriesDescription": "R CC FFDM"},
     (9, 11), 3, 99),
    ("EA1141-8002", "19500101", "vol-b2",
     {"FrameLaterality": "L", "ViewModifier": "Spot Compression",
      "Modality": "MG",
      "SeriesDescription": "L CC Breast Tomosynthesis Image"},
     (5, 10, 10), 4, 77),
    ("EA1141-8003", "19600101", "vol-c1",
     {"Modality": "MR", "SeriesDescription": "AX T1"},
     (2, 3, 4), 5, 24),
]
CORRUPT = ("corrupt.dcm", len("not a GDCM container at all".encode("utf-8")))


def payload(seed, n):
    return bytes((i * 31 + seed * 7 + 11) & 0xFF for i in range(n))


def checksum(buf):
    s = 0
    for b in buf:
        s = (s * 31 + b) & 0xFFFFFFFFFFFFFFFF
    return s - (1 << 64) if s >= (1 << 63) else s


def meta_len(patient, study, uid, fields, shape):
    kv = dict(fields)
    kv.update({
        "SOPInstanceUID": uid, "PatientID": patient,
        "StudyInstanceUID": f"st-{patient}-{study}",
        "SeriesInstanceUID": f"se-{uid}",
        "ImageShape": "x".join(str(d) for d in shape),
    })
    meta = "\n".join(f"{k}={v}" for k, v in sorted(kv.items()))
    return len(meta.encode("utf-8"))


def main():
    rows = []
    for patient, study, uid, fields, shape, seed, n_pay in VOLUMES:
        pay = payload(seed, n_pay)
        prod = 1
        for d in shape:
            prod *= d
        decodable = prod == n_pay
        rows.append({
            "file_name": f"{uid}.dcm",
            "length": 4 + 4 + meta_len(patient, study, uid, fields, shape) + n_pay,
            "uid": uid,
            "patient": patient,
            "modality": fields.get("Modality"),
            "shape": "x".join(str(d) for d in shape),
            "pixel_bytes": n_pay,
            "pixel_checksum": checksum(pay),
            "n_frames": shape[0] if decodable else None,
            "px_min": min(pay) if decodable else None,
            "px_max": max(pay) if decodable else None,
            "px_mean": sum(pay) / float(n_pay) if decodable else None,
        })
    rows.append({
        "file_name": CORRUPT[0], "length": CORRUPT[1],
        "uid": None, "patient": None, "modality": None, "shape": None,
        "pixel_bytes": None, "pixel_checksum": None, "n_frames": None,
        "px_min": None, "px_max": None, "px_mean": None,
    })
    # dtype=object keeps 64-bit checksums as exact Python ints — a float64
    # pass-through would round them (observed: ...644612 -> ...644800).
    # Second golden: per-slice stats of every DECODABLE volume (the
    # q_frame_stats twin) — one row per leading-axis slice.
    frame_rows = []
    for patient, study, uid, fields, shape, seed, n_pay in VOLUMES:
        prod = 1
        for d in shape:
            prod *= d
        if prod != n_pay:
            continue
        pay = payload(seed, n_pay)
        per = prod // shape[0]
        for s in range(shape[0]):
            sl = pay[s * per:(s + 1) * per]
            frame_rows.append({
                "uid": uid, "slice": s, "n_px": per,
                "px_min": min(sl), "px_max": max(sl),
                "px_mean": sum(sl) / float(per),
            })
    fdf = pd.DataFrame(frame_rows, dtype=object).sort_values(
        ["uid", "slice"]).reset_index(drop=True)
    for c in ("slice", "n_px", "px_min", "px_max"):
        fdf[c] = pd.array([int(v) for v in fdf[c]], dtype="Int64")
    fdf["px_mean"] = pd.array([float(v) for v in fdf["px_mean"]], dtype="float64")

    df = pd.DataFrame(rows, dtype=object).sort_values("file_name").reset_index(drop=True)
    for c in ("length", "pixel_bytes", "pixel_checksum", "n_frames",
              "px_min", "px_max"):
        df[c] = pd.array([None if v is None else int(v) for v in df[c]],
                         dtype="Int64")
    df["px_mean"] = pd.array([None if v is None else float(v) for v in df["px_mean"]],
                             dtype="float64")
    out = os.path.join(os.path.dirname(__file__), "golden",
                       "binary_scan_golden.parquet")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    con = duckdb.connect()
    con.register("t", df)
    con.execute(f"COPY (SELECT * FROM t) TO '{out}' (FORMAT PARQUET)")
    print(df.to_string())
    print(f"wrote {out}")
    fout = os.path.join(os.path.dirname(__file__), "golden",
                        "frame_stats_golden.parquet")
    con.register("ft", fdf)
    con.execute(f"COPY (SELECT * FROM ft) TO '{fout}' (FORMAT PARQUET)")
    print(fdf.to_string())
    print(f"wrote {fout}")


if __name__ == "__main__":
    main()
