#!/usr/bin/env python3
"""Independent golden generator for the gated audio queries
(q_audio_features, q_audio_near).

Regenerates the fixture .wav files from the integer formulas in
src/main/scala/graft/sources/WavFixtures.scala (mirrored below — any
drift breaks the driver's hash gate, by design), then DECODES THEM BACK
with Python's stdlib `wave` module — an independent parser of the
public RIFF/WAVE format with no knowledge of the Scala reader. A writer
bug (bad header math, wrong endianness) would make `wave` reject the
bytes or return different samples, so this golden also certifies the
fixture files are real WAV.

Mirrored contracts:
  - sample formulas: gain(w) = ((w*m + 3) % 7) + 1,
    base(i) = ((i*m + 17) % 129) - 64, s(i) = base(i)*gain(i//L)*4,
    L = n//64; scaled variant multiplies samplewise; edit variant
    zeroes whole windows.
  - decode accepts only 16-bit mono PCM: the corrupt file and the
    stereo file land as all-NULL feature rows and are absent from the
    near-dup hash set.
  - features: duration_us = n*1_000_000 // rate (exact division for
    all fixtures), peak_abs = max |s|, energy_sq = sum s^2,
    zero_cross = #{i : (s[i] >= 0) != (s[i-1] >= 0)}.
  - envelope hash: 64 windows of n//64 samples; env[w] = sum |s| over
    window w; bit w set iff env[w]*64 > total (exact ints); pairs =
    files with hamming(h_a, h_b) <= 3, file_a < file_b.
"""
import io
import os
import struct
import wave

import duckdb
import pandas as pd

HERE = os.path.dirname(os.path.abspath(__file__))

SPECS = [
    # (name, mult, n, rate, scale, zero_windows)
    ("a1.wav", 13, 4096, 8000, 1, ()),
    ("a2_scaled.wav", 13, 4096, 8000, 3, ()),
    ("a3_copy.wav", 13, 4096, 8000, 1, ()),
    ("b1.wav", 57, 4096, 8000, 1, ()),
    ("b2_edit.wav", 57, 4096, 8000, 1, (5, 11)),
    ("c1.wav", 101, 2048, 16000, 1, ()),
]


def samples_of(mult, n, scale, zero_windows):
    L = n // 64
    out = []
    for i in range(n):
        if (i // L) in zero_windows:
            out.append(0)
            continue
        gain = ((i // L) * mult + 3) % 7 + 1
        base = (i * mult + 17) % 129 - 64
        out.append(base * gain * 4 * scale)
    return out


def encode(rate, samples):
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(rate)
    w.writeframes(struct.pack("<%dh" % len(samples), *samples))
    w.close()
    return buf.getvalue()


def decode(data):
    """stdlib-wave parse; None unless 16-bit mono PCM."""
    try:
        w = wave.open(io.BytesIO(data), "rb")
    except Exception:
        return None
    if w.getnchannels() != 1 or w.getsampwidth() != 2:
        return None
    rate = w.getframerate()
    n = w.getnframes()
    samples = list(struct.unpack("<%dh" % n, w.readframes(n)))
    return rate, samples


def features(name, decoded):
    if decoded is None:
        return dict(file_name=name, sample_rate=None, n_samples=None,
                    duration_us=None, peak_abs=None, energy_sq=None,
                    zero_cross=None)
    rate, s = decoded
    n = len(s)
    zc = sum(1 for i in range(1, n) if (s[i] >= 0) != (s[i - 1] >= 0))
    return dict(file_name=name, sample_rate=rate, n_samples=n,
                duration_us=n * 1_000_000 // rate,
                peak_abs=max(abs(x) for x in s),
                energy_sq=sum(x * x for x in s),
                zero_cross=zc)


def envelope_hash(s):
    n = len(s)
    assert n % 64 == 0
    L = n // 64
    env = [sum(abs(x) for x in s[w * L:(w + 1) * L]) for w in range(64)]
    total = sum(env)
    h = 0
    for w in range(64):
        if env[w] * 64 > total:
            h |= 1 << w
    return h


def main():
    files = {}
    for name, mult, n, rate, scale, zw in SPECS:
        files[name] = encode(rate, samples_of(mult, n, scale, zw))
    files["corrupt.wav"] = b"RIFFxxxx but decidedly not a wave container"
    # stereo: mirror WavFixtures.stereoBytes via the stdlib writer
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(2)
    w.setsampwidth(2)
    w.setframerate(8000)
    inter = []
    for i in range(64):
        inter += [i * 100 - 3000, 3000 - i * 100]
    w.writeframes(struct.pack("<%dh" % len(inter), *inter))
    w.close()
    files["d1_stereo.wav"] = buf.getvalue()

    feats = [features(name, decode(data))
             for name, data in sorted(files.items())]
    fdf = pd.DataFrame(feats)
    for c in ("sample_rate", "n_samples", "duration_us", "peak_abs",
              "energy_sq", "zero_cross"):
        fdf[c] = fdf[c].astype("Int64")

    hashes = {}
    for name, data in files.items():
        d = decode(data)
        if d is None or len(d[1]) % 64 != 0:
            continue
        hashes[name] = envelope_hash(d[1])
    pairs = []
    names = sorted(hashes)
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            ham = bin(hashes[a] ^ hashes[b]).count("1")
            if ham <= 3:
                pairs.append(dict(file_a=a, file_b=b, hamming=ham))
    pdf = pd.DataFrame(pairs, columns=["file_a", "file_b", "hamming"])
    pdf["hamming"] = pdf["hamming"].astype("int32")

    con = duckdb.connect()
    con.register("f", fdf)
    con.register("p", pdf)
    con.execute(
        "COPY (SELECT file_name, CAST(sample_rate AS INTEGER) sample_rate,"
        " CAST(n_samples AS INTEGER) n_samples,"
        " CAST(duration_us AS BIGINT) duration_us,"
        " CAST(peak_abs AS INTEGER) peak_abs,"
        " CAST(energy_sq AS BIGINT) energy_sq,"
        " CAST(zero_cross AS INTEGER) zero_cross"
        " FROM f ORDER BY file_name)"
        f" TO '{HERE}/golden/wav_features_golden.parquet' (FORMAT PARQUET)")
    con.execute(
        "COPY (SELECT file_a, file_b, CAST(hamming AS INTEGER) hamming"
        " FROM p ORDER BY file_a, file_b)"
        f" TO '{HERE}/golden/wav_near_golden.parquet' (FORMAT PARQUET)")
    print("features rows:", len(fdf))
    print(fdf.to_string())
    print("near pairs:", len(pdf))
    print(pdf.to_string())
    print("hashes:", {k: hex(v) for k, v in hashes.items()})


if __name__ == "__main__":
    main()
