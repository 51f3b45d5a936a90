package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path, Paths}

/** Deterministic WAV fixture tree for the gated audio queries
  * (`q_audio_features`, `q_audio_near`).
  *
  * Every sample value is fixed by integer formulas so the INDEPENDENT
  * golden generator (`tools/gen_wav_golden.py` — stdlib `wave` parse,
  * no knowledge of the Scala code) can recompute the expected feature
  * table and near-dup pair set and commit them as DuckDB goldens.
  *
  * Signal shape: a per-window gain schedule multiplies a small sawtooth
  * so the 64-window amplitude envelope varies by ~7× across windows —
  * envelope-hash bits are decisively above/below the mean rather than
  * borderline. Formulas (window length L = n/64, w = i / L):
  *
  *   gain(w)  = ((w*m + 3) mod 7) + 1
  *   base(i)  = ((i*m + 17) mod 129) − 64
  *   s(i)     = base(i) · gain(i/L) · 4          (|s| ≤ 2048)
  *
  * Planted relationships:
  *   - `a2_scaled` = 3 × `a1` samplewise (|s| ≤ 6144, no clipping):
  *     envelope-hash-identical BY CONSTRUCTION (the hash compares
  *     winSum·64 > totalSum — both sides scale by exactly 3), but a
  *     different PCM checksum — the pair only perceptual dedup finds.
  *   - `a3_copy` = bit-identical copy of `a1` — exact dedup territory.
  *   - `b2_edit` = `b1` with windows 5 and 11 zeroed — a damaged
  *     variant whose true hamming distance the golden computes from
  *     the bytes (no designed value; both sides use exact integers on
  *     identical bytes so they agree deterministically).
  *   - `c1` — different length (2048) and rate (16 kHz): features
  *     must reflect the header, and near-dup still hashes it (64
  *     windows of 32) without pairing it with anything.
  *   - `corrupt.wav` — not a RIFF container: decode → NULL row.
  *   - `d1_stereo.wav` — a REAL two-channel WAV (valid RIFF that
  *     stdlib `wave` parses fine): outside the mono-PCM decode
  *     contract on BOTH sides, so it must land as a NULL row too —
  *     this pins the contract boundary, not just the happy path.
  */
object WavFixtures {

  def gain(w: Int, m: Int): Int = ((w * m + 3) % 7) + 1

  def sample(i: Int, m: Int, n: Int): Int = {
    val base = ((i * m + 17) % 129) - 64
    base * gain(i / (n / 64), m) * 4
  }

  final case class WavSpec(name: String, mult: Int, n: Int, rate: Int,
      scale: Int = 1, zeroWindows: Set[Int] = Set.empty)

  val specs: Seq[WavSpec] = Seq(
    WavSpec("a1.wav", 13, 4096, 8000),
    WavSpec("a2_scaled.wav", 13, 4096, 8000, scale = 3),
    WavSpec("a3_copy.wav", 13, 4096, 8000),
    WavSpec("b1.wav", 57, 4096, 8000),
    WavSpec("b2_edit.wav", 57, 4096, 8000, zeroWindows = Set(5, 11)),
    WavSpec("c1.wav", 101, 2048, 16000))

  def samplesOf(sp: WavSpec): Array[Int] =
    Array.tabulate(sp.n) { i =>
      if (sp.zeroWindows.contains(i / (sp.n / 64))) 0
      else sample(i, sp.mult, sp.n) * sp.scale
    }

  val corruptName = "corrupt.wav"
  val corruptBytes: Array[Byte] =
    "RIFFxxxx but decidedly not a wave container".getBytes("UTF-8")

  val stereoName = "d1_stereo.wav"

  /** A genuine 2-channel 16-bit PCM WAV (stdlib-wave-parseable), 64
    * frames of interleaved L/R — valid audio outside the mono decode
    * contract. */
  def stereoBytes: Array[Byte] = {
    val frames = 64
    val dataLen = frames * 4
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(8000).putInt(8000 * 4)
      .putShort(4).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    (0 until frames).foreach { i =>
      buf.putShort((i * 100 - 3000).toShort)
      buf.putShort((3000 - i * 100).toShort)
    }
    buf.array()
  }

  def defaultRoot: Path =
    Paths.get(System.getProperty("java.io.tmpdir"), "graft_wav_fixture_v1")

  /** Write the canonical tree (idempotent; keyed on a DONE marker). */
  def ensure(root: Path = defaultRoot): Path = synchronized {
    val marker = root.resolve("_FIXTURE_COMPLETE")
    if (Files.exists(marker)) return root
    Files.createDirectories(root)
    specs.foreach { sp =>
      Files.write(root.resolve(sp.name), WavLike.encode(sp.rate, samplesOf(sp)))
    }
    Files.write(root.resolve(corruptName), corruptBytes)
    Files.write(root.resolve(stereoName), stereoBytes)
    Files.write(marker, Array.empty[Byte])
    root
  }
}
