"""Design the 512-tap pseudo-QMF prototype window embedded in
``i3cols_spark/functions/mpeg_audio.py`` (PROTOTYPE_WINDOW_B85).

The MPEG-1 filterbank topology (ISO 11172-3 §A.2 synthesis / §C.1.3
analysis flowcharts) is closed-form EXCEPT for the 512-coefficient
prototype window, which the spec ships as a table (Annex B.3) with no
closed form and which this container has no copy of.  Rather than
reproduce 512 values from memory (a single wrong value silently
corrupts PCM and is unlocalizable), this script DESIGNS a
near-perfect-reconstruction prototype for the same topology:

  * Start from a Kaiser-windowed sinc lowpass (cutoff 1.149·π/64,
    β=11.4 — grid-searched for round-trip SNR).
  * Key structural fact: with the ISO buffer flowcharts, an input
    sample at phase p touches exactly ONE polyphase branch of the
    analysis window (the 16 taps j ≡ (31−p) mod 32), and the
    synthesis response decomposes into 64 small per-direction
    responses.  Reconstruction error at every phase is therefore a
    LINEAR function of one 16-tap branch given the synthesis window.
  * Alternate: fix D = 32·σ·h, solve each branch's 16 taps by least
    squares against "unit peak at delay 481, zero at ±32m echo lags",
    damp 0.5, repeat.  (Do NOT re-symmetrize between rounds — the
    symmetrizer mixes branch pairs and undoes the LS solution; the
    converged window is symmetric to ~3e-4 on its own.)

Converged result (printed by this script, asserted by
tests/test_codecs.py): white-noise round-trip SNR ≈ 78 dB, sine SNR
≈ 81 dB flat across the band, unity gain ±2e-6, delay exactly 481
samples (the ISO figure), worst per-phase impulse residual −63 dB.
This is NOT the bit-exact ISO Annex B.3 table: third-party encoded
streams decode through it with ~−60 dB extra error, and bit-exact
parity with reference decoders is not claimed.  Swapping in the ISO
table is a one-constant change (PROTOTYPE_WINDOW_B85).

Run:  python scripts/design_qmf_window.py   → prints the b85 blob.
"""

from __future__ import annotations

import base64

import numpy as np

N = 512
NMAT = np.cos(
    (16 + np.arange(64))[:, None] * (2 * np.arange(32) + 1)[None, :] * np.pi / 64
)
MMAT = np.cos(
    (2 * np.arange(32) + 1)[:, None] * (np.arange(64) - 16)[None, :] * np.pi / 64
)


def _sigma() -> np.ndarray:
    return np.where((np.arange(N) // 64) % 2 == 0, 1.0, -1.0)


def analyze(x: np.ndarray, C: np.ndarray) -> np.ndarray:
    ngr = len(x) // 32
    X = np.zeros(N)
    S = np.empty((ngr, 32))
    for g in range(ngr):
        X[32:] = X[:-32]
        X[:32] = x[g * 32 : (g + 1) * 32][::-1]
        S[g] = MMAT @ (C * X).reshape(8, 64).sum(axis=0)
    return S


def synthesize(S: np.ndarray, D: np.ndarray) -> np.ndarray:
    ngr = S.shape[0]
    V = np.zeros(1024)
    out = np.empty(ngr * 32)
    for g in range(ngr):
        V[64:] = V[:-64]
        V[:64] = NMAT @ S[g]
        U = np.empty(512)
        for i in range(8):
            U[64 * i : 64 * i + 32] = V[128 * i : 128 * i + 32]
            U[64 * i + 32 : 64 * i + 64] = V[128 * i + 96 : 128 * i + 128]
        out[g * 32 : (g + 1) * 32] = (U * D).reshape(16, 32).sum(axis=0)
    return out


def kaiser_seed(alpha: float = 1.149, beta: float = 11.4) -> np.ndarray:
    m = np.arange(N) - (N - 1) / 2.0
    return (alpha / 64.0) * np.sinc(alpha * m / 64.0) * np.kaiser(N, beta)


def design(rounds: int = 30, lam: float = 1e-9, damp: float = 0.5) -> np.ndarray:
    sig = _sigma()
    echo_lags = [32 * m for m in range(-12, 13) if m != 0]
    h = kaiser_seed()
    for _ in range(rounds):
        D = 32.0 * h * sig
        # 64 per-direction synthesis responses: R[d] = response to one
        # group S = MMAT[:, d] followed by silence.
        R = np.empty((64, 24 * 32))
        for d in range(64):
            S = np.zeros((24, 32))
            S[0] = MMAT[:, d]
            R[d] = synthesize(S, D)
        Cnew = np.empty(N)
        for p in range(32):
            j0 = (31 - p) % 32
            js = j0 + 32 * np.arange(16)
            q = 32 * 20 + p
            peak = q + 481
            lags = [0] + echo_lags
            A = np.zeros((len(lags), 16))
            for t in range(16):
                j = js[t]
                g = (q + j - 31) // 32
                for li, lg in enumerate(lags):
                    n = peak + lg - 32 * g
                    if 0 <= n < R.shape[1]:
                        A[li, t] = R[j % 64][n]
            b = np.zeros(len(lags))
            b[0] = 0.25
            AA = np.vstack([A, np.sqrt(lam) * np.eye(16)])
            bb = np.concatenate([b, np.sqrt(lam) * (sig * h)[js]])
            sol, *_ = np.linalg.lstsq(AA, bb, rcond=None)
            Cnew[js] = sol
        h = damp * h + (1 - damp) * (sig * Cnew)
    return h


def main() -> None:
    h = design()
    blob = base64.b85encode(h.astype("<f8").tobytes()).decode("ascii")
    # round-trip report
    sig = _sigma()
    C, D = h * sig, 4.0 * 32.0 * h * sig
    rng = np.random.default_rng(7)
    x = rng.standard_normal(32 * 300)
    y = synthesize(analyze(x, C), D)
    seg_y, seg_x = y[481 : 481 + 6000], x[:6000]
    g = float(np.dot(seg_y, seg_x) / np.dot(seg_x, seg_x))
    err = seg_y - g * seg_x
    snr = 10 * np.log10(np.dot(g * seg_x, g * seg_x) / np.dot(err, err))
    print(f"# noise SNR {snr:.1f} dB, gain {g:.8f}, delay 481")
    print(f"# b85 length {len(blob)}")
    for i in range(0, len(blob), 72):
        print(f'    "{blob[i:i+72]}"')


if __name__ == "__main__":
    main()
