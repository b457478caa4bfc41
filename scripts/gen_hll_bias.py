#!/usr/bin/env python
"""Generate the empirical bias table for the repo's HLL sketch
(m=256, 60-bit md5-derived hash, rho = 53 - bitlength(h div 256)).

Methodology is HLL++'s (Heule, Nunkesser, Hall: "HyperLogLog in
Practice", EDBT 2013): for a grid of true cardinalities n, simulate
K sketches of n iid uniform hashes, record (mean raw estimate,
mean raw estimate - n); at query time the correction interpolates
bias as a piecewise-linear function of the RAW estimate. We generate
our own table rather than copying the paper's because our register
geometry (60-bit hash, 52-bit rho domain) and estimator layout are
repo-specific; the published tables are for a different hash width.

Run: python scripts/gen_hll_bias.py
Prints the full measured grid for inspection, then the KEEP-knot
arrays to paste into operators/curation.py — exactly the committed
constants (the tail knots past KEEP are measured but REJECTED: their
"bias" is inside the simulation stderr, and correcting with noise
would inject it — see the table comment in curation.py). The
simulation is seeded — re-running reproduces the committed constants
exactly.
"""

from __future__ import annotations

import numpy as np

M = 256
ALPHA = 0.7213 / (1.0 + 1.079 / 256.0)
TWO53 = float(1 << 53)
SEED = 20260816
# 30000 trials/knot puts the simulation stderr ~0.35 counts — small
# enough that the 2-sigma keep rule below separates real tail bias
# from noise (ADVICE r13: at 3000 trials the last committed knots
# were within ~1.1 stderr, i.e. the correction's tail was fitting
# noise). ~35s total.
TRIALS = 30000

# Correction zone: raw estimates between the linear-counting handoff
# (~2.5m) and where the raw estimator's bias fades into its stderr
# (~7m for this geometry, measured below). Grid is denser near the
# handoff where the bias curve is steepest.
GRID_N = [
    480, 560, 640, 720, 800, 880, 960, 1040, 1120, 1200,
    1280, 1360, 1440, 1520, 1600, 1680, 1760, 1840, 1920, 2048,
]


def raw_estimate(h: np.ndarray) -> float:
    """One sketch fold, identical to the engine's integer-exact
    denominator: reg = h % m, w = h >> 8, rho = 53 - bitlength(w)
    (53 if w == 0); empty registers contribute 2^53."""
    reg = (h % M).astype(np.int64)
    w = h >> 8
    # bitlength via frexp: w < 2^52 is exact in float64
    _, exp = np.frexp(w.astype(np.float64))
    rho = np.where(w == 0, 53, 53 - exp).astype(np.int64)
    mx = np.zeros(M, dtype=np.int64)
    np.maximum.at(mx, reg, rho)
    # mx == 0 -> empty register -> contributes 2^(53-0) = 2^53
    denom = float(np.sum(np.exp2(53 - mx)))
    return ALPHA * M * M * (TWO53 / denom)


def main() -> None:
    rng = np.random.default_rng(SEED)
    raw_knots: list[float] = []
    bias_knots: list[float] = []
    stderrs: list[float] = []
    for n in GRID_N:
        ests = np.empty(TRIALS)
        for t in range(TRIALS):
            h = rng.integers(0, 1 << 60, size=n, dtype=np.uint64).astype(
                np.int64
            )
            ests[t] = raw_estimate(h)
        mean_raw = float(np.mean(ests))
        raw_knots.append(round(mean_raw, 4))
        bias_knots.append(round(mean_raw - n, 4))
        stderr = float(np.std(ests) / np.sqrt(TRIALS))
        stderrs.append(stderr)
        print(
            f"n={n:5d} raw_mean={mean_raw:9.2f} bias={mean_raw - n:+8.2f} "
            f"(+-{stderr:.2f}) rel_bias={100 * (mean_raw - n) / n:+.2f}%"
        )
    # keep the PREFIX of knots whose measured |bias| clears 2x the
    # simulation stderr (the correction zone must stay contiguous so
    # the zero-above-last-knot rule is a clean handoff); the first
    # noise-level knot ends the zone — correcting with noise injects
    # it (ADVICE r13).
    keep = 0
    for b, se in zip(bias_knots, stderrs):
        if abs(b) < 2.0 * se:
            break
        keep += 1
    if keep == 0:
        # An empty committed table would crash curation.py at import
        # (HLL_BIAS_RAW[0]) and ship a degenerate zero-correction
        # sketch (ADVICE r14) — refuse to print one.
        raise SystemExit(
            "FATAL: 2-sigma prefix rule kept 0 knots — the first knot's "
            "|bias| is below 2x sim stderr. Raise TRIALS (stderr too "
            "high) or re-check the grid; do NOT commit an empty table."
        )
    print(f"\n# committed zone: first {keep} knots (2-sigma prefix rule;"
          " tail = sim noise)")
    print("HLL_BIAS_RAW =", raw_knots[:keep])
    print("HLL_BIAS =", bias_knots[:keep])


if __name__ == "__main__":
    main()
