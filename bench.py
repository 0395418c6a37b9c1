"""Benchmark: frame-Viterbi cell updates per second on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Cell definition (BASELINE.md / SURVEY.md §6): one cell = one (l, t, k)
M/I/D update of the frame Viterbi (~9 min-plus ops, c-core/viterbi.c:526-541
equivalent).  Cells per window = L * 5 durations * K nodes, counting TRUE
profile nodes only (lane padding is our overhead, not useful work).

vs_baseline normalizes against the multithreaded c-core reference on a
server CPU.  The reference publishes no throughput numbers and its C deps
are not vendored, so the baseline is measured locally from our native C++
re-implementation of the reference's striped kernel when available
(native/), else a documented 14 GCUPS estimate (8 threads x AVX2 8 lanes x
~3 GHz x ~2 vector-min-plus/cycle / 9 ops-per-cell).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

CPU_BASELINE_GCUPS_FALLBACK = 14.0


def measured_cpu_baseline() -> float | None:
    """GCUPS of the native C++ baseline kernel, if built (native/)."""
    try:
        from deciphon_tpu.native import cpu_baseline_gcups

        return cpu_baseline_gcups()
    except Exception:
        return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--profiles", type=int, default=8)
    ap.add_argument("--core-size", type=int, default=400)
    ap.add_argument("--windows", type=int, default=64)
    ap.add_argument("--length", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--engine", choices=["pallas", "jax"], default="pallas")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    if args.quick:
        args.profiles, args.core_size = 2, 64
        args.windows, args.length, args.iters = 8, 512, 2

    from deciphon_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from deciphon_tpu.ops.costs import build_costs
    from deciphon_tpu.profile import sample_profile
    from deciphon_tpu.scan.sequence import frag_codes_ending
    from deciphon_tpu.xtrans import xtrans_cost_vector

    costs = [build_costs(sample_profile(seed=100 + i, core_size=args.core_size))
             for i in range(args.profiles)]

    rng = np.random.default_rng(3)
    B, L = args.windows, args.length
    codes = np.zeros((B, L, 5), dtype=np.int32)
    xt = np.zeros((B, 13), dtype=np.float32)
    for b in range(B):
        seq = rng.integers(0, 4, size=L).astype(np.int8)
        codes[b] = frag_codes_ending(seq)
        xt[b] = xtrans_cost_vector(True, False, L)
    lengths = np.full((B,), L, dtype=np.int32)

    if args.engine == "pallas":
        from deciphon_tpu.ops.viterbi_pallas import PallasScanEngine

        eng = PallasScanEngine(costs)

        def run():
            return eng.scores(xt, codes, lengths)
    else:
        from deciphon_tpu.ops.engine import ProfilePack, scan_scores_jit

        pack = ProfilePack.from_costs(costs)
        dev_args = [jnp.asarray(a) for a in
                    (pack.core, pack.match, pack.null, pack.background,
                     xt, codes, lengths)]

        def run():
            out = scan_scores_jit(*dev_args)
            jax.block_until_ready(out)
            return out

    nul, alt = run()  # warmup / compile

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        nul, alt = run()
        times.append(time.perf_counter() - t0)
    dt = min(times)

    cells = args.profiles * B * L * 5 * args.core_size
    gcups = cells / dt / 1e9

    baseline = measured_cpu_baseline()
    baseline_src = "native-cpp"
    if baseline is None:
        baseline, baseline_src = CPU_BASELINE_GCUPS_FALLBACK, "estimate"

    print(json.dumps({
        "metric": "viterbi_gcups",
        "value": round(gcups, 3),
        "unit": "GCUPS/chip",
        "vs_baseline": round(gcups / baseline, 3),
    }))
    print(f"# device={jax.devices()[0].device_kind} engine={args.engine} "
          f"P={args.profiles} K={args.core_size} B={B} L={L} "
          f"dt={dt*1e3:.1f}ms cells={cells} baseline={baseline} "
          f"({baseline_src})", file=sys.stderr)


if __name__ == "__main__":
    main()
