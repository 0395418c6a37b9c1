"""Kernel optimization harness: times viterbi_scores_grid variants.

Run on the real TPU with nothing else using the chip.
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


def workload(P=8, K=400, B=64, L=4096, distinct=False):
    from deciphon_tpu.ops.costs import build_costs
    from deciphon_tpu.ops.viterbi_pallas import PallasScanEngine, pack_windows
    from deciphon_tpu.profile import sample_profile
    from deciphon_tpu.scan.sequence import frag_codes_ending
    from deciphon_tpu.xtrans import xtrans_cost_vector

    if distinct:
        costs = [build_costs(sample_profile(100 + i, K)) for i in range(P)]
    else:
        costs = [build_costs(sample_profile(100, K))] * P
    rng = np.random.default_rng(3)
    codes = np.zeros((B, L, 5), np.int32)
    xt = np.zeros((B, 13), np.float32)
    for b in range(B):
        seq = rng.integers(0, 4, size=L).astype(np.int8)
        codes[b] = frag_codes_ending(seq)
        xt[b] = xtrans_cost_vector(True, False, L)
    lengths = np.full((B,), L, np.int32)
    eng = PallasScanEngine(costs)
    xts, lens, ck = pack_windows(xt, codes, lengths)
    true_cells = P * B * L * 5 * K
    return eng, (jnp.asarray(xts), jnp.asarray(lens), jnp.asarray(ck)), true_cells


def measure(fn, args, true_cells, iters=5, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"{label:30s} dt={dt*1e3:7.1f}ms  GCUPS={true_cells/dt/1e9:6.2f}")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kappa", type=int, default=None)
    ap.add_argument("--distinct", action="store_true")
    args = ap.parse_args()

    from deciphon_tpu.ops import viterbi_pallas as vp

    eng, dev_args, cells = workload(distinct=args.distinct)

    kappas = [args.kappa] if args.kappa else [16, 32, 64, 128]
    for kappa in kappas:
        from deciphon_tpu.ops.viterbi_pallas import pack_windows

        # repack codes for this kappa
        def fn(xts, lens, ck, kappa=kappa):
            return vp.viterbi_scores_grid(eng.tables, eng.tvecs, xts, lens,
                                          ck, kappa=kappa)

        # rebuild ck at this kappa
        import numpy as np

        _, _, ck0 = dev_args
        WG, NLB0, k0, _, W = ck0.shape
        flat = np.asarray(ck0).transpose(0, 1, 2, 4, 3).reshape(
            WG, NLB0 * k0, W, 5)
        Lk = NLB0 * k0
        NLB = -(-Lk // kappa)
        pad = NLB * kappa - Lk
        if pad:
            flat = np.concatenate(
                [flat, np.zeros((WG, pad, W, 5), np.int32)], axis=1)
        ck = jnp.asarray(np.ascontiguousarray(
            flat.reshape(WG, NLB, kappa, W, 5).transpose(0, 1, 2, 4, 3)))
        measure(fn, (dev_args[0], dev_args[1], ck), cells,
                label=f"kappa={kappa}")


if __name__ == "__main__":
    main()
