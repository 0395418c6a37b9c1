"""One-shot kernel ablation run: kappa sweep + gather ablation + prefetch.

Prints each result immediately (tunnel-stall friendly).
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from deciphon_tpu.ops import viterbi_pallas as vp
    from deciphon_tpu.ops.costs import build_costs
    from deciphon_tpu.profile import sample_profile
    from deciphon_tpu.scan.sequence import frag_codes_ending
    from deciphon_tpu.xtrans import xtrans_cost_vector

    P, K, B, L = 8, 400, 64, 4096
    costs = [build_costs(sample_profile(100 + i, K)) for i in range(P)]
    rng = np.random.default_rng(3)
    codes = np.zeros((B, L, 5), np.int32)
    xt = np.zeros((B, 13), np.float32)
    for b in range(B):
        seq = rng.integers(0, 4, size=L).astype(np.int8)
        codes[b] = frag_codes_ending(seq)
        xt[b] = xtrans_cost_vector(True, False, L)
    lengths = np.full((B,), L, np.int32)
    cells = P * B * L * 5 * K
    print("workload ready", flush=True)

    def run_config(label, kappa=32, prefetch=False, patch_gather=None):
        vp.PREFETCH = prefetch
        saved = vp._kernel
        eng = vp.PallasScanEngine(costs)
        xts, lens, ck = vp.pack_windows(xt, codes, lengths, kappa=kappa)
        args = (eng.tables, eng.tvecs, jnp.asarray(xts), jnp.asarray(lens),
                jnp.asarray(ck))
        try:
            out = vp.viterbi_scores_grid(*args, kappa=kappa)
            jax.block_until_ready(out)
            times = []
            for _ in range(4):
                t0 = time.perf_counter()
                out = vp.viterbi_scores_grid(*args, kappa=kappa)
                jax.block_until_ready(out)
                times.append(time.perf_counter() - t0)
            dt = min(times)
            print(f"{label:28s} dt={dt*1e3:7.1f}ms GCUPS={cells/dt/1e9:6.2f}",
                  flush=True)
            return np.asarray(out[0])
        finally:
            vp._kernel = saved
            vp.PREFETCH = False

    base = run_config("kappa=32 (default)")
    for kappa in (16, 64, 128):
        run_config(f"kappa={kappa}", kappa=kappa)
    run_config("kappa=32 prefetch", prefetch=True)
    run_config("kappa=64 prefetch", kappa=64, prefetch=True)

    # gather ablation: constant code (row 0) -> measures non-gather ceiling
    ck0 = np.zeros_like(codes)
    vp.PREFETCH = False
    eng = vp.PallasScanEngine(costs)
    xts, lens, ck = vp.pack_windows(xt, ck0, lengths)
    args = (eng.tables, eng.tvecs, jnp.asarray(xts), jnp.asarray(lens),
            jnp.asarray(ck))
    out = vp.viterbi_scores_grid(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        out = vp.viterbi_scores_grid(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"{'constant-code (cache-hot)':28s} dt={dt*1e3:7.1f}ms "
          f"GCUPS={cells/dt/1e9:6.2f}", flush=True)


if __name__ == "__main__":
    main()
