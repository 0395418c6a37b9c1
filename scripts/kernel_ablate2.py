"""Kernel ablation v2: gather mode x kappa, error-isolated, prints as it goes.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/kernel_ablate2.py
"""

import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from deciphon_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
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
    eng = vp.PallasScanEngine(costs)
    print("workload ready", flush=True)

    ref = None
    import sys
    configs = [("slot", 32), ("static", 32)]
    if len(sys.argv) > 1:
        configs = [(m, int(k)) for m, k in
                   (c.split("@") for c in sys.argv[1:])]
    for mode, kappa in configs:
        label = f"mode={mode:7s} kappa={kappa}"
        try:
            xts, lens, ck = vp.pack_windows(
                xt, codes, lengths, kappa=kappa,
                slot_major=(mode == "static"))
            args = (eng.tables, eng.tvecs, jnp.asarray(xts),
                    jnp.asarray(lens), jnp.asarray(ck))
            out = vp.viterbi_scores_grid(*args, kappa=kappa, mode=mode)
            jax.block_until_ready(out)
            times = []
            for _ in range(4):
                t0 = time.perf_counter()
                out = vp.viterbi_scores_grid(*args, kappa=kappa, mode=mode)
                jax.block_until_ready(out)
                times.append(time.perf_counter() - t0)
            dt = min(times)
            a = np.asarray(out[0])
            if ref is None:
                ref = a
            ok = "OK " if np.array_equal(ref, a) else "MISMATCH"
            print(f"{label}  dt={dt*1e3:7.1f}ms  GCUPS={cells/dt/1e9:6.2f}  {ok}",
                  flush=True)
        except Exception as e:
            print(f"{label}  FAILED: {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
