"""Ablation timings for the pending score kernel (run on real TPU).

Knobs that need no code changes: kappa, w, Kp. Prints GCUPS per config.
Usage: PYTHONPATH=... python scripts/kernel_ablate.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax.numpy as jnp  # noqa: E402

from deciphon_tpu.ops import viterbi_pallas as vp  # noqa: E402
from deciphon_tpu.ops.costs import build_costs  # noqa: E402
from deciphon_tpu.profile import sample_profile  # noqa: E402
from deciphon_tpu.scan.sequence import frag_codes_ending  # noqa: E402
from deciphon_tpu.utils import enable_compilation_cache  # noqa: E402
from deciphon_tpu.xtrans import xtrans_cost_vector  # noqa: E402


def run(P, K, B, L, w, kappa, iters=5):
    costs = [build_costs(sample_profile(seed=100 + i, core_size=K))
             for i in range(P)]
    Kp = vp.common_kp(costs)
    built = [vp.build_tables(c, Kp) for c in costs]
    tables = jnp.asarray(np.stack([t for t, _ in built]))
    tvecs = jnp.asarray(np.stack([v for _, v in built]))
    rng = np.random.default_rng(3)
    codes = np.zeros((B, L, 5), dtype=np.int32)
    xt = np.zeros((B, 13), dtype=np.float32)
    for b in range(B):
        seq = rng.integers(0, 4, size=L).astype(np.int8)
        codes[b] = frag_codes_ending(seq)
        xt[b] = xtrans_cost_vector(True, False, L)
    lengths = np.full((B,), L, dtype=np.int32)
    xts, lens, ck = vp.pack_windows(xt, codes, lengths, kappa=kappa,
                                    mode="pending", w=w)
    WG = xts.shape[0]
    pidx = jnp.asarray(np.arange(P, dtype=np.int32).repeat(WG))
    xts_d = jnp.asarray(np.tile(xts, (P, 1, 1)))
    lens_d = jnp.asarray(np.tile(lens, (P, 1, 1)))
    ck_d = jnp.asarray(np.tile(ck, (P, 1, 1, 1, 1)))

    def disp():
        return vp.viterbi_scores_pairs(
            pidx, tables, tvecs, xts_d, lens_d, ck_d, kappa=kappa,
            mode="pending", prefetch=False)

    a, n = disp()
    float(np.asarray(a).sum())
    t0 = time.perf_counter()
    outs = [disp() for _ in range(iters)]
    float(np.asarray(outs[-1][0]).sum())
    dt = (time.perf_counter() - t0) / iters
    cells = P * B * L * 5 * K
    print(f"P={P} K={K} Kp={Kp} B={B} L={L} w={w} kappa={kappa}: "
          f"{cells/dt/1e9:.1f} GCUPS ({dt*1e3:.1f} ms)")
    return cells / dt / 1e9


if __name__ == "__main__":
    enable_compilation_cache()
    for cfg in [
        # width sweep (gather count scales with w; VMEM pressure too)
        (8, 400, 128, 4096, 64, 40),
        (8, 400, 128, 4096, 32, 40),
        (8, 400, 256, 4096, 256, 40),
        # lane-packing: K near the bucket top (pure padding effect)
        (8, 500, 128, 4096, 128, 40),
        # bigger Kp bucket
        (8, 1000, 128, 4096, 64, 40),
        (8, 2000, 128, 4096, 32, 40),
    ]:
        try:
            run(*cfg)
        except Exception as e:
            print(f"config {cfg} failed: {type(e).__name__}")
