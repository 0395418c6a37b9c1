"""Multi-device scan scoring: shard pair-buckets across local devices.

The scan scheduler's pair buckets are embarrassingly parallel, so the
multi-chip scanner simply round-robins bucket kernel calls across the
local device set (each device holds a full replica of the profile tables;
profile-axis *sharding* of the tables themselves is the memory-bound
alternative in parallel/sharding.py).  Results are gathered host-side —
the merge is the deterministic product sort, so device count never
changes output (the reference's thread-count-invariance contract).
"""

from __future__ import annotations

import numpy as np

import jax

from ..ops.costs import ViterbiCosts
from ..scan.scheduler import PairItem, build_batches, bucket_arrays

__all__ = ["MultiDevicePairScorer"]


class MultiDevicePairScorer:
    """PairScorer contract over N local devices (round-robin buckets)."""

    def __init__(self, costs_list: list[ViterbiCosts], devices=None,
                 interpret: bool = False, kappa: int | None = None):
        import jax.numpy as jnp

        from ..ops import viterbi_pallas as vp

        self._vp = vp
        self.devices = list(devices if devices is not None else jax.devices())
        self.kappa, self.mode, self.prefetch = vp._resolve(kappa, None, None)
        self.interpret = interpret
        Kp = vp.common_kp(costs_list)
        pairs = [vp.build_tables(c, Kp) for c in costs_list]
        tables = np.stack([t for t, _ in pairs])
        tvecs = np.stack([v for _, v in pairs])
        self.tables = [jax.device_put(jnp.asarray(tables), d)
                       for d in self.devices]
        self.tvecs = [jax.device_put(jnp.asarray(tvecs), d)
                      for d in self.devices]

    def score(self, items: list[PairItem]) -> dict[int, tuple[float, float]]:
        import jax.numpy as jnp

        buckets = build_batches(items, self.kappa)
        # dispatch all buckets first (async), then collect
        inflight = []
        for i, bucket in enumerate(buckets):
            d = self.devices[i % len(self.devices)]
            pidx, xts, lens, ck, _ = bucket_arrays(bucket, self.kappa,
                                                   mode=self.mode)
            put = lambda a: jax.device_put(jnp.asarray(a), d)
            alt, nul = self._vp.viterbi_scores_pairs(
                put(pidx), self.tables[i % len(self.devices)],
                self.tvecs[i % len(self.devices)], put(xts), put(lens),
                put(ck), kappa=self.kappa, interpret=self.interpret,
                mode=self.mode, prefetch=self.prefetch)
            inflight.append((bucket, alt, nul))

        results: dict[int, tuple[float, float]] = {}
        for bucket, alt, nul in inflight:
            alt = np.asarray(alt)
            nul = np.asarray(nul)
            for gi, g in enumerate(bucket.groups):
                for wi, it in enumerate(g):
                    results[id(it)] = (float(nul[gi, wi]), float(alt[gi, wi]))
        return results
