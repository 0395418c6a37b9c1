"""Stacked multi-profile scan engine: the framework's flagship compute step.

TPU-first re-architecture of the reference's per-thread protein loop
(c-core/scan.c:188 + thread.c:49-86): instead of one profile per CPU thread,
profiles are padded to a common node count and *stacked* into dense arrays,
so one jitted computation scores a (P profiles x B windows) tile on the MXU
host.  The profile axis maps onto the `profile` mesh axis and the window
axis onto `window` for multi-chip runs (parallel/multidevice.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..frame import TABLE_SIZE
from ..xtrans import XT_RR
from .costs import NUM_TRANS_VECS, ViterbiCosts
from .viterbi_jax import viterbi, viterbi_null

INF = np.float32(np.inf)


@dataclass
class ProfilePack:
    """A stack of P pressed profiles padded to a common K.

    Padding semantics: pad nodes carry +inf transition and emission costs,
    so they can never appear on an optimal path; the min-plus recurrences
    ignore them (validated in tests/test_engine.py against unpadded runs).
    """

    K_pad: int
    core: np.ndarray  # (P, 8, K_pad) f32 costs
    match: np.ndarray  # (P, 1364, K_pad) f32 costs
    null: np.ndarray  # (P, 1364) f32 costs
    background: np.ndarray  # (P, 1364) f32 costs
    core_sizes: np.ndarray  # (P,) int32 true K per profile

    @property
    def num_profiles(self) -> int:
        return self.core.shape[0]

    @classmethod
    def from_costs(cls, costs: list[ViterbiCosts], K_pad: int | None = None,
                   lane_multiple: int = 128) -> "ProfilePack":
        kmax = max(c.K for c in costs)
        if K_pad is None:
            K_pad = ((kmax + lane_multiple - 1) // lane_multiple) * lane_multiple
        assert K_pad >= kmax
        P = len(costs)
        core = np.full((P, NUM_TRANS_VECS, K_pad), INF, np.float32)
        match = np.full((P, TABLE_SIZE, K_pad), INF, np.float32)
        null = np.empty((P, TABLE_SIZE), np.float32)
        background = np.empty((P, TABLE_SIZE), np.float32)
        sizes = np.empty((P,), np.int32)
        from .costs import CT_DD, CT_DDCUM, dd_cum_row

        for i, c in enumerate(costs):
            core[i, :, : c.K] = c.core
            match[i, :, : c.K] = c.match
            null[i] = c.null
            background[i] = c.background
            sizes[i] = c.K
            # DDCUM must stay finite through the padding (an +inf entry
            # turns the prefix-scan's A - DDCUM into NaN): recompute the
            # saturated cumsum over the padded DD row, which continues
            # with DD_SAT steps past K — huge enough that pad lanes never
            # win the chain
            dd_pad = np.full((K_pad,), INF, np.float32)
            dd_pad[: c.K] = c.core[CT_DD]
            core[i, CT_DDCUM] = dd_cum_row(dd_pad)
        return cls(K_pad=K_pad, core=core, match=match, null=null,
                   background=background, core_sizes=sizes)


# ---------------------------------------------------------------------------
# The flagship step: (P profiles) x (B windows) -> null/alt costs.
#
# vmap structure: inner vmap over windows (codes/xt/length vary), outer vmap
# over profiles (cost arrays vary).  XLA fuses the whole tile into one
# program; under a mesh the P axis shards as `profile`, B as `window`.
# ---------------------------------------------------------------------------

_viterbi_w = jax.vmap(
    functools.partial(viterbi, path=False),
    in_axes=(None, None, None, None, 0, 0, 0),
)
_viterbi_pw = jax.vmap(_viterbi_w, in_axes=(0, 0, 0, 0, None, None, None))

_null_w = jax.vmap(viterbi_null, in_axes=(None, 0, 0, 0))
_null_pw = jax.vmap(_null_w, in_axes=(0, None, None, None))


def scan_scores(core, match, null, background, xt, codes, lengths):
    """Score a (P, B) tile.

    Args:
      core: (P, 8, K) f32; match: (P, 1364, K); null/background: (P, 1364).
      xt: (B, 13) f32 per-window special-transition costs.
      codes: (B, Lpad, 5) int32 fragment codes; lengths: (B,) int32.

    Returns (null_costs, alt_costs), both (P, B) f32.
    """
    alt = _viterbi_pw(core, match, null, background, xt, codes, lengths)
    nul = _null_pw(null, xt[:, XT_RR], codes, lengths)
    return nul, alt


scan_scores_jit = jax.jit(scan_scores)


def lrt_tile(null_costs, alt_costs):
    """LRT = 2*(null - alt) on min-plus costs (c-core/lrt.h)."""
    return 2.0 * (null_costs - alt_costs)
