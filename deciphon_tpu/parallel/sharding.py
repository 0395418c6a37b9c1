"""Multi-chip sharding of the scan step over a (profile, window) mesh.

TPU-native replacement for the reference's intra-node OpenMP partitioning
(c-core/protein_reader.c:29-53 contiguous protein partitions, one per
thread) and its service-level fan-out: here the pressed profile DB is
sharded across devices along the `profile` mesh axis (the model-parallel
analog) and window batches stream along the `window` axis (data parallel).
The per-device (P/p x B/w) score tiles need no communication; the ranked
merge (per-window best profile, the analog of the reference's product
ranking) rides ICI collectives that XLA inserts from the output sharding.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.engine import ProfilePack, scan_scores

PROFILE_AXIS = "profile"
WINDOW_AXIS = "window"
SCAN_AXES = (PROFILE_AXIS, WINDOW_AXIS)


def make_mesh(devices=None, profile_shards: int | None = None) -> Mesh:
    """Build a 2D (profile, window) device mesh.

    By default splits devices as evenly as possible between the two axes
    (profile gets the larger factor: the profile DB dominates memory, so
    sharding it first is the memory win).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if profile_shards is None:
        profile_shards = 1
        for f in range(int(np.sqrt(n)), 0, -1):
            if n % f == 0:
                profile_shards = max(f, n // f)
                break
    assert n % profile_shards == 0
    arr = np.asarray(devices).reshape(profile_shards, n // profile_shards)
    return Mesh(arr, (PROFILE_AXIS, WINDOW_AXIS))


def shard_pack(mesh: Mesh, pack: ProfilePack):
    """Device-put the profile stack sharded along the profile axis.

    P must be a multiple of the profile-axis size (the scheduler pads the
    profile list with duplicates of the last profile when needed).
    """
    s_pk = NamedSharding(mesh, P(PROFILE_AXIS, None, None))
    s_p = NamedSharding(mesh, P(PROFILE_AXIS, None))
    return (
        jax.device_put(pack.core, s_pk),
        jax.device_put(pack.match, s_pk),
        jax.device_put(pack.null, s_p),
        jax.device_put(pack.background, s_p),
    )


def shard_windows(mesh: Mesh, xt, codes, lengths):
    """Device-put a window batch sharded along the window axis."""
    s_b2 = NamedSharding(mesh, P(WINDOW_AXIS, None))
    s_b3 = NamedSharding(mesh, P(WINDOW_AXIS, None, None))
    s_b = NamedSharding(mesh, P(WINDOW_AXIS))
    return (
        jax.device_put(jnp.asarray(xt), s_b2),
        jax.device_put(jnp.asarray(codes), s_b3),
        jax.device_put(jnp.asarray(lengths), s_b),
    )


def sharded_scan_step(mesh: Mesh):
    """Build the jitted multi-chip scan step.

    Returns fn(core, match, null, background, xt, codes, lengths) ->
    (null_costs (P,B), alt_costs (P,B), lrt (P,B), best_profile (B,)).

    The (P, B) tiles come out sharded (profile, window); `best_profile`
    (argmin of alt over the profile axis, the ranked-merge analog) forces a
    reduction across the profile axis — XLA lowers it to an ICI collective.
    """
    tile_sharding = NamedSharding(mesh, P(PROFILE_AXIS, WINDOW_AXIS))
    merged_sharding = NamedSharding(mesh, P(WINDOW_AXIS))

    def step(core, match, null, background, xt, codes, lengths):
        nul, alt = scan_scores(core, match, null, background, xt, codes,
                               lengths)
        lrt = 2.0 * (nul - alt)
        best_profile = jnp.argmin(alt, axis=0)
        return nul, alt, lrt, best_profile

    return jax.jit(
        step,
        out_shardings=(tile_sharding, tile_sharding, tile_sharding,
                       merged_sharding),
    )
