"""Pallas TPU kernel for the frame Viterbi (score mode) — the hot loop.

Re-architecture of the reference's striped SIMD kernel
(c-core/viterbi.c:451-600) for the TPU VPU:

  * lanes (minor dim)    = profile nodes K, padded to 128 multiples —
    the analog of the reference's SIMD striping (viterbi.c:195-221), but
    1024-wide per vreg instead of 8/16, with no striping needed: the
    delete-chain "lazy-F" fixup loop (viterbi.c:561-580) becomes a
    lane-space min-plus prefix scan (log2 K shifted mins, same fixpoint);
  * sublanes             = W windows scanned simultaneously against the
    same profile (the reference scans windows serially per thread);
  * 5-slot rolling state = the emission-duration ring (viterbi.c:160
    extr_state[6] rings), stored slot-major in VMEM scratch and addressed
    by (l mod 5) — min-reductions over slots are order-free, so no
    rotation copies are ever made;
  * emission lookups     = in-kernel dynamic row gathers from a
    VMEM-resident extended table (1364 x K'), with the null and background
    scalar tables embedded as two extra lanes (columns K'-2, K'-1) so one
    gather per (duration, window) feeds the core M/I updates *and* the
    special-state / null-model updates with pure vector math;
  * fragment codes stream through SMEM blocks (the only scalar memory),
    grid-pipelined per l-block; everything else stays on-chip.

The scalar null model (viterbi.c:696-719) runs in the same kernel on the
spare sublane capacity (ring R), so one pass yields both costs of the LRT.

Outputs are bit-stable f32 costs; parity with the lax.scan engine
(ops/viterbi_jax.py) is asserted in tests/test_pallas.py, which itself is
validated against exhaustive path enumeration (ops/bruteforce.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..frame import TABLE_SIZE
from ..xtrans import (XT_CC, XT_CT, XT_EB, XT_EC, XT_EJ, XT_ET, XT_JB, XT_JJ,
                      XT_NB, XT_NN, XT_RR, XT_SB, XT_SN)
from .costs import (CT_BM, CT_DD, CT_DM, CT_II, CT_IM, CT_MD, CT_MI, CT_MM,
                    ViterbiCosts)

INF = float("inf")  # Python float: avoids captured-constant tracing in the kernel
NEG_BIG = np.float32(1e30)  # DD saturation (matches ops/viterbi_jax.py)

W = 8  # windows per group (sublane dim)
# HBM-table block kernel VMEM footprint per (window, lane): 13-plane BIG
# scratch + 5-plane emission block (double-buffered by the grid pipeline)
# + MA staging ~= 23 f32 planes = 92 bytes.  Shared by the scan scheduler's
# group-width budget and bench.py so the two never disagree.
HBM_STATE_BYTES_PER_LANE = 92
# Mosaic's scoped-VMEM default (16 MB) is far below v5e's physical VMEM
# (128 MB): raise the per-kernel limit so big-Kp tables double-buffer and
# wide window groups fit.  96 MB (round 5: the Kp=1920 packed-chain
# plane at w=64 needs 67.8 MB of scoped VMEM once per-segment metadata
# blocks are added) still leaves headroom for XLA's own buffers in the
# surrounding fused program; a plane that genuinely exceeds physical
# VMEM fails AT COMPILE TIME with the same scoped-allocation error, so
# the limit is a budget, not a promise.
VMEM_LIMIT_BYTES = 96 * 1024 * 1024
KAPPA = 32  # positions per l-block (codes SMEM block)
KAPPA_PENDING = 40  # pending mode: must be a multiple of 5 (phase unroll)
PREFETCH = False  # double-buffer emission gathers (measured slower on v5e)
# Gather strategy: "slot" = slot-major MA scratch round-trip (dynamic-slot
# stores, one static ring read); "tregs" = t-ordered register gathers with
# per-duration dynamic ring slices (no scratch round-trip); "static" =
# host-reordered slot-major codes so every MA store index is static (only
# the table row load stays dynamic) — requires slot-major-packed codes
# (pack_windows/bucket_arrays do this when the mode is "static");
# "pending" = the push/pending-accumulator formulation with a 5-phase
# unrolled loop (see _kernel_pending) — requires START-indexed codes.
# Measured on TPU v5e (P=8 K=400 B=64 L=4096): slot 5.8 GCUPS, static
# 15.1 GCUPS (13.8 with device-resident inputs and honest sync), and an
# ablation with the row gather replaced by a static row read also gives
# 13.9 — in static mode the kernel is bound by per-step vector work and
# loop overhead, not the gathers, which is what "pending" attacks.
GATHER_MODE = "pending"

# tvec row indices: transition vectors pre-laid-out for the kernel.
TV_BM, TV_MMS, TV_MI, TV_MD, TV_IMS, TV_II, TV_DMS, TV_DDCUM = range(8)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def build_tables(costs: ViterbiCosts, Kp: int | None = None):
    """Extended emission table + transition vectors for the kernel.

    Returns (table (1364, K') f32, tvec (8, K') f32) where K' = K+2 rounded
    up to 128 (the tightest vreg-aligned width); lanes K..K'-3 are +inf
    pads, lane K'-2 carries the null emission costs and lane K'-1 the
    background (insert) emission costs, so the per-(t,w) row gather also
    fetches the scalar-table values the special states need.
    """
    K = costs.K
    if Kp is None:
        Kp = round_up(K + 2, 128)
    assert Kp >= K + 2
    table = np.full((TABLE_SIZE, Kp), np.inf, np.float32)
    table[:, :K] = costs.match
    table[:, Kp - 2] = costs.null
    table[:, Kp - 1] = costs.background

    core = costs.core
    tvec = np.full((8, Kp), np.inf, np.float32)
    tvec[TV_BM, :K] = core[CT_BM]
    # source-indexed, shifted: MMs[k] = MM[k+1] (entering node k+1 from k)
    tvec[TV_MMS, : K - 1] = core[CT_MM, 1:]
    tvec[TV_IMS, : K - 1] = core[CT_IM, 1:]
    tvec[TV_DMS, : K - 1] = core[CT_DM, 1:]
    # dest-indexed
    tvec[TV_MI, :K] = core[CT_MI]
    tvec[TV_II, :K] = core[CT_II]
    tvec[TV_MD, :K] = core[CT_MD]
    # saturated DD cumulative sum for the prefix-scan delete chain
    ddc = np.zeros(Kp, np.float32)
    ddc[1:K] = np.minimum(core[CT_DD, 1:K], NEG_BIG)
    ddc[K:] = NEG_BIG
    tvec[TV_DDCUM] = np.cumsum(ddc, dtype=np.float64).astype(np.float32)
    return table, tvec


def common_kp(costs_list: list[ViterbiCosts]) -> int:
    return round_up(max(c.K for c in costs_list) + 2, 128)


def _lane_shift1(x, lane_idx=None):
    """out[..., k] = x[..., k-1]; lane 0 receives lane Kp-1's value.

    When lane_idx is None the wraparound mask is skipped: every rotated-in
    source (transition vectors and M rows at lane Kp-1) is +inf by the
    build_tables construction (K <= Kp-2; pads carry inf costs), so the
    wrapped value is already the +inf the recurrence needs.
    """
    rolled = pltpu.roll(x, 1, axis=x.ndim - 1)
    if lane_idx is None:
        return rolled
    return jnp.where(lane_idx >= 1, rolled, INF)


def _lane_cummin(x, lane_idx, Kp):
    """Per-row prefix min along lanes (the delete-chain scan)."""
    sh = 1
    while sh < Kp:
        rolled = pltpu.roll(x, sh, axis=x.ndim - 1)
        x = jnp.minimum(x, jnp.where(lane_idx >= sh, rolled, INF))
        sh *= 2
    return x


def _kernel(codes_ref, table_ref, tvec_ref, xt_ref, len_ref,
            alt_ref, null_ref,
            MA, M, I, D, SML, Tfin, Rfin, *, kappa, num_lblocks, Kp,
            nlb_dim, mode=None, prefetch=None, w=W):
    W = w  # window-group width (shadows the module default)
    mode = GATHER_MODE if mode is None else mode
    prefetch = PREFETCH if prefetch is None else prefetch
    """Grid: (..., NLB) — nlb_dim selects the l-block grid axis.  SML packs
    the small (5, W, 1) rings: axis0 = [S, B, N, J, C, E, R]."""
    nlb = pl.program_id(nlb_dim)

    lane2 = jax.lax.broadcasted_iota(jnp.int32, (W, Kp), 1)
    xt = xt_ref[0]  # (W, 16)

    def xtc(j):  # (W, 1) per-window special transition cost
        return xt[:, j:j + 1]

    # loop-invariant transition vectors, read once per grid step
    tv_mms = tvec_ref[0, TV_MMS]
    tv_ims = tvec_ref[0, TV_IMS]
    tv_dms = tvec_ref[0, TV_DMS]
    tv_bm = tvec_ref[0, TV_BM]
    tv_ii = tvec_ref[0, TV_II]
    tv_mi = tvec_ref[0, TV_MI]
    tv_md = tvec_ref[0, TV_MD]
    tv_ddcum = tvec_ref[0, TV_DDCUM]

    @pl.when(nlb == 0)
    def _init():
        M[...] = jnp.full((5, W, Kp), INF)
        I[...] = jnp.full((5, W, Kp), INF)
        D[...] = jnp.full((5, W, Kp), INF)
        SML[...] = jnp.full((7, 5, W, 1), INF)
        # stage-0 seeds, slot(0) = 0: S_0 = 0; B_0 = SB; R_0 = -RR
        SML[0:1, 0:1] = jnp.zeros((1, 1, W, 1))
        SML[1:2, 0:1] = xtc(XT_SB)[None, None]
        SML[6:7, 0:1] = -xtc(XT_RR)[None, None]
        Tfin[...] = jnp.full((W, 1), INF)
        Rfin[...] = jnp.full((W, 1), INF)

    def gather(i, buf):
        """Fetch the 5 x W emission rows for DP position nlb*kappa+i+1
        into double-buffer half `buf`, slot-major."""
        l = nlb * kappa + i + 1
        for t in range(1, 6):
            slot_t = jax.lax.rem(l - t + 10, 5)
            for w in range(W):
                c = codes_ref[0, 0, i, t - 1, w]
                row = table_ref[0, pl.ds(c, 1), :]  # (1, Kp)
                MA[pl.ds(buf, 1), pl.ds(slot_t, 1), pl.ds(w, 1), :] = (
                    row.reshape(1, 1, 1, Kp))

    def gather_static(i):
        """Slot-major host-reordered codes (pack_windows(slot_major=True)):
        codes[..., i, s, w] already names the row that must land in ring
        slot s, so every MA store index is a Python literal — the only
        dynamic operand left is the table row offset."""
        for s in range(5):
            for w in range(W):
                c = codes_ref[0, 0, i, s, w]
                MA[0, s, w:w + 1, :] = table_ref[0, pl.ds(c, 1), :]

    def step_tregs(i, _):
        """Variant step: t-ordered register gathers, per-duration dynamic
        ring slices — no MA scratch round-trip (GATHER_MODE="tregs")."""
        l = nlb * kappa + i + 1  # 1-based DP position

        M_acc = jnp.full((W, Kp), INF)
        I_acc = jnp.full((W, Kp), INF)
        N_acc = jnp.full((W, 1), INF)
        J_acc = jnp.full((W, 1), INF)
        C_acc = jnp.full((W, 1), INF)
        R_acc = jnp.full((W, 1), INF)
        for t in range(1, 6):
            rows = [table_ref[0, pl.ds(codes_ref[0, 0, i, t - 1, w], 1), :]
                    for w in range(W)]
            ma_t = jnp.concatenate(rows, axis=0)  # (W, Kp)
            nil_t = ma_t[:, Kp - 2:Kp - 1]  # (W, 1)
            bg_t = ma_t[:, Kp - 1:Kp]
            s = jax.lax.rem(l - t + 10, 5)
            Mr_t = M[pl.ds(s, 1)][0]  # (W, Kp)
            Ir_t = I[pl.ds(s, 1)][0]
            Dr_t = D[pl.ds(s, 1)][0]
            sml_t = SML[:, pl.ds(s, 1), :, :]  # (7, 1, W, 1)
            Sr_t, Br_t, Nr_t = sml_t[0, 0], sml_t[1, 0], sml_t[2, 0]
            Jr_t, Cr_t, Er_t, Rr_t = (sml_t[3, 0], sml_t[4, 0], sml_t[5, 0],
                                      sml_t[6, 0])
            inner = jnp.minimum(jnp.minimum(Mr_t + tv_mms, Ir_t + tv_ims),
                                Dr_t + tv_dms)
            cand = jnp.minimum(_lane_shift1(inner), Br_t + tv_bm) + ma_t
            M_acc = jnp.minimum(M_acc, cand)
            I_acc = jnp.minimum(
                I_acc, jnp.minimum(Ir_t + tv_ii, Mr_t + tv_mi) + bg_t)
            N_acc = jnp.minimum(
                N_acc, jnp.minimum(Sr_t + xtc(XT_SN), Nr_t + xtc(XT_NN))
                + nil_t)
            J_acc = jnp.minimum(
                J_acc, jnp.minimum(Er_t + xtc(XT_EJ), Jr_t + xtc(XT_JJ))
                + nil_t)
            C_acc = jnp.minimum(
                C_acc, jnp.minimum(Er_t + xtc(XT_EC), Cr_t + xtc(XT_CC))
                + nil_t)
            R_acc = jnp.minimum(R_acc, Rr_t + nil_t)

        M_l, I_l = M_acc, I_acc
        A = _lane_shift1(M_l) + tv_md
        G = A - tv_ddcum
        D_l = _lane_cummin(G, lane2, Kp) + tv_ddcum

        E_l = jnp.minimum(jnp.min(M_l, axis=1, keepdims=True),
                          jnp.min(D_l, axis=1, keepdims=True))
        N_l, J_l, C_l = N_acc, J_acc, C_acc
        B_l = jnp.minimum(jnp.minimum(N_l + xtc(XT_NB), E_l + xtc(XT_EB)),
                          J_l + xtc(XT_JB))
        T_l = jnp.minimum(E_l + xtc(XT_ET), C_l + xtc(XT_CT))
        R_l = R_acc + xtc(XT_RR)

        at_end = len_ref[0] == l
        Tfin[...] = jnp.where(at_end, T_l, Tfin[...])
        Rfin[...] = jnp.where(at_end, R_l, Rfin[...])

        slot = jax.lax.rem(l, 5)
        M[pl.ds(slot, 1)] = M_l[None]
        I[pl.ds(slot, 1)] = I_l[None]
        D[pl.ds(slot, 1)] = D_l[None]
        smalls = jnp.stack([jnp.full((W, 1), INF), B_l, N_l, J_l, C_l,
                            E_l, R_l])
        SML[:, pl.ds(slot, 1)] = smalls[:, None]
        return 0

    def step(i, _):
        l = nlb * kappa + i + 1  # 1-based DP position

        if mode == "static":
            gather_static(i)
            ma = MA[0]  # (5, W, Kp)
        elif prefetch:
            @pl.when(i == 0)
            def _warm():
                gather(0, 0)

            # prefetch the next position's rows while computing this one
            @pl.when(i + 1 < kappa)
            def _prefetch():
                gather(i + 1, jax.lax.rem(i + 1, 2))

            ma = MA[jax.lax.rem(i, 2)]  # (5, W, Kp)
        else:
            gather(i, 0)
            ma = MA[0]  # (5, W, Kp)
        nil = ma[:, :, Kp - 2:Kp - 1]  # (5, W, 1)
        bg = ma[:, :, Kp - 1:Kp]

        Mr, Ir, Dr = M[...], I[...], D[...]
        Sr = SML[0]
        Br = SML[1]
        Nr = SML[2]
        Jr = SML[3]
        Cr = SML[4]
        Er = SML[5]
        Rr = SML[6]

        # ---- core M ----
        inner = jnp.minimum(jnp.minimum(Mr + tv_mms, Ir + tv_ims),
                            Dr + tv_dms)  # source coords k-1
        shifted = _lane_shift1(inner)  # wrap lane is +inf by construction
        bcand = Br + tv_bm  # (5,W,1)+(Kp,) -> (5,W,Kp)
        M_l = jnp.min(jnp.minimum(shifted, bcand) + ma, axis=0)  # (W, Kp)

        # ---- core I ----
        icand = jnp.minimum(Ir + tv_ii, Mr + tv_mi)
        I_l = jnp.min(icand + bg, axis=0)

        # ---- delete chain: D[k] = min(A[k], D[k-1]+DD[k]) via prefix scan
        A = _lane_shift1(M_l) + tv_md  # M_l wrap lane is +inf too
        G = A - tv_ddcum
        D_l = _lane_cummin(G, lane2, Kp) + tv_ddcum

        # ---- specials (all (W, 1) vector math) ----
        E_l = jnp.minimum(jnp.min(M_l, axis=1, keepdims=True),
                          jnp.min(D_l, axis=1, keepdims=True))
        N_l = jnp.min(jnp.minimum(Sr + xtc(XT_SN), Nr + xtc(XT_NN)) + nil,
                      axis=0)
        J_l = jnp.min(jnp.minimum(Er + xtc(XT_EJ), Jr + xtc(XT_JJ)) + nil,
                      axis=0)
        C_l = jnp.min(jnp.minimum(Er + xtc(XT_EC), Cr + xtc(XT_CC)) + nil,
                      axis=0)
        B_l = jnp.minimum(jnp.minimum(N_l + xtc(XT_NB), E_l + xtc(XT_EB)),
                          J_l + xtc(XT_JB))
        T_l = jnp.minimum(E_l + xtc(XT_ET), C_l + xtc(XT_CT))
        R_l = jnp.min(Rr + nil, axis=0) + xtc(XT_RR)

        # ---- capture costs at each window's final position ----
        at_end = len_ref[0] == l  # (W, 1) bool
        Tfin[...] = jnp.where(at_end, T_l, Tfin[...])
        Rfin[...] = jnp.where(at_end, R_l, Rfin[...])

        # ---- ring writes at slot(l) ----
        slot = jax.lax.rem(l, 5)
        M[pl.ds(slot, 1)] = M_l[None]
        I[pl.ds(slot, 1)] = I_l[None]
        D[pl.ds(slot, 1)] = D_l[None]
        smalls = jnp.stack([jnp.full((W, 1), INF), B_l, N_l, J_l, C_l,
                            E_l, R_l])  # S_l = inf for l >= 1
        SML[:, pl.ds(slot, 1)] = smalls[:, None]
        return 0

    jax.lax.fori_loop(0, kappa, step_tregs if mode == "tregs" else step, 0)

    # Written every l-block; the final block's values land last (the
    # output block index only changes with p/wg, so this is cheap).
    alt_ref[0, 0] = Tfin[...]
    null_ref[0, 0] = Rfin[...]


CW = 8  # carry slots per pair (chain segment continuation, see below)


def _kernel_pending(codes_ref, table_ref, tvec_ref, xt_ref, len_ref,
                    *refs, kappa, Kp, nlb_dim, w=W, chain=False,
                    carry=False, mixed=False):
    """Push/pending-accumulator formulation of the frame Viterbi.

    The pull form (_kernel) reads 5 ring slots per step and redoes the
    shift/min work on a (5, W, Kp) block each position.  This form
    computes each state's outgoing contribution ONCE —

      contrib_l = min(shift1(min(M_l+MMs, I_l+IMs, D_l+DMs)), B_l+BM)

    — and pushes it into 5 pending accumulators (one per future position
    l+1..l+5, combined with that position's emission row), so the
    per-step work drops from ~160 (W, Kp)-equivalent vector ops to ~60.
    The l-loop is unrolled into 5 phases (kappa % 5 == 0), which makes
    every ring-slot index a compile-time constant: slot(l) = l mod 5 with
    l = nlb*kappa + 5*i + r + 1 and kappa ≡ 0 (mod 5) depends only on the
    phase r.  The duration-t pending of the farthest position (t = 5) is
    a fresh assignment — the slot it lands in was consumed this same
    step — so pendings never need clearing.

    Requires START-indexed codes: codes[..., i, t-1, w] is the fragment
    of length t starting at DP position i+1 (start_codes()), because
    contributions flow from state l-1 through fragments starting at l.

    Scratch: MA (5, W, Kp) staging for the 5 gathered rows; PM/PI
    (5, W, Kp) pending mins for M and I; PSM (4, 5, W, 1) pending mins
    for N, J, C, R; ST (3, W, Kp) previous-step M/I/D; SS (7, W, 1)
    previous-step specials [S B N J C E R].

    Large-K mode (pidx_ref is not None): table_ref is the FULL stacked
    (P, 1364, Kp) table living in HBM (memory_space ANY) — a VMEM-resident
    copy would need ~90 MB at K = 16384 — and the per-(t, window) row
    gathers become explicit async DMAs into MA, tracked by dma_sem
    (5, W).  Everything else (all DP state) still fits VMEM: the rings
    are ~9.5 MB at Kp = 16512, W = 8, which is what makes streaming only
    the table sufficient to reach the reference's K <= 16384 limit
    (c-core/model.h:12) without tiling the recurrence itself.

    Chain mode (chain=True, the multi-window-slot tier): each sublane
    slot carries SEVERAL windows packed back-to-back at l-block
    granularity — the fix for the w=8 slot-floor loss (singleton
    profiles with few windows per length rung could not fill the
    minimum sublane width; the reference's striping wastes nothing at
    any K, c-core/viterbi.c:195-221).  xt_ref/len_ref become per-BLOCK
    blocks ((1, 1, W, 16)/(1, 1, W, 1), carrying the ACTIVE window's
    xtrans and chain-coordinate end per slot), an extra reset_ref
    (1, 1, W, 1) marks slots whose window STARTS at this block (the DP
    state is reseeded exactly like _init, masked per slot), and the
    outputs are written per block ((NPAIR, NLB, W, 1)) — the caller
    compacts them by each window's final block.  Because window starts
    are block-aligned and kappa % 5 == 0, every position's slot
    arithmetic and f32 op order are identical to a window scored from
    l=0 in the unchained kernel, so chained scores are BIT-EXACT.

    Carry mode (carry=True, implies chain): a window LONGER than the
    pinned chain cap is split into cap-block segments that run in
    CONSECUTIVE kernel calls (same device stream, no host sync), each
    occupying one full slot of the grid; the DP state crosses calls
    through explicit carry planes.  Slots w < CW flagged in cont_ref
    LOAD their state from carry_big/small_in at block 0 (instead of the
    reseed); at the last grid block every slot w < CW writes its live
    state to carry_big/small_out (the caller routes exported slots to
    the next call's carry_in by a device-side permutation).  Segment
    boundaries are block-aligned and kappa % 5 == 0, so the mod-5 ring
    phases line up across calls and segmented scores stay BIT-EXACT vs
    the same window scored whole.  Carry layout matches the scratch:
    big (13, CW, Kp) = PM[0:5] | PI[5:10] | ST[10:13]; small
    (32, CW, 1) = PSM.reshape(20)[0:20] | SS[20:27].  Fragments pushed
    near a segment's end read codes PAST its last position — correct by
    construction, because the code gather is START-indexed against the
    scan-global sequence table (the fragment content belongs to the
    next segment's positions of the same sequence)."""
    if mixed:
        # per-SLOT profiles: table_ref is the FLAT (P*1364, Kp) stack
        # resident in VMEM, poff_ref (1, W) SMEM carries each slot's
        # row offset (pidx * 1364), and tvec_ref is the pre-gathered
        # per-slot (1, 8, W, Kp) plane
        poff_ref, *refs = refs
    if carry:
        (reset_ref, cont_ref, cbig_in, csml_in, alt_ref, null_ref,
         cbig_out, csml_out, MA, PM, PI, PSM, ST, SS, Tfin, Rfin) = refs
    elif chain:
        (reset_ref, alt_ref, null_ref,
         MA, PM, PI, PSM, ST, SS, Tfin, Rfin) = refs
    else:
        (alt_ref, null_ref,
         MA, PM, PI, PSM, ST, SS, Tfin, Rfin) = refs
    W = w  # window-group width (shadows the module default)
    nlb = pl.program_id(nlb_dim)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (W, Kp), 1)
    xt = xt_ref[0, 0] if chain else xt_ref[0]  # (W, 16)
    lens = len_ref[0, 0] if chain else len_ref[0]  # (W, 1)

    def xtc(j):
        return xt[:, j:j + 1]

    # mixed mode: tvec_ref block is (1, 8, W, Kp) pre-gathered per slot,
    # so the same [0, TV_X] reads yield (W, Kp) planes that broadcast
    # exactly like the single-profile (Kp,) vectors
    tv_mms = tvec_ref[0, TV_MMS]
    tv_ims = tvec_ref[0, TV_IMS]
    tv_dms = tvec_ref[0, TV_DMS]
    tv_bm = tvec_ref[0, TV_BM]
    tv_ii = tvec_ref[0, TV_II]
    tv_mi = tvec_ref[0, TV_MI]
    tv_md = tvec_ref[0, TV_MD]
    tv_ddcum = tvec_ref[0, TV_DDCUM]

    @pl.when(nlb == 0)
    def _init():
        PM[...] = jnp.full((5, W, Kp), INF)
        PI[...] = jnp.full((5, W, Kp), INF)
        PSM[...] = jnp.full((4, 5, W, 1), INF)
        ST[...] = jnp.full((3, W, Kp), INF)
        inf_w1 = jnp.full((W, 1), INF)
        if chain:
            # seeds come from the per-slot reseed below (slot windows
            # start at arbitrary blocks); pad slots stay +inf forever
            SS[...] = jnp.full((7, W, 1), INF)
        else:
            SS[...] = jnp.stack([
                jnp.zeros((W, 1)),  # S_0 = 0
                xtc(XT_SB),  # B_0
                inf_w1, inf_w1, inf_w1, inf_w1,  # N J C E
                -xtc(XT_RR),  # R_0 (so R_1 = nil_1)
            ])
        Tfin[...] = jnp.full((W, 1), INF)
        Rfin[...] = jnp.full((W, 1), INF)

    if chain:
        rs = reset_ref[0, 0] > 0  # (W, 1) slots starting a window here

        @pl.when(jnp.max(reset_ref[0, 0]) > 0)
        def _reseed():
            PM[...] = jnp.where(rs[None], INF, PM[...])
            PI[...] = jnp.where(rs[None], INF, PI[...])
            PSM[...] = jnp.where(rs[None, None], INF, PSM[...])
            ST[...] = jnp.where(rs[None], INF, ST[...])
            inf_w1 = jnp.full((W, 1), INF)
            seeds = jnp.stack([
                jnp.zeros((W, 1)),  # S_0 = 0
                xtc(XT_SB),  # B_0 (this block's xt IS the new window's)
                inf_w1, inf_w1, inf_w1, inf_w1,  # N J C E
                -xtc(XT_RR),  # R_0 (so R_1 = nil_1)
            ])
            SS[...] = jnp.where(rs[None], seeds, SS[...])
            Tfin[...] = jnp.where(rs, INF, Tfin[...])
            Rfin[...] = jnp.where(rs, INF, Rfin[...])

    if carry:
        @pl.when((nlb == 0) & (jnp.max(cont_ref[0, :CW]) > 0))
        def _load_carry():
            # continuation segments resume mid-window: overwrite the
            # +inf-initialized state of flagged slots from the previous
            # segment's exported planes (slots >= CW never continue)
            cm = cont_ref[0, :CW] > 0  # (CW, 1)
            big = cbig_in[0]  # (13, CW, Kp)
            PM[:, :CW] = jnp.where(cm[None], big[0:5], PM[:, :CW])
            PI[:, :CW] = jnp.where(cm[None], big[5:10], PI[:, :CW])
            ST[:, :CW] = jnp.where(cm[None], big[10:13], ST[:, :CW])
            sml = csml_in[0]  # (32, CW, 1)
            PSM[:, :, :CW] = jnp.where(
                cm[None, None], sml[0:20].reshape(4, 5, CW, 1),
                PSM[:, :, :CW])
            SS[:, :CW] = jnp.where(cm[None], sml[20:27], SS[:, :CW])

    def phase(i, r, sm, si, sd, ss):
        """One DP position l = nlb*kappa + 5*i + r + 1 (slot arithmetic
        static in r).  (sm, si, sd, ss) is the previous position's state;
        returns this position's."""
        l = nlb * kappa + 5 * i + r + 1
        i_blk = 5 * i + r
        slot = (r + 1) % 5  # l % 5, static

        # -- gather the 5 emission rows for fragments STARTING at l ----
        for t in range(1, 6):
            for w in range(W):
                c = codes_ref[0, 0, i_blk, t - 1, w]
                if mixed:
                    MA[t - 1, w:w + 1, :] = table_ref[
                        pl.ds(c + poff_ref[0, w], 1), :]
                else:
                    MA[t - 1, w:w + 1, :] = table_ref[0, pl.ds(c, 1), :]

        # -- push contributions of state j = l-1 ------------------------
        inner = jnp.minimum(jnp.minimum(sm + tv_mms, si + tv_ims),
                            sd + tv_dms)
        contrib = jnp.minimum(_lane_shift1(inner), ss[1] + tv_bm)
        icand = jnp.minimum(si + tv_ii, sm + tv_mi)
        cN = jnp.minimum(ss[0] + xtc(XT_SN), ss[2] + xtc(XT_NN))
        cJ = jnp.minimum(ss[5] + xtc(XT_EJ), ss[3] + xtc(XT_JJ))
        cC = jnp.minimum(ss[5] + xtc(XT_EC), ss[4] + xtc(XT_CC))
        cR = ss[6]
        for t in range(1, 6):
            st = (r + t) % 5  # (l-1+t) % 5, static
            row = MA[t - 1]  # (W, Kp)
            nil = row[:, Kp - 2:Kp - 1]
            bg = row[:, Kp - 1:Kp]
            if t == 5:  # earliest contributor: fresh assignment
                PM[st] = contrib + row
                PI[st] = icand + bg
                PSM[0, st] = cN + nil
                PSM[1, st] = cJ + nil
                PSM[2, st] = cC + nil
                PSM[3, st] = cR + nil
            else:
                PM[st] = jnp.minimum(PM[st], contrib + row)
                PI[st] = jnp.minimum(PI[st], icand + bg)
                PSM[0, st] = jnp.minimum(PSM[0, st], cN + nil)
                PSM[1, st] = jnp.minimum(PSM[1, st], cJ + nil)
                PSM[2, st] = jnp.minimum(PSM[2, st], cC + nil)
                PSM[3, st] = jnp.minimum(PSM[3, st], cR + nil)

        # -- consume position l ------------------------------------------
        M_l = PM[slot]
        I_l = PI[slot]
        A = _lane_shift1(M_l) + tv_md
        D_l = _lane_cummin(A - tv_ddcum, lane2, Kp) + tv_ddcum
        E_l = jnp.minimum(jnp.min(M_l, axis=1, keepdims=True),
                          jnp.min(D_l, axis=1, keepdims=True))
        N_l = PSM[0, slot]
        J_l = PSM[1, slot]
        C_l = PSM[2, slot]
        R_l = PSM[3, slot] + xtc(XT_RR)
        B_l = jnp.minimum(jnp.minimum(N_l + xtc(XT_NB), E_l + xtc(XT_EB)),
                          J_l + xtc(XT_JB))
        T_l = jnp.minimum(E_l + xtc(XT_ET), C_l + xtc(XT_CT))

        at_end = lens == l
        Tfin[...] = jnp.where(at_end, T_l, Tfin[...])
        Rfin[...] = jnp.where(at_end, R_l, Rfin[...])

        ss_l = jnp.stack([jnp.full((W, 1), INF), B_l, N_l, J_l, C_l,
                          E_l, R_l])
        return M_l, I_l, D_l, ss_l

    def macro_step(i, _):
        sm, si, sd = ST[0], ST[1], ST[2]
        ss = SS[...]
        for r in range(5):
            sm, si, sd, ss = phase(i, r, sm, si, sd, ss)
        ST[0] = sm
        ST[1] = si
        ST[2] = sd
        SS[...] = ss
        return 0

    # Skip l-blocks past the group's longest window: every T/R latch has
    # already fired, so the remaining blocks are pure pad compute.  For
    # the all-pad pairs the {64,8,1} chunk scheme creates (length 0
    # everywhere), this skips the ENTIRE body — pad pairs cost only the
    # grid's block DMAs, which is what makes padded chunk dims near-free
    # (the scheduler's comment contract).  Trailing blocks of a length
    # rung (windows quantized up to 25%) are skipped the same way.  In
    # chain mode `lens` is per-block (the active window's chain-coord
    # end, 0 when no slot's chain covers this block), so the same test
    # skips trailing pad blocks of under-filled chains.
    @pl.when(nlb * kappa < jnp.max(lens))
    def _run():
        jax.lax.fori_loop(0, kappa // 5, macro_step, 0)

    alt_ref[0, 0] = Tfin[...]
    null_ref[0, 0] = Rfin[...]

    if carry:
        @pl.when(nlb == pl.num_programs(nlb_dim) - 1)
        def _export():
            # non-final segments span the FULL grid, so their state is
            # live here; the caller reads only flagged slots' planes
            cbig_out[0, 0:5] = PM[:, :CW]
            cbig_out[0, 5:10] = PI[:, :CW]
            cbig_out[0, 10:13] = ST[:, :CW]
            csml_out[0, 0:20] = PSM[:, :, :CW].reshape(20, CW, 1)
            csml_out[0, 20:27] = SS[:, :CW]
            csml_out[0, 27:32] = jnp.zeros((5, CW, 1))


def start_codes(c_end: np.ndarray) -> np.ndarray:
    """(..., L, 5) fragment codes ending at each position -> codes
    STARTING at each position: out[..., l, t-1] = c_end[..., l+t-1, t-1]
    (garbage past the end; only positions beyond the window read it)."""
    L = c_end.shape[-2]
    out = np.zeros_like(c_end)
    for t in range(1, 6):
        n = max(0, L - (t - 1))  # clamp: a negative stop slices wrongly
        out[..., :n, t - 1] = c_end[..., t - 1:t - 1 + n, t - 1]
    return out


def _make_kernel(mode, prefetch, kappa, NLB, Kp, nlb_dim, w=W):
    """Kernel + scratch shapes for the requested gather mode."""
    W = w
    if mode == "pending":
        if kappa % 5:
            raise ValueError("pending mode requires kappa % 5 == 0")
        kernel = functools.partial(_kernel_pending, kappa=kappa, Kp=Kp,
                                   nlb_dim=nlb_dim, w=w)
        scratch = [
            pltpu.VMEM((5, W, Kp), jnp.float32),  # MA gather staging
            pltpu.VMEM((5, W, Kp), jnp.float32),  # PM pending M
            pltpu.VMEM((5, W, Kp), jnp.float32),  # PI pending I
            pltpu.VMEM((4, 5, W, 1), jnp.float32),  # PSM pending N J C R
            pltpu.VMEM((3, W, Kp), jnp.float32),  # ST prev M/I/D
            pltpu.VMEM((7, W, 1), jnp.float32),  # SS prev specials
            pltpu.VMEM((W, 1), jnp.float32),  # T final
            pltpu.VMEM((W, 1), jnp.float32),  # R final
        ]
    else:
        kernel = functools.partial(_kernel, kappa=kappa, num_lblocks=NLB,
                                   Kp=Kp, nlb_dim=nlb_dim, mode=mode,
                                   prefetch=prefetch, w=w)
        scratch = [
            pltpu.VMEM((2, 5, W, Kp), jnp.float32),  # MA double buffer
            pltpu.VMEM((5, W, Kp), jnp.float32),  # M ring
            pltpu.VMEM((5, W, Kp), jnp.float32),  # I ring
            pltpu.VMEM((5, W, Kp), jnp.float32),  # D ring
            pltpu.VMEM((7, 5, W, 1), jnp.float32),  # small rings S B N J C E R
            pltpu.VMEM((W, 1), jnp.float32),  # T final
            pltpu.VMEM((W, 1), jnp.float32),  # R final
        ]
    return kernel, scratch


def _resolve(kappa, mode, prefetch):
    """Pin the module-level defaults into concrete jit cache keys, so
    mutating GATHER_MODE/PREFETCH at runtime (kernel ablations) can never
    pair stale compiled kernels with fresh host packing."""
    mode = GATHER_MODE if mode is None else mode
    prefetch = PREFETCH if prefetch is None else prefetch
    if kappa is None:
        kappa = KAPPA_PENDING if mode == "pending" else KAPPA
    return kappa, mode, prefetch


@functools.partial(jax.jit,
                   static_argnames=("kappa", "interpret", "mode", "prefetch"))
def _scores_grid_jit(tables, tvecs, xts, lengths, codes, *, kappa,
                     interpret, mode, prefetch):
    P, _, Kp = tables.shape
    WG, NLB = codes.shape[0], codes.shape[1]
    W = codes.shape[4]
    kernel, scratch = _make_kernel(mode, prefetch, kappa, NLB, Kp, nlb_dim=2,
                                   w=W)
    grid = (P, WG, NLB)
    out_shape = [
        jax.ShapeDtypeStruct((P, WG, W, 1), jnp.float32),
        jax.ShapeDtypeStruct((P, WG, W, 1), jnp.float32),
    ]
    alt, nul = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, kappa, 5, W), lambda p, wg, nlb: (wg, nlb, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TABLE_SIZE, Kp), lambda p, wg, nlb: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, Kp), lambda p, wg, nlb: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, 16), lambda p, wg, nlb: (wg, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, 1), lambda p, wg, nlb: (wg, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, W, 1), lambda p, wg, nlb: (p, wg, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, 1), lambda p, wg, nlb: (p, wg, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
    )(codes, tables, tvecs, xts, lengths)
    return alt[..., 0], nul[..., 0]


def viterbi_scores_grid(tables, tvecs, xts, lengths, codes, *, kappa=None,
                        interpret=False, mode=None, prefetch=None):
    """Run the kernel over a (P profiles, WG window-groups, NLB) grid.

    Args:
      tables: (P, 1364, Kp) f32 extended emission tables.
      tvecs: (P, 8, Kp) f32 transition vectors.
      xts: (WG, W, 16) f32 per-window special costs (13 used, padded).
      lengths: (WG, W, 1) int32 window lengths (0 => unused pad slot).
      codes: (WG, NLB, kappa, 5, W) int32 fragment codes — start-indexed
        for "pending" mode, slot-major for "static", duration-major else.

    Returns (alt, null): (P, WG, W) f32 min-plus costs (+inf for pads).
    """
    kappa, mode, prefetch = _resolve(kappa, mode, prefetch)
    return _scores_grid_jit(tables, tvecs, xts, lengths, codes, kappa=kappa,
                            interpret=interpret, mode=mode, prefetch=prefetch)


def _scores_pairs_core(pidx, tables, tvecs, xts, lengths, codes, *,
                       kappa, interpret, mode, prefetch):
    _, _, Kp = tables.shape
    NPAIR, NLB = codes.shape[0], codes.shape[1]
    W = codes.shape[4]
    inner, scratch = _make_kernel(mode, prefetch, kappa, NLB, Kp, nlb_dim=1,
                                  w=W)

    def kernel(pidx_ref, *rest):
        # pidx is consumed by the index maps only; drop the leading ref.
        inner(*rest)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NPAIR, NLB),
        in_specs=[
            pl.BlockSpec((1, 1, kappa, 5, W),
                         lambda pair, nlb, pidx: (pair, nlb, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TABLE_SIZE, Kp),
                         lambda pair, nlb, pidx: (pidx[pair], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, Kp),
                         lambda pair, nlb, pidx: (pidx[pair], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, 16), lambda pair, nlb, pidx: (pair, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, 1), lambda pair, nlb, pidx: (pair, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, W, 1), lambda pair, nlb, pidx: (pair, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, 1), lambda pair, nlb, pidx: (pair, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch,
    )
    out_shape = [
        jax.ShapeDtypeStruct((NPAIR, 1, W, 1), jnp.float32),
        jax.ShapeDtypeStruct((NPAIR, 1, W, 1), jnp.float32),
    ]
    alt, nul = pl.pallas_call(
        kernel, out_shape=out_shape, grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
    )(pidx, codes, tables, tvecs, xts, lengths)
    return alt[:, 0, :, 0], nul[:, 0, :, 0]


_scores_pairs_jit = functools.partial(jax.jit, static_argnames=(
    "kappa", "interpret", "mode", "prefetch"))(_scores_pairs_core)


def _scores_pairs_mixed_vmem_core(pidx, tables, tvecs, xts, lengths,
                                  codes, *, kappa, interpret):
    """Mixed-profile pairs scoring with the WHOLE table stack VMEM-
    resident: pidx is (NPAIR, W) — one profile per sublane SLOT.

    The HBM-mixed gang tier (_scores_pairs_hbm_core mixed) materializes
    every gathered emission block through HBM and measured 9-56 padded
    GCUPS; when the bucket's stacked tables fit scoped VMEM (round 5
    raised the limit to 96 MB — e.g. 4 x Kp2048 profiles = 44.7 MB),
    the pending kernel's in-VMEM row gather runs the same mixed slots at
    the plane-rate law's 58-115.  The per-slot transition vectors are
    pre-gathered OUTSIDE the kernel (a tiny (N, 8, W, Kp) take)."""
    P, _, Kp = tables.shape
    NPAIR, NLB = codes.shape[0], codes.shape[1]
    W = codes.shape[4]
    if kappa % 5:
        raise ValueError("pending mode requires kappa % 5 == 0")
    tables_flat = tables.reshape(P * TABLE_SIZE, Kp)
    poff = (pidx.astype(jnp.int32) * TABLE_SIZE)  # (N, W)
    tvec_slot = jnp.take(tvecs, pidx, axis=0,
                         mode="clip").transpose(0, 2, 1, 3)  # (N,8,W,Kp)
    inner = functools.partial(_kernel_pending, kappa=kappa, Kp=Kp,
                              nlb_dim=1, w=W, mixed=True)

    def kernel(codes_ref, table_ref, tvec_ref, xt_ref, len_ref, poff_ref,
               alt_ref, null_ref, *scratch):
        inner(codes_ref, table_ref, tvec_ref, xt_ref, len_ref, poff_ref,
              alt_ref, null_ref, *scratch)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(NPAIR, NLB),
        in_specs=[
            pl.BlockSpec((1, 1, kappa, 5, W),
                         lambda pair, nlb: (pair, nlb, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((P * TABLE_SIZE, Kp),
                         lambda pair, nlb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, W, Kp),
                         lambda pair, nlb: (pair, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, 16), lambda pair, nlb: (pair, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, 1), lambda pair, nlb: (pair, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda pair, nlb: (pair, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, W, 1), lambda pair, nlb: (pair, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, 1), lambda pair, nlb: (pair, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((5, W, Kp), jnp.float32),  # MA gather staging
            pltpu.VMEM((5, W, Kp), jnp.float32),  # PM pending M
            pltpu.VMEM((5, W, Kp), jnp.float32),  # PI pending I
            pltpu.VMEM((4, 5, W, 1), jnp.float32),  # PSM pending N J C R
            pltpu.VMEM((3, W, Kp), jnp.float32),  # ST prev M/I/D
            pltpu.VMEM((7, W, 1), jnp.float32),  # SS prev specials
            pltpu.VMEM((W, 1), jnp.float32),  # T final
            pltpu.VMEM((W, 1), jnp.float32),  # R final
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((NPAIR, 1, W, 1), jnp.float32),
        jax.ShapeDtypeStruct((NPAIR, 1, W, 1), jnp.float32),
    ]
    alt, nul = pl.pallas_call(
        kernel, out_shape=out_shape, grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
    )(codes, tables_flat, tvec_slot, xts, lengths, poff)
    return alt[:, 0, :, 0], nul[:, 0, :, 0]


@functools.partial(jax.jit, static_argnames=("kappa", "nlb", "interpret"))
def _gather_scores_pairs_mixed_vmem_jit(pidx, tables, tvecs, xts, lengths,
                                        starts, codes_all, *, kappa, nlb,
                                        interpret):
    """Mixed-profile VMEM-table scoring from device-resident codes:
    pidx (N, W) — one profile PER SLOT (the gang tier's fast path)."""
    ck = _ck_from_starts(codes_all, starts, nlb, kappa)
    return _scores_pairs_mixed_vmem_core(pidx, tables, tvecs, xts,
                                         lengths, ck, kappa=kappa,
                                         interpret=interpret)


def _ck_from_starts(codes_all, starts, nlb, kappa):
    """Device-side window packing: slice per-window code runs out of the
    scan-resident global code array (start-indexed, scan/scheduler.py
    DeviceSeqCodes) into the kernel's (N, NLB, kappa, 5, W) layout.

    Replaces the host-side per-round code packing + upload — the dominant
    steady-state cost of round-2's scan (VERDICT r2 weak #1): per round
    only `starts` (N, W) int32 crosses to the device.  Rows past a
    window's end read the neighbouring sequence's codes — any in-range
    row is a valid table index, and positions past `lengths` never reach
    the captured outputs (the kernel latches T/R at l == length), so the
    values are irrelevant by construction.

    Each window's rows are one CONTIGUOUS run, so this lowers to one
    lax.gather of (Lk, 5) BLOCK slices (one big copy per window slot)
    instead of N*Lk*W single-row fetches: 32 GB/s vs 3.3 GB/s for the
    row-take and the dominant device cost of big-K scan buckets before
    (round-4 attribution; the follow-up transpose is free)."""
    N, W = starts.shape
    Lk = nlb * kappa
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,))
    out = jax.lax.gather(codes_all, starts.reshape(-1, 1), dn,
                         slice_sizes=(Lk, 5),
                         mode=jax.lax.GatherScatterMode.CLIP)
    out = out.reshape(N, W, Lk, 5)
    return out.transpose(0, 2, 3, 1).reshape(N, nlb, kappa, 5, W)


@functools.partial(jax.jit, static_argnames=("kappa", "nlb", "interpret"))
def _gather_scores_pairs_jit(pidx, tables, tvecs, xts, lengths, starts,
                             codes_all, *, kappa, nlb, interpret):
    ck = _ck_from_starts(codes_all, starts, nlb, kappa)
    return _scores_pairs_core(pidx, tables, tvecs, xts, lengths, ck,
                              kappa=kappa, interpret=interpret,
                              mode="pending", prefetch=False)


@functools.partial(jax.jit, static_argnames=("kappa", "nlb", "interpret"))
def _gather_scores_pairs_hbm_mixed_jit(pidx, tables, tvecs, xts, lengths,
                                       starts, codes_all, *, kappa, nlb,
                                       interpret):
    """Mixed-profile HBM scoring from device-resident codes: pidx is
    (N, W) — one profile PER SLOT (see _scores_pairs_hbm_core mixed)."""
    ck = _ck_from_starts(codes_all, starts, nlb, kappa)
    return _scores_pairs_hbm_core(pidx, tables, tvecs, xts, lengths, ck,
                                  kappa=kappa, interpret=interpret,
                                  mixed=True)


@functools.partial(jax.jit, static_argnames=("kappa", "nlb", "interpret"))
def _gather_scores_pairs_hbm_jit(pidx, tables, tvecs, xts, lengths, starts,
                                 codes_all, *, kappa, nlb, interpret):
    ck = _ck_from_starts(codes_all, starts, nlb, kappa)
    return _scores_pairs_hbm_core(pidx, tables, tvecs, xts, lengths, ck,
                                  kappa=kappa, interpret=interpret)


def viterbi_scores_pairs_from_starts(pidx, tables, tvecs, xts, lengths,
                                     starts, codes_all, *, nlb,
                                     kappa=None, interpret=False,
                                     hbm=False):
    """Fused device-side pack + ragged pairs scoring.

    Same contract as viterbi_scores_pairs, but windows are named by their
    row offsets (`starts` (NPAIR, W) int32) into a scan-resident
    start-indexed code array `codes_all` (T, 5) instead of materialized
    host-side code blocks.  Only valid for the "pending" formulation
    (start-indexed codes).  `nlb` fixes the padded block count (static)."""
    kappa, mode, _ = _resolve(kappa, "pending", None)
    assert mode == "pending"
    fn = _gather_scores_pairs_hbm_jit if hbm else _gather_scores_pairs_jit
    return fn(pidx, tables, tvecs, xts, lengths, starts, codes_all,
              kappa=kappa, nlb=nlb, interpret=interpret)


def viterbi_scores_pairs(pidx, tables, tvecs, xts, lengths, codes, *,
                         kappa=None, interpret=False, mode=None,
                         prefetch=None):
    """Ragged batching: score NPAIR (profile, window-group) pairs.

    This is the production scheduler shape — each pair binds a window-group
    to ITS profile (window geometry depends on the profile's core size, so
    different profiles scan different windows; the dense grid variant would
    score every group against every profile).  The profile index array is a
    scalar-prefetch argument, so the pipeline DMAs each pair's emission
    table by data-dependent index (the TPU analog of the reference's
    per-thread protein partition walk, c-core/protein_reader.c:77-101).

    Args:
      pidx: (NPAIR,) int32 profile index per pair.
      tables/tvecs: stacked per-profile tables (P, 1364, Kp)/(P, 8, Kp).
      xts: (NPAIR, W, 16); lengths: (NPAIR, W, 1); codes: (NPAIR, NLB,
        kappa, 5, W).

    Returns (alt, null): (NPAIR, W) f32.
    """
    kappa, mode, prefetch = _resolve(kappa, mode, prefetch)
    return _scores_pairs_jit(pidx, tables, tvecs, xts, lengths, codes,
                             kappa=kappa, interpret=interpret, mode=mode,
                             prefetch=prefetch)


# ---------------------------------------------------------------------------
# Multi-window chained slots (the round-5 slot-floor fix).
#
# One sublane slot carries a CHAIN of windows packed back-to-back at
# l-block granularity; the kernel reseeds the DP per slot at each window's
# first block and latches T/R at its end position (see _kernel_pending's
# chain-mode docstring).  The host ships only compact per-window metadata
# ((N, W, CMAX) int32 arrays + a small xtrans LUT); the per-block arrays
# the kernel consumes (active-window end/xt/reset per (pair, block, slot))
# and the fragment-code gather are expanded HERE, on device, inside one
# fused jit — a few KB cross the host link per wave regardless of window
# count.  Outputs come back compacted per window ((N, W, CMAX) costs via a
# take_along_axis on each window's final block).
# ---------------------------------------------------------------------------


def _scores_pairs_chain_core(pidx, tables, tvecs, xts, lengths, resets,
                             codes, *, kappa, interpret):
    """Chained pairs kernel call.

    xts (N, NLB, W, 16) f32; lengths/resets (N, NLB, W, 1) i32;
    codes (N, NLB, kappa, 5, W) i32 START-indexed.
    Returns (alt, nul): (N, NLB, W) f32 per-block latched costs."""
    _, _, Kp = tables.shape
    NPAIR, NLB = codes.shape[0], codes.shape[1]
    W = codes.shape[4]
    if kappa % 5:
        raise ValueError("pending mode requires kappa % 5 == 0")
    inner = functools.partial(_kernel_pending, kappa=kappa, Kp=Kp,
                              nlb_dim=1, w=W, chain=True)

    def kernel(pidx_ref, *rest):
        inner(*rest)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NPAIR, NLB),
        in_specs=[
            pl.BlockSpec((1, 1, kappa, 5, W),
                         lambda pair, nlb, pidx: (pair, nlb, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TABLE_SIZE, Kp),
                         lambda pair, nlb, pidx: (pidx[pair], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, Kp),
                         lambda pair, nlb, pidx: (pidx[pair], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, 16),
                         lambda pair, nlb, pidx: (pair, nlb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, 1),
                         lambda pair, nlb, pidx: (pair, nlb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, 1),
                         lambda pair, nlb, pidx: (pair, nlb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, W, 1),
                         lambda pair, nlb, pidx: (pair, nlb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, 1),
                         lambda pair, nlb, pidx: (pair, nlb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((5, W, Kp), jnp.float32),  # MA gather staging
            pltpu.VMEM((5, W, Kp), jnp.float32),  # PM pending M
            pltpu.VMEM((5, W, Kp), jnp.float32),  # PI pending I
            pltpu.VMEM((4, 5, W, 1), jnp.float32),  # PSM pending N J C R
            pltpu.VMEM((3, W, Kp), jnp.float32),  # ST prev M/I/D
            pltpu.VMEM((7, W, 1), jnp.float32),  # SS prev specials
            pltpu.VMEM((W, 1), jnp.float32),  # T final
            pltpu.VMEM((W, 1), jnp.float32),  # R final
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((NPAIR, NLB, W, 1), jnp.float32),
        jax.ShapeDtypeStruct((NPAIR, NLB, W, 1), jnp.float32),
    ]
    alt, nul = pl.pallas_call(
        kernel, out_shape=out_shape, grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
    )(pidx, codes, tables, tvecs, xts, lengths, resets)
    return alt[..., 0], nul[..., 0]


def _scores_pairs_chain_carry_core(pidx, tables, tvecs, xts, lengths,
                                   resets, conts, cbig_in, csml_in, codes,
                                   *, kappa, interpret):
    """Chained pairs kernel call WITH cross-call DP carry (segmented
    windows; see _kernel_pending's carry-mode docstring).

    Extra args vs _scores_pairs_chain_core: conts (N, W, 1) i32 slots
    resuming from carry; cbig_in (N, 13, CW, Kp) f32; csml_in
    (N, 32, CW, 1) f32.  Returns (alt, nul, cbig_out, csml_out)."""
    _, _, Kp = tables.shape
    NPAIR, NLB = codes.shape[0], codes.shape[1]
    Wd = codes.shape[4]
    if kappa % 5:
        raise ValueError("pending mode requires kappa % 5 == 0")
    inner = functools.partial(_kernel_pending, kappa=kappa, Kp=Kp,
                              nlb_dim=1, w=Wd, chain=True, carry=True)

    def kernel(pidx_ref, *rest):
        inner(*rest)

    def per_pair(shape):
        return pl.BlockSpec(shape, lambda pair, nlb, pidx:
                            (pair,) + (0,) * (len(shape) - 1),
                            memory_space=pltpu.VMEM)

    def per_block(shape):
        return pl.BlockSpec(shape, lambda pair, nlb, pidx:
                            (pair, nlb) + (0,) * (len(shape) - 2),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NPAIR, NLB),
        in_specs=[
            pl.BlockSpec((1, 1, kappa, 5, Wd),
                         lambda pair, nlb, pidx: (pair, nlb, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TABLE_SIZE, Kp),
                         lambda pair, nlb, pidx: (pidx[pair], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, Kp),
                         lambda pair, nlb, pidx: (pidx[pair], 0, 0),
                         memory_space=pltpu.VMEM),
            per_block((1, 1, Wd, 16)),  # xts
            per_block((1, 1, Wd, 1)),  # lengths
            per_block((1, 1, Wd, 1)),  # resets
            per_pair((1, Wd, 1)),  # conts
            per_pair((1, 13, CW, Kp)),  # carry big in
            per_pair((1, 32, CW, 1)),  # carry small in
        ],
        out_specs=[
            per_block((1, 1, Wd, 1)),
            per_block((1, 1, Wd, 1)),
            per_pair((1, 13, CW, Kp)),
            per_pair((1, 32, CW, 1)),
        ],
        scratch_shapes=[
            pltpu.VMEM((5, Wd, Kp), jnp.float32),  # MA gather staging
            pltpu.VMEM((5, Wd, Kp), jnp.float32),  # PM pending M
            pltpu.VMEM((5, Wd, Kp), jnp.float32),  # PI pending I
            pltpu.VMEM((4, 5, Wd, 1), jnp.float32),  # PSM pending N J C R
            pltpu.VMEM((3, Wd, Kp), jnp.float32),  # ST prev M/I/D
            pltpu.VMEM((7, Wd, 1), jnp.float32),  # SS prev specials
            pltpu.VMEM((Wd, 1), jnp.float32),  # T final
            pltpu.VMEM((Wd, 1), jnp.float32),  # R final
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((NPAIR, NLB, Wd, 1), jnp.float32),
        jax.ShapeDtypeStruct((NPAIR, NLB, Wd, 1), jnp.float32),
        jax.ShapeDtypeStruct((NPAIR, 13, CW, Kp), jnp.float32),
        jax.ShapeDtypeStruct((NPAIR, 32, CW, 1), jnp.float32),
    ]
    alt, nul, cbig, csml = pl.pallas_call(
        kernel, out_shape=out_shape, grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
    )(pidx, codes, tables, tvecs, xts, lengths, resets, conts,
      cbig_in, csml_in)
    return alt[..., 0], nul[..., 0], cbig, csml


def _chain_expand(win_sblk, win_len, win_gstart, win_xti, xt_lut,
                  codes_all, *, kappa, nlb, maxblk):
    """Expand compact per-window chain metadata to per-block kernel
    inputs.

    win_sblk/win_len/win_gstart/win_xti: (N, W, C) int32 — chain window
    c of slot w: starting l-block within the chain, nt length (0 = pad),
    global code-row offset (DeviceSeqCodes), and xtrans LUT row.
    xt_lut (LUT_CAP, 16) f32; maxblk = longest chainable window in
    blocks (static, pinned per scan).

    Code gather, per-WINDOW big slices (round-5 reformulation): the
    per-(pair, block, slot) (kappa, 5)-slice gather ran at 2.2 GB/s —
    descriptor-bound (800 B slices) — and dominated the chained wave.
    Each window is one contiguous source run, so gather (maxblk*kappa,
    5) BLOCK slices at the window starts (the 32 GB/s formulation),
    then route blocks to their owning window with one take_along_axis.
    Overfetch is C*maxblk/nlb, bounded by the scheduler's cmax pin.
    Junk rows (beyond a window's true length, CLIPped tails) are valid
    code rows by construction and never reach a latched output.
    """
    N, Wd, C = win_sblk.shape
    b = jnp.arange(nlb, dtype=jnp.int32)  # (NLB,)
    blklen = -(-win_len // kappa)  # blocks per window (ceil)
    end_blk = win_sblk + blklen  # exclusive, (N, W, C)
    cov = ((win_sblk[..., None] <= b) & (b < end_blk[..., None])
           & (win_len[..., None] > 0))  # (N, W, C, NLB)
    anyc = jnp.any(cov, axis=2)  # (N, W, NLB)
    cidx = jnp.argmax(cov, axis=2)  # active window per block (windows
    # of one slot are disjoint in blocks, so argmax is exact)

    def sel(a):  # (N, W, C) -> per-block (N, W, NLB)
        return jnp.take_along_axis(a, cidx, axis=2)

    end_chain = win_sblk * kappa + win_len  # chain-coord end positions
    lens_blk = jnp.where(anyc, sel(end_chain), 0)
    reset_blk = (anyc & (b[None, None] == sel(win_sblk))).astype(jnp.int32)
    xts_blk = jnp.take(xt_lut, jnp.where(anyc, sel(win_xti), 0), axis=0)

    # kernel layouts: (N, NLB, W, ...)
    xts_k = xts_blk.transpose(0, 2, 1, 3)
    lens_k = lens_blk.transpose(0, 2, 1)[..., None]
    rs_k = reset_blk.transpose(0, 2, 1)[..., None]
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,))
    sl = jax.lax.gather(codes_all, win_gstart.reshape(-1, 1), dn,
                        slice_sizes=(maxblk * kappa, 5),
                        mode=jax.lax.GatherScatterMode.CLIP)
    sl = sl.reshape(N, Wd, C * maxblk, kappa, 5)
    idx = jnp.where(anyc, cidx * maxblk + (b - sel(win_sblk)), 0)
    ck = jnp.take_along_axis(sl, idx[..., None, None], axis=2)
    ck = ck.transpose(0, 2, 3, 4, 1)  # (N, NLB, kappa, 5, W)
    return xts_k, lens_k, rs_k, ck, end_blk


def _chain_compact(alt, nul, end_blk, nlb):
    # compact: each window's cost was latched by the end of its final
    # block and persists in later same-window blocks' output rows
    eb = jnp.clip(end_blk - 1, 0, nlb - 1)  # (N, W, C)
    alt_w = jnp.take_along_axis(alt.transpose(0, 2, 1), eb, axis=2)
    nul_w = jnp.take_along_axis(nul.transpose(0, 2, 1), eb, axis=2)
    return alt_w, nul_w


@functools.partial(jax.jit,
                   static_argnames=("kappa", "nlb", "maxblk", "interpret"))
def _chained_scores_jit(pidx, tables, tvecs, win_sblk, win_len, win_gstart,
                        win_xti, xt_lut, codes_all, *, kappa, nlb, maxblk,
                        interpret):
    """Expand compact per-window chain metadata and score.

    See _chain_expand for the metadata contract.  Returns (alt, nul):
    (N, W, C) f32.
    """
    xts_k, lens_k, rs_k, ck, end_blk = _chain_expand(
        win_sblk, win_len, win_gstart, win_xti, xt_lut, codes_all,
        kappa=kappa, nlb=nlb, maxblk=maxblk)
    alt, nul = _scores_pairs_chain_core(
        pidx, tables, tvecs, xts_k, lens_k, rs_k, ck,
        kappa=kappa, interpret=interpret)
    return _chain_compact(alt, nul, end_blk, nlb)


@functools.partial(jax.jit,
                   static_argnames=("kappa", "nlb", "maxblk", "interpret"))
def _chained_scores_carry_jit(pidx, tables, tvecs, win_sblk, win_len,
                              win_gstart, win_xti, conts, cbig_in, csml_in,
                              xt_lut, codes_all, *, kappa, nlb, maxblk,
                              interpret):
    """Chained scoring with cross-call DP carry (segmented windows).

    conts: (N, W) int32 — slots resuming a window mid-DP (their chain
    entry 0 is the continuation segment; its block-0 reseed is
    suppressed and the state loads from cbig_in/csml_in instead).
    Returns (alt, nul, cbig_out, csml_out); every slot < CW exports its
    end-of-grid state (the scheduler routes only flagged ones onward).
    """
    xts_k, lens_k, rs_k, ck, end_blk = _chain_expand(
        win_sblk, win_len, win_gstart, win_xti, xt_lut, codes_all,
        kappa=kappa, nlb=nlb, maxblk=maxblk)
    # suppress the block-0 reseed of continuation slots
    rs_k = rs_k * (1 - conts[:, None, :, None])
    alt, nul, cbig, csml = _scores_pairs_chain_carry_core(
        pidx, tables, tvecs, xts_k, lens_k, rs_k,
        conts[..., None], cbig_in, csml_in, ck,
        kappa=kappa, interpret=interpret)
    alt_w, nul_w = _chain_compact(alt, nul, end_blk, nlb)
    return alt_w, nul_w, cbig, csml


@functools.lru_cache(maxsize=None)
def _carry_permute_jit(n_src: int, n_dst: int):
    """Device-side carry routing between consecutive segment chunks:
    flat (pair*CW) gather from the previous call's carry_out into the
    next call's carry_in layout."""
    @jax.jit
    def go(cbig, csml, idx):
        # cbig (Ns, 13, CW, Kp) -> flat (Ns*CW, 13, Kp) -> take -> back
        Ns = cbig.shape[0]
        big = cbig.transpose(0, 2, 1, 3).reshape(Ns * CW, 13, -1)
        sml = csml.transpose(0, 2, 1, 3).reshape(Ns * CW, 32, 1)
        big = jnp.take(big, idx, axis=0)
        sml = jnp.take(sml, idx, axis=0)
        Nd = n_dst
        big = big.reshape(Nd, CW, 13, -1).transpose(0, 2, 1, 3)
        sml = sml.reshape(Nd, CW, 32, 1).transpose(0, 2, 1, 3)
        return big, sml
    return go


def viterbi_scores_pairs_chained(pidx, tables, tvecs, win_sblk, win_len,
                                 win_gstart, win_xti, xt_lut, codes_all, *,
                                 nlb, maxblk=None, kappa=None,
                                 interpret=False):
    """Score NPAIR (profile, slot-chain-group) pairs, W slots of up to C
    chained windows each.  See _chained_scores_jit for the argument
    contract; scores are bit-exact vs viterbi_scores_pairs on the same
    windows."""
    kappa, mode, _ = _resolve(kappa, "pending", None)
    assert mode == "pending"
    return _chained_scores_jit(pidx, tables, tvecs, win_sblk, win_len,
                               win_gstart, win_xti, xt_lut, codes_all,
                               kappa=kappa, nlb=nlb,
                               maxblk=nlb if maxblk is None else maxblk,
                               interpret=interpret)


def viterbi_scores_pairs_chained_carry(pidx, tables, tvecs, win_sblk,
                                       win_len, win_gstart, win_xti, conts,
                                       cbig_in, csml_in, xt_lut, codes_all,
                                       *, nlb, kappa=None, interpret=False):
    """Chained scoring with DP carry for segmented over-cap windows; see
    _chained_scores_carry_jit.  maxblk is pinned to nlb (continuation
    segments span the full grid, so their gather slices must cover cap
    blocks)."""
    kappa, mode, _ = _resolve(kappa, "pending", None)
    assert mode == "pending"
    return _chained_scores_carry_jit(
        pidx, tables, tvecs, win_sblk, win_len, win_gstart, win_xti,
        conts, cbig_in, csml_in, xt_lut, codes_all,
        kappa=kappa, nlb=nlb, maxblk=nlb, interpret=interpret)


# ---------------------------------------------------------------------------
# Large-profile path: HBM-resident tables + per-block XLA row gather.
#
# Beyond MAX_PALLAS_KP lanes the (1364, Kp) emission table no longer fits
# VMEM (~90 MB at the reference's K=16384 limit, c-core/model.h:12), and a
# per-row DMA gather is impossible (Mosaic requires DMA slices into tiled
# VMEM to be sublane-aligned; an emission row is 1 sublane).  So the row
# gather is hoisted to XLA: a lax.scan over l-blocks gathers each block's
# (kappa, 5, W, Kp) emission planes with jnp.take (bandwidth-bound,
# aligned), and a stateless Pallas "block kernel" advances the DP kappa
# positions, carrying its state (pending accumulators + previous-position
# rings) through HBM with input/output aliasing.  The DP state still spans
# the FULL K in VMEM (~13 (W, Kp) planes), which is what makes streaming
# only the table sufficient — the recurrence itself is never K-tiled, so
# the delete chain and the E/B specials feedback stay single-kernel.
#
# BIG state rows: 0-4 pending-M slots, 5-9 pending-I slots, 10-12 previous
# M/I/D.  SMALL state rows: 0-19 pending specials (kind*5+slot for N,J,C,R),
# 20-26 previous specials [S B N J C E R], 27 final-T, 28 final-R.
# ---------------------------------------------------------------------------


def _kernel_block_large(l0_ref, e_ref, tvec_ref, xt_ref, len_ref,
                        big_in, small_in, big_out, small_out,
                        BIG, SMALL, sem_big, sem_small, *, kappa, Kp, w):
    W = w
    i = pl.program_id(0)
    l = l0_ref[0] + i + 1  # 1-based DP position
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (W, Kp), 1)
    xt = xt_ref[...]  # (W, 16)

    def xtc(j):
        return xt[:, j:j + 1]

    tv_mms = tvec_ref[TV_MMS]
    tv_ims = tvec_ref[TV_IMS]
    tv_dms = tvec_ref[TV_DMS]
    tv_bm = tvec_ref[TV_BM]
    tv_ii = tvec_ref[TV_II]
    tv_mi = tvec_ref[TV_MI]
    tv_md = tvec_ref[TV_MD]
    tv_ddcum = tvec_ref[TV_DDCUM]

    @pl.when(i == 0)
    def _load():
        cb = pltpu.make_async_copy(big_in, BIG, sem_big)
        cs = pltpu.make_async_copy(small_in, SMALL, sem_small)
        cb.start()
        cs.start()
        cb.wait()
        cs.wait()

    ma = e_ref[0]  # (5, W, Kp) emission rows, fragments STARTING at l
    sm, si, sd = BIG[10], BIG[11], BIG[12]
    ss = SMALL[pl.ds(20, 7)]  # (7, W, 1): S B N J C E R at l-1

    # -- push contributions of state l-1 (same math as _kernel_pending) --
    inner = jnp.minimum(jnp.minimum(sm + tv_mms, si + tv_ims), sd + tv_dms)
    contrib = jnp.minimum(_lane_shift1(inner), ss[1] + tv_bm)
    icand = jnp.minimum(si + tv_ii, sm + tv_mi)
    cN = jnp.minimum(ss[0] + xtc(XT_SN), ss[2] + xtc(XT_NN))
    cJ = jnp.minimum(ss[5] + xtc(XT_EJ), ss[3] + xtc(XT_JJ))
    cC = jnp.minimum(ss[5] + xtc(XT_EC), ss[4] + xtc(XT_CC))
    cR = ss[6]
    for t in range(1, 6):
        st = jax.lax.rem(l - 1 + t, 5)  # dynamic ring slot
        row = ma[t - 1]  # (W, Kp)
        nil = row[:, Kp - 2:Kp - 1]
        bg = row[:, Kp - 1:Kp]
        pm = (contrib + row)[None]
        pi = (icand + bg)[None]
        psm = jnp.stack([cN + nil, cJ + nil, cC + nil, cR + nil])  # (4, W, 1)
        if t == 5:  # slot consumed last step: fresh assignment
            BIG[pl.ds(st, 1)] = pm
            BIG[pl.ds(st + 5, 1)] = pi
            for kind in range(4):
                SMALL[pl.ds(kind * 5 + st, 1)] = psm[kind][None]
        else:
            BIG[pl.ds(st, 1)] = jnp.minimum(BIG[pl.ds(st, 1)], pm)
            BIG[pl.ds(st + 5, 1)] = jnp.minimum(BIG[pl.ds(st + 5, 1)], pi)
            for kind in range(4):
                SMALL[pl.ds(kind * 5 + st, 1)] = jnp.minimum(
                    SMALL[pl.ds(kind * 5 + st, 1)], psm[kind][None])

    # -- consume position l --------------------------------------------
    slot = jax.lax.rem(l, 5)
    M_l = BIG[pl.ds(slot, 1)][0]
    I_l = BIG[pl.ds(slot + 5, 1)][0]
    A = _lane_shift1(M_l) + tv_md
    D_l = _lane_cummin(A - tv_ddcum, lane2, Kp) + tv_ddcum
    E_l = jnp.minimum(jnp.min(M_l, axis=1, keepdims=True),
                      jnp.min(D_l, axis=1, keepdims=True))
    N_l = SMALL[pl.ds(slot, 1)][0]
    J_l = SMALL[pl.ds(slot + 5, 1)][0]
    C_l = SMALL[pl.ds(slot + 10, 1)][0]
    R_l = SMALL[pl.ds(slot + 15, 1)][0] + xtc(XT_RR)
    B_l = jnp.minimum(jnp.minimum(N_l + xtc(XT_NB), E_l + xtc(XT_EB)),
                      J_l + xtc(XT_JB))
    T_l = jnp.minimum(E_l + xtc(XT_ET), C_l + xtc(XT_CT))

    at_end = len_ref[...] == l  # (W, 1)
    SMALL[27:28] = jnp.where(at_end, T_l, SMALL[27])[None]
    SMALL[28:29] = jnp.where(at_end, R_l, SMALL[28])[None]

    BIG[10:11] = M_l[None]
    BIG[11:12] = I_l[None]
    BIG[12:13] = D_l[None]
    ss_l = jnp.stack([jnp.full((W, 1), INF), B_l, N_l, J_l, C_l, E_l, R_l])
    SMALL[pl.ds(20, 7)] = ss_l

    @pl.when(i == kappa - 1)
    def _store():
        cb = pltpu.make_async_copy(BIG, big_out, sem_big)
        cs = pltpu.make_async_copy(SMALL, small_out, sem_small)
        cb.start()
        cs.start()
        cb.wait()
        cs.wait()


def _scores_pairs_hbm_core(pidx, tables, tvecs, xts, lengths, codes, *,
                           kappa, interpret, mixed=False):
    """mixed=True: pidx is (NPAIR, W) — every sublane SLOT may carry a
    different profile of the stacked tables.  The emission gather indexes
    the flattened (P*1364, Kp) table stack at pidx*1364 + code and the
    transition vectors become per-slot (8, W, Kp) planes; the block
    kernel body is untouched (its tvec reads broadcast over either
    rank).  This lifts the one-profile-per-pair restriction for the
    HBM-table tier, so rare long windows from DIFFERENT profiles share
    one wide window group instead of spraying singleton narrow calls
    (the round-4 'w=8 slot floor' for long reads at big K)."""
    _, _, Kp = tables.shape
    NPAIR, NLB = codes.shape[0], codes.shape[1]
    W = codes.shape[4]

    kernel = functools.partial(_kernel_block_large, kappa=kappa, Kp=Kp, w=W)
    tvec_shape = (8, W, Kp) if mixed else (8, Kp)
    tables_flat = tables.reshape(-1, Kp) if mixed else None

    def block_call(E, tvec, xt_p, len_p, l0, big, small):
        return pl.pallas_call(
            kernel,
            grid=(kappa,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # l0 (1,)
                pl.BlockSpec((1, 5, W, Kp), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(tvec_shape,
                             (lambda i: (0, 0, 0)) if mixed
                             else (lambda i: (0, 0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((W, 16), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((W, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),  # big state, HBM
                pl.BlockSpec(memory_space=pl.ANY),  # small state, HBM
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((13, W, Kp), jnp.float32),
                jax.ShapeDtypeStruct((29, W, 1), jnp.float32),
            ],
            input_output_aliases={5: 0, 6: 1},
            scratch_shapes=[
                pltpu.VMEM((13, W, Kp), jnp.float32),
                pltpu.VMEM((29, W, 1), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
            # Plain interpret=True cannot simulate the DMA primitives;
            # TPU-interpret mode models semaphores and async copies.
            interpret=pltpu.InterpretParams() if interpret else False,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT_BYTES),
        )(l0, E, tvec, xt_p, len_p, big, small)

    def pair_body(carry, inp):
        pidx_p, xt_p, len_p, codes_p = inp  # codes_p (NLB, kappa, 5, W)
        if mixed:
            table = None  # per-slot gather against tables_flat below
            tvec = jnp.take(tvecs, pidx_p, axis=0,
                            mode="clip").transpose(1, 0, 2)  # (8, W, Kp)
            offs = (pidx_p * TABLE_SIZE).astype(jnp.int32)  # (W,)
        else:
            table = jax.lax.dynamic_index_in_dim(tables, pidx_p, 0,
                                                 keepdims=False)
            tvec = jax.lax.dynamic_index_in_dim(tvecs, pidx_p, 0,
                                                keepdims=False)
        big0 = jnp.full((13, W, Kp), INF, jnp.float32)
        small0 = jnp.concatenate([
            jnp.full((20, W, 1), INF, jnp.float32),  # pending N J C R
            jnp.zeros((1, W, 1), jnp.float32),  # S_0 = 0
            xt_p[:, XT_SB].reshape(1, W, 1),  # B_0 = SB
            jnp.full((4, W, 1), INF, jnp.float32),  # N J C E
            -xt_p[:, XT_RR].reshape(1, W, 1),  # R_0 (so R_1 = nil_1)
            jnp.full((2, W, 1), INF, jnp.float32),  # T/R finals
        ])

        def blk(state, xs):
            big, small = state
            nlb, codes_blk = xs
            if mixed:
                rows = codes_blk + offs[None, None, :]  # (kappa, 5, W)
                E = jnp.take(tables_flat, rows.reshape(-1), axis=0,
                             mode="clip").reshape(kappa, 5, W, Kp)
            else:
                E = jnp.take(table, codes_blk.reshape(-1), axis=0,
                             mode="clip").reshape(kappa, 5, W, Kp)
            l0 = jnp.reshape(nlb * kappa, (1,)).astype(jnp.int32)
            big, small = block_call(E, tvec, xt_p, len_p, l0, big, small)
            return (big, small), None

        (big, small), _ = jax.lax.scan(
            blk, (big0, small0),
            (jnp.arange(NLB, dtype=jnp.int32), codes_p))
        return carry, (small[27, :, 0], small[28, :, 0])

    _, (alt, nul) = jax.lax.scan(pair_body, None,
                                 (pidx, xts, lengths, codes))
    return alt, nul


_scores_pairs_hbm_jit = functools.partial(jax.jit, static_argnames=(
    "kappa", "interpret"))(_scores_pairs_hbm_core)


def viterbi_scores_pairs_hbm(pidx, tables, tvecs, xts, lengths, codes, *,
                             kappa=None, interpret=False):
    """Large-profile variant of viterbi_scores_pairs: emission tables stay
    in HBM and each l-block's rows are gathered by XLA, so Kp is bounded
    by the DP-state VMEM footprint (~23·W·Kp·4 bytes incl. the emission
    block double-buffer), not the table's — covering the reference's full
    K <= 16384 range (c-core/model.h:12).  Codes must be packed in
    "pending" layout (start-indexed, as bucket_arrays/pack_windows emit
    for mode="pending").  Same contract as viterbi_scores_pairs."""
    kappa, _, _ = _resolve(kappa, "pending", None)
    return _scores_pairs_hbm_jit(pidx, tables, tvecs, xts, lengths, codes,
                                 kappa=kappa, interpret=interpret)


# ---------------------------------------------------------------------------
# Host-side packing: (B windows) -> (WG groups of W), codes relayout.
# ---------------------------------------------------------------------------


def slot_major_codes(c: np.ndarray) -> np.ndarray:
    """Permute (B, Lk, 5) duration-major codes into slot-major order.

    out[b, lp, s] = c[b, lp, t-1] where t is the duration whose source ring
    slot at DP position l = lp+1 is s: (l - t) mod 5 == s, i.e.
    t = ((lp - s) mod 5) + 1.  Lets the kernel's gather store with static
    slot indices (GATHER_MODE "static")."""
    _, Lk, _ = c.shape
    lp = np.arange(Lk)[:, None]
    s = np.arange(5)[None, :]
    tmap = (lp - s) % 5  # t - 1
    return np.take_along_axis(c, tmap[None].astype(np.int64), axis=2)


def relayout_codes(c: np.ndarray, mode: str) -> np.ndarray:
    """Apply the gather mode's host-side code permutation to (B, Lk, 5)
    duration-major end-indexed codes ("raw" = leave untouched, for the
    lax.scan scorer)."""
    if mode == "static":
        return slot_major_codes(c)
    if mode == "pending":
        return start_codes(c)
    return c


def pack_windows(xt: np.ndarray, codes: np.ndarray, lengths: np.ndarray,
                 kappa: int | None = None, mode: str | None = None,
                 w: int = W):
    """Relayout a window batch for the kernel.

    xt (B, 13) f32; codes (B, Lpad, 5) int32 duration-major END-indexed
    fragment codes; lengths (B,).
    Returns (xts (WG, W, 16), lengths (WG, W, 1), codes (WG, NLB, kappa, 5, W)).
    """
    kappa, mode, _ = _resolve(kappa, mode, None)
    W = w
    B, Lpad, _ = codes.shape
    WG = (B + W - 1) // W
    Lk = round_up(max(Lpad, 1), kappa)
    NLB = Lk // kappa

    xts = np.zeros((WG * W, 16), np.float32)
    xts[:B, :13] = xt
    xts = xts.reshape(WG, W, 16)

    lens = np.zeros((WG * W,), np.int32)
    lens[:B] = lengths
    lens = lens.reshape(WG, W, 1)

    c = np.zeros((WG * W, Lk, 5), np.int32)
    c[:B, :Lpad] = codes
    c = relayout_codes(c, mode)
    # (WG*W, Lk, 5) -> (WG, NLB, kappa, 5, W)
    c = c.reshape(WG, W, NLB, kappa, 5).transpose(0, 2, 3, 4, 1)
    return xts, lens, np.ascontiguousarray(c)


class PallasScanEngine:
    """Caches kernel-ready tables per profile pack; scores (P, B) tiles."""

    def __init__(self, costs_list: list[ViterbiCosts], interpret: bool = False,
                 w: int = W):
        self.w = w
        Kp = common_kp(costs_list)
        pairs = [build_tables(c, Kp) for c in costs_list]
        self.tables = jnp.asarray(np.stack([t for t, _ in pairs]))
        self.tvecs = jnp.asarray(np.stack([v for _, v in pairs]))
        self.interpret = interpret

    def scores(self, xt: np.ndarray, codes: np.ndarray, lengths: np.ndarray):
        """Returns (null_costs, alt_costs): (P, B) f32."""
        B = codes.shape[0]
        kappa, mode, prefetch = _resolve(None, None, None)
        xts, lens, ck = pack_windows(xt, codes, lengths, kappa=kappa,
                                     mode=mode, w=self.w)
        alt, nul = viterbi_scores_grid(
            self.tables, self.tvecs, jnp.asarray(xts), jnp.asarray(lens),
            jnp.asarray(ck), kappa=kappa, mode=mode, prefetch=prefetch,
            interpret=self.interpret)
        P = self.tables.shape[0]
        alt = np.asarray(alt).reshape(P, -1)[:, :B]
        nul = np.asarray(nul).reshape(P, -1)[:, :B]
        return nul, alt


# ---------------------------------------------------------------------------
# Path-mode pairs kernel: trellis emission for phase-2 survivors.
#
# Pull formulation with t-ORDERED candidate evaluation so every argmin
# tie-break replicates the reference's first-minimum-wins scan order
# (c-core/viterbi.c facc; mirrored from ops/viterbi_jax.py:119-186, the
# oracle the golden tests anchor).  Candidate VALUES are computed with the
# identical f32 operation shapes as viterbi_jax (same sums per candidate),
# so min equality is exact and tie-breaks agree bit-for-bit.  Emits the
# packed trellis (state.h:28-39 encodings) as int32 planes that stay on
# device for the traceback walk (ops/traceback.py unzip_device_batch).
# Large-K profiles (Kp > MAX_PALLAS_KP) keep the lax.scan path pass — the
# VMEM table does not fit; survivors there are rare and bounded.
# ---------------------------------------------------------------------------


def _kernel_path(codes_ref, table_ref, tvec_ref, xt_ref, len_ref,
                 xn_ref, nd_ref,
                 M, I, D, SML, *, kappa, Kp, nlb_dim, w=W):
    W = w
    nlb = pl.program_id(nlb_dim)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (W, Kp), 1)
    xt = xt_ref[0]

    def xtc(j):
        return xt[:, j:j + 1]

    tv_mms = tvec_ref[0, TV_MMS]
    tv_ims = tvec_ref[0, TV_IMS]
    tv_dms = tvec_ref[0, TV_DMS]
    tv_bm = tvec_ref[0, TV_BM]
    tv_ii = tvec_ref[0, TV_II]
    tv_mi = tvec_ref[0, TV_MI]
    tv_md = tvec_ref[0, TV_MD]
    tv_ddcum = tvec_ref[0, TV_DDCUM]

    @pl.when(nlb == 0)
    def _init():
        M[...] = jnp.full((5, W, Kp), INF)
        I[...] = jnp.full((5, W, Kp), INF)
        D[...] = jnp.full((5, W, Kp), INF)
        SML[...] = jnp.full((7, 5, W, 1), INF)
        SML[0:1, 0:1] = jnp.zeros((1, 1, W, 1))
        SML[1:2, 0:1] = xtc(XT_SB)[None, None]

    def step(i, _):
        l = nlb * kappa + i + 1

        # ---- per-duration state/emission in t-DESC order -------------
        # init codes = the FIRST candidate in scan order (what argmin
        # yields on all-inf rows), so even unreachable states' packed
        # fields match the viterbi_jax oracle bit-for-bit
        best_m = jnp.full((W, Kp), INF)
        bm_code = jnp.full((W, Kp), 0 * 5 + 4, jnp.int32)  # t5 BM
        best_i = jnp.full((W, Kp), INF)
        bi_code = jnp.full((W, Kp), 5 + 4, jnp.int32)  # t5 II
        best_n = jnp.full((W, 1), INF)
        n_code = jnp.full((W, 1), 4, jnp.int32)  # t5 first-cand
        best_j = jnp.full((W, 1), INF)
        j_code = jnp.full((W, 1), 4, jnp.int32)
        best_c = jnp.full((W, 1), INF)
        c_code = jnp.full((W, 1), 4, jnp.int32)

        def consider(best, code, cand, c):
            take = cand < best
            return (jnp.minimum(best, cand),
                    jnp.where(take, jnp.int32(c), code))

        for t in range(5, 0, -1):
            rows = [table_ref[0, pl.ds(codes_ref[0, 0, i, t - 1, wq], 1), :]
                    for wq in range(W)]
            ma_t = jnp.concatenate(rows, axis=0)  # (W, Kp)
            nil_t = ma_t[:, Kp - 2:Kp - 1]
            bg_t = ma_t[:, Kp - 1:Kp]
            s = jax.lax.rem(l - t + 10, 5)
            Mr_t = M[pl.ds(s, 1)][0]
            Ir_t = I[pl.ds(s, 1)][0]
            Dr_t = D[pl.ds(s, 1)][0]
            sml_t = SML[:, pl.ds(s, 1), :, :]
            Sr_t, Br_t, Nr_t = sml_t[0, 0], sml_t[1, 0], sml_t[2, 0]
            Jr_t, Cr_t, Er_t = sml_t[3, 0], sml_t[4, 0], sml_t[5, 0]

            # duration validity (t > l): states at l-t don't exist; the
            # rings provide +inf there by construction, and S_{l-t} is
            # only finite when l == t (slot arithmetic lands on the seed)
            # — matches viterbi_jax's explicit masking.

            # M candidates, inner order BM, MM, IM, DM (field choice*5+t-1)
            candBM = (Br_t + tv_bm) + ma_t
            candMM = _lane_shift1(Mr_t + tv_mms) + ma_t
            candIM = _lane_shift1(Ir_t + tv_ims) + ma_t
            candDM = _lane_shift1(Dr_t + tv_dms) + ma_t
            best_m, bm_code = consider(best_m, bm_code, candBM,
                                       0 * 5 + (t - 1))
            best_m, bm_code = consider(best_m, bm_code, candMM,
                                       1 * 5 + (t - 1))
            best_m, bm_code = consider(best_m, bm_code, candIM,
                                       2 * 5 + (t - 1))
            best_m, bm_code = consider(best_m, bm_code, candDM,
                                       3 * 5 + (t - 1))
            # I candidates, inner order II, MI (field: II base 5, MI 0)
            candII = (Ir_t + tv_ii) + bg_t
            candMI = (Mr_t + tv_mi) + bg_t
            best_i, bi_code = consider(best_i, bi_code, candII,
                                       5 + (t - 1))
            best_i, bi_code = consider(best_i, bi_code, candMI,
                                       0 + (t - 1))
            # specials, inner order (first, second) as viterbi_jax order2
            candSN = (Sr_t + xtc(XT_SN)) + nil_t
            candNN = (Nr_t + xtc(XT_NN)) + nil_t
            best_n, n_code = consider(best_n, n_code, candSN, 0 + (t - 1))
            best_n, n_code = consider(best_n, n_code, candNN, 5 + (t - 1))
            candEJ = (Er_t + xtc(XT_EJ)) + nil_t
            candJJ = (Jr_t + xtc(XT_JJ)) + nil_t
            best_j, j_code = consider(best_j, j_code, candEJ, 0 + (t - 1))
            best_j, j_code = consider(best_j, j_code, candJJ, 5 + (t - 1))
            candEC = (Er_t + xtc(XT_EC)) + nil_t
            candCC = (Cr_t + xtc(XT_CC)) + nil_t
            best_c, c_code = consider(best_c, c_code, candEC, 0 + (t - 1))
            best_c, c_code = consider(best_c, c_code, candCC, 5 + (t - 1))

        M_l, I_l = best_m, best_i
        N_l, J_l, C_l = best_n, best_j, best_c

        # ---- delete chain + D backpointer ----------------------------
        A = _lane_shift1(M_l) + tv_md
        D_l = _lane_cummin(A - tv_ddcum, lane2, Kp) + tv_ddcum
        d_is_dd = (D_l < A).astype(jnp.int32)  # MD wins ties

        # ---- E argmin over (M_0, D_0, M_1, D_1, ...) -----------------
        vals = jnp.minimum(M_l, D_l)
        rowmin = jnp.min(vals, axis=1, keepdims=True)
        big = jnp.int32(1 << 30)
        k_first = jnp.min(jnp.where(vals == rowmin, lane2, big), axis=1,
                          keepdims=True)  # (W, 1)
        m_hits = jnp.where((lane2 == k_first) & (M_l == rowmin), 1, 0)
        m_at_k = jnp.max(m_hits, axis=1, keepdims=True)  # 1 if M wins
        e_field = 2 * k_first + (1 - m_at_k)
        E_l = rowmin

        # ---- B / T argmins ------------------------------------------
        cb = [N_l + xtc(XT_NB), E_l + xtc(XT_EB), J_l + xtc(XT_JB)]
        B_l = jnp.full((W, 1), INF)
        b_field = jnp.ones((W, 1), jnp.int32)  # argmin(all-inf) = NB
        for ci, cand in enumerate(cb):
            take = cand < B_l
            B_l = jnp.minimum(B_l, cand)
            b_field = jnp.where(take, jnp.int32(ci + 1), b_field)
        ct = [E_l + xtc(XT_ET), C_l + xtc(XT_CT)]
        T_l = jnp.full((W, 1), INF)
        t_field = jnp.zeros((W, 1), jnp.int32)
        for ci, cand in enumerate(ct):
            take = cand < T_l
            T_l = jnp.minimum(T_l, cand)
            t_field = jnp.where(take, jnp.int32(ci), t_field)

        # ---- pack + store trellis rows -------------------------------
        # xnode: N(4b@0) B(2b@4) E(15b@6) C(4b@21) T(1b@25) J(4b@26)
        xnode = (n_code | (b_field << 4) | (e_field << 6) | (c_code << 21)
                 | (t_field << 25) | (j_code << 26))  # (W, 1) i32
        # node: M(5b@0) D(1b@5) I(4b@6)
        node = bm_code | (d_is_dd << 5) | (bi_code << 6)  # (W, Kp) i32
        xn_ref[0, 0, i] = xnode
        nd_ref[0, 0, i] = node

        # ---- ring writes --------------------------------------------
        slot = jax.lax.rem(l, 5)
        M[pl.ds(slot, 1)] = M_l[None]
        I[pl.ds(slot, 1)] = I_l[None]
        D[pl.ds(slot, 1)] = D_l[None]
        smalls = jnp.stack([jnp.full((W, 1), INF), B_l, N_l, J_l, C_l,
                            E_l, jnp.full((W, 1), INF)])
        SML[:, pl.ds(slot, 1)] = smalls[:, None]
        return 0

    # skip l-blocks past the group's longest window (see _kernel_pending):
    # the trellis rows of skipped blocks are never read (every walk starts
    # at its slot's length <= the group max), so all-pad pairs and
    # trailing rung-quantization blocks cost no vector work
    @pl.when(pl.program_id(nlb_dim) * kappa < jnp.max(len_ref[0]))
    def _run():
        jax.lax.fori_loop(0, kappa, step, 0)


def _paths_pairs_core(pidx, tables, tvecs, xts, lengths, codes, *,
                      kappa, interpret):
    _, _, Kp = tables.shape
    NPAIR, NLB = codes.shape[0], codes.shape[1]
    W = codes.shape[4]
    inner = functools.partial(_kernel_path, kappa=kappa, Kp=Kp, nlb_dim=1,
                              w=W)

    def kernel(pidx_ref, *rest):
        inner(*rest)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NPAIR, NLB),
        in_specs=[
            pl.BlockSpec((1, 1, kappa, 5, W),
                         lambda pair, nlb, pidx: (pair, nlb, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TABLE_SIZE, Kp),
                         lambda pair, nlb, pidx: (pidx[pair], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, Kp),
                         lambda pair, nlb, pidx: (pidx[pair], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, 16), lambda pair, nlb, pidx: (pair, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, 1), lambda pair, nlb, pidx: (pair, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, kappa, W, 1),
                         lambda pair, nlb, pidx: (pair, nlb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kappa, W, Kp),
                         lambda pair, nlb, pidx: (pair, nlb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((5, W, Kp), jnp.float32),  # M ring
            pltpu.VMEM((5, W, Kp), jnp.float32),  # I ring
            pltpu.VMEM((5, W, Kp), jnp.float32),  # D ring
            pltpu.VMEM((7, 5, W, 1), jnp.float32),  # small rings
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((NPAIR, NLB, kappa, W, 1), jnp.int32),
        jax.ShapeDtypeStruct((NPAIR, NLB, kappa, W, Kp), jnp.int32),
    ]
    xn, nd = pl.pallas_call(
        kernel, out_shape=out_shape, grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
    )(pidx, codes, tables, tvecs, xts, lengths)
    Lk = NLB * kappa
    # (NPAIR, Lk, W[, Kp]) -> per-window-major (NPAIR, W, Lk[, Kp])
    xn = xn.reshape(NPAIR, Lk, W).transpose(0, 2, 1)
    nd = nd.reshape(NPAIR, Lk, W, Kp).transpose(0, 2, 1, 3)
    return xn, nd


_paths_pairs_jit = functools.partial(jax.jit, static_argnames=(
    "kappa", "interpret"))(_paths_pairs_core)


def _ck_end_from_starts(codes_all, starts, nlb, kappa):
    """END-indexed codes for the pull-mode path kernel, gathered from the
    scan-resident START-indexed array: the duration-t fragment ENDING at
    DP position l starts at global row gstart + l - t."""
    N, W = starts.shape
    Lk = nlb * kappa
    lp = jnp.arange(Lk, dtype=jnp.int32)
    cols = []
    for t in range(1, 6):
        idx = starts[:, None, :] + (lp[None, :, None] + 1 - t)
        idx = jnp.clip(idx, 0, codes_all.shape[0] - 1)  # (N, Lk, W)
        cols.append(jnp.take(codes_all[:, t - 1], idx, axis=0))
    ck = jnp.stack(cols, axis=2)  # (N, Lk, 5, W)
    return ck.reshape(N, nlb, kappa, 5, W)


@functools.partial(jax.jit, static_argnames=("kappa", "nlb", "interpret"))
def _gather_paths_pairs_jit(pidx, tables, tvecs, xts, lengths, starts,
                            codes_all, *, kappa, nlb, interpret):
    ck = _ck_end_from_starts(codes_all, starts, nlb, kappa)
    return _paths_pairs_core(pidx, tables, tvecs, xts, lengths, ck,
                             kappa=kappa, interpret=interpret)


def viterbi_paths_pairs(pidx, tables, tvecs, xts, lengths, starts=None,
                        codes_all=None, codes=None, *, nlb=None,
                        kappa=None, interpret=False):
    """Trellis for NPAIR (profile, window-group) pairs (phase-2 pass).

    Either device-side packing (starts + codes_all, production) or a
    materialized END-indexed `codes` block (tests).  Returns
    (xnodes (NPAIR, W, Lk) i32, nodes (NPAIR, W, Lk, Kp) i32) device
    arrays — rows l-1 hold DP position l; the traceback walk consumes
    them on device."""
    kappa, _, _ = _resolve(kappa, "static", None)  # pull-mode kappa
    if codes is not None:
        return _paths_pairs_jit(pidx, tables, tvecs, xts, lengths, codes,
                                kappa=kappa, interpret=interpret)
    return _gather_paths_pairs_jit(pidx, tables, tvecs, xts, lengths,
                                   starts, codes_all, kappa=kappa, nlb=nlb,
                                   interpret=interpret)


# ---------------------------------------------------------------------------
# Lane-packed small-K tier: NSEG profiles per lane plane.
#
# Real Pfam mass sits at small K, and a K=50 profile fills 41% of even the
# minimum 128-lane bucket while its (W, 128) state planes are too small to
# amortize the kernel's fixed per-position work (the measured per-PADDED-
# lane rate grows with Kp; docs/perf_round3.md).  This tier packs NSEG
# profiles side by side in the lane dim — segment s owns lanes
# [s*seg, (s+1)*seg), seg = Kp/NSEG — restoring both lane fill and plane
# size.  The reference's striping wastes nothing at any K
# (c-core/viterbi.c:195-221); this is the TPU answer for the same regime.
#
# The one structural constraint is the emission gather: one table-row copy
# feeds ALL lanes of a (t, window-slot) pair, so every segment of a slot
# must scan the SAME window (same sequence, same start/stop — then the
# fragment codes, window length and xtrans are shared too).  The scan
# scheduler therefore packs only window-identical items (whole-read
# windows are identical across profiles by construction, window.c:30);
# anything else runs on the classic unpacked tier.  To keep one gather
# per (t, slot) while giving each segment its own background/null
# emissions, the packed table row is widened to 2*Kp + PACK_PAD:
#
#   cols [0, Kp)          match costs, per segment (pads +inf)
#   cols [Kp, 2*Kp)       the owning segment's background (insert) cost
#                         replicated across its lanes — lane-aligned with
#                         the I update, so no per-segment broadcasts
#   cols [2*Kp, 2*Kp+S)   per-segment null costs — one static (W, S)
#                         slice feeds all special-state updates
#
# Specials (S/N/B/J/E/C/T/R) become per-(window, segment) (W, NSEG)
# planes; E/B feedback is masked per segment (the masked-feedback design
# VERDICT r3 named); the delete-chain prefix scan masks at segment
# boundaries (lane_seg), which also keeps segment s>0 bit-identical to a
# single-profile run (no catastrophic +/-NEG_BIG cancellation across
# segments).  Scores are asserted bit-equal to the unpacked kernel in
# tests/test_pallas_packed.py.
# ---------------------------------------------------------------------------

PACK_PAD = 128  # pad after the per-segment null column block


def packed_width(Kp: int) -> int:
    """Packed emission-table row width for a Kp-lane plane."""
    return 2 * Kp + PACK_PAD


def build_tables_packed(costs_list: list[ViterbiCosts], seg: int,
                        nseg: int):
    """Combined emission table + transition vectors for NSEG profiles.

    costs_list holds <= nseg profiles (missing trailing segments stay
    +inf everywhere and score +inf).  Each profile needs K + 1 <= seg so
    at least one +inf pad lane separates segments (the unmasked lane
    shift then cannot leak finite values across a boundary).
    Returns (table (1364, 2*Kp+PACK_PAD) f32, tvec (8, Kp) f32)."""
    assert len(costs_list) <= nseg
    Kp = seg * nseg
    Wt = packed_width(Kp)
    table = np.full((TABLE_SIZE, Wt), np.inf, np.float32)
    tvec = np.full((8, Kp), np.inf, np.float32)
    tvec[TV_DDCUM] = 0.0
    for s, costs in enumerate(costs_list):
        K = costs.K
        assert K + 1 <= seg, (K, seg)
        o = s * seg
        table[:, o:o + K] = costs.match
        table[:, Kp + o:Kp + o + seg] = costs.background[:, None]
        table[:, 2 * Kp + s] = costs.null
        core = costs.core
        tvec[TV_BM, o:o + K] = core[CT_BM]
        tvec[TV_MMS, o:o + K - 1] = core[CT_MM, 1:]
        tvec[TV_IMS, o:o + K - 1] = core[CT_IM, 1:]
        tvec[TV_DMS, o:o + K - 1] = core[CT_DM, 1:]
        tvec[TV_MI, o:o + K] = core[CT_MI]
        tvec[TV_II, o:o + K] = core[CT_II]
        tvec[TV_MD, o:o + K] = core[CT_MD]
        # per-segment saturated DD cumsum: restarting per segment keeps
        # the prefix values bit-identical to a single-profile build (the
        # delete-chain scan masks at segment boundaries, so no
        # cross-segment difference is ever formed)
        ddc = np.zeros(seg, np.float32)
        ddc[1:K] = np.minimum(core[CT_DD, 1:K], NEG_BIG)
        ddc[K:] = NEG_BIG
        tvec[TV_DDCUM, o:o + seg] = np.cumsum(
            ddc, dtype=np.float64).astype(np.float32)
    return table, tvec


def _kernel_pending_packed(codes_ref, table_ref, tvec_ref, xt_ref, len_ref,
                           *refs, kappa, Kp, nseg, nlb_dim, w=W,
                           chain=False):
    """Segment-packed variant of _kernel_pending (same recurrence; see the
    section comment above for the packed layout).

    Chain mode mirrors _kernel_pending's, with PER-SEGMENT window
    metadata: each sublane slot carries a shared CODE stream (a chain of
    read runs — one gather feeds every segment's lanes), while xt/len/
    reset are per (block, slot, SEGMENT), so each segment lays its OWN
    window list on the slot's block axis (reseeding its lane range and
    latching T/R independently).  This is what lets profiles with
    K-dependent window boundaries (window.c: min(50K, 100k) nt) share
    one packed plane: the windows differ per segment, the codes do not.
    Outputs land per (pair, block, slot, segment) for the caller's
    end-block compaction."""
    if chain:
        (reset_ref, alt_ref, null_ref,
         MA, PM, PI, PSM, ST, SS, Tfin, Rfin) = refs
    else:
        (alt_ref, null_ref,
         MA, PM, PI, PSM, ST, SS, Tfin, Rfin) = refs
    W = w
    S = nseg
    seg = Kp // S
    nlb = pl.program_id(nlb_dim)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (W, Kp), 1)
    lane_seg = jax.lax.rem(lane2, seg)
    seg_id = lane2 // seg
    if chain:
        xt = xt_ref[0, 0]  # (W, S, 16) per-segment active-window xtrans
        lens = len_ref[0, 0]  # (W, S) per-segment chain-coord ends

        def xtc(j):  # (W, S) aligns with the per-segment specials
            return xt[:, :, j]
    else:
        xt = xt_ref[0]  # (W, 16); shared (same window, same length)
        lens = len_ref[0]  # (W, 1)

        def xtc(j):  # (W, 1) broadcasts against the (W, S) specials
            return xt[:, j:j + 1]

    tv_mms = tvec_ref[0, TV_MMS]
    tv_ims = tvec_ref[0, TV_IMS]
    tv_dms = tvec_ref[0, TV_DMS]
    tv_bm = tvec_ref[0, TV_BM]
    tv_ii = tvec_ref[0, TV_II]
    tv_mi = tvec_ref[0, TV_MI]
    tv_md = tvec_ref[0, TV_MD]
    tv_ddcum = tvec_ref[0, TV_DDCUM]

    def seg_to_lanes(v):
        """(W, S) per-segment scalars -> (W, Kp) lane broadcast."""
        out = v[:, 0:1]
        for s in range(1, S):
            out = jnp.where(seg_id == s, v[:, s:s + 1], out)
        return out

    @pl.when(nlb == 0)
    def _init():
        PM[...] = jnp.full((5, W, Kp), INF)
        PI[...] = jnp.full((5, W, Kp), INF)
        PSM[...] = jnp.full((4, 5, W, S), INF)
        ST[...] = jnp.full((3, W, Kp), INF)
        inf_ws = jnp.full((W, S), INF)
        if chain:
            # seeds come from the per-slot reseed below (slot windows
            # start at arbitrary blocks); pad slots stay +inf forever
            SS[...] = jnp.full((7, W, S), INF)
        else:
            SS[...] = jnp.stack([
                jnp.zeros((W, S)),  # S_0 = 0
                jnp.broadcast_to(xtc(XT_SB), (W, S)),  # B_0
                inf_ws, inf_ws, inf_ws, inf_ws,  # N J C E
                jnp.broadcast_to(-xtc(XT_RR), (W, S)),  # R_0
            ])
        Tfin[...] = inf_ws
        Rfin[...] = inf_ws

    if chain:
        rs = reset_ref[0, 0] > 0  # (W, S) segments starting a window here

        @pl.when(jnp.max(reset_ref[0, 0]) > 0)
        def _reseed():
            # lane-range mask: only the reseeding segment's lanes clear
            rs_l = seg_to_lanes(
                reset_ref[0, 0].astype(jnp.float32)) > 0  # (W, Kp)
            PM[...] = jnp.where(rs_l[None], INF, PM[...])
            PI[...] = jnp.where(rs_l[None], INF, PI[...])
            PSM[...] = jnp.where(rs[None, None], INF, PSM[...])
            ST[...] = jnp.where(rs_l[None], INF, ST[...])
            inf_ws = jnp.full((W, S), INF)
            seeds = jnp.stack([
                jnp.zeros((W, S)),  # S_0 = 0
                jnp.broadcast_to(xtc(XT_SB), (W, S)),  # B_0
                inf_ws, inf_ws, inf_ws, inf_ws,  # N J C E
                jnp.broadcast_to(-xtc(XT_RR), (W, S)),  # R_0
            ])
            SS[...] = jnp.where(rs[None], seeds, SS[...])
            Tfin[...] = jnp.where(rs, INF, Tfin[...])
            Rfin[...] = jnp.where(rs, INF, Rfin[...])

    def phase(i, r, sm, si, sd, ss):
        l = nlb * kappa + 5 * i + r + 1
        i_blk = 5 * i + r
        slot = (r + 1) % 5  # l % 5, static

        # one gather per (t, slot): the packed row carries match + lane-
        # aligned bg + per-segment null, so segments share the DMA
        for t in range(1, 6):
            for w_ in range(W):
                c = codes_ref[0, 0, i_blk, t - 1, w_]
                MA[t - 1, w_:w_ + 1, :] = table_ref[0, pl.ds(c, 1), :]

        inner = jnp.minimum(jnp.minimum(sm + tv_mms, si + tv_ims),
                            sd + tv_dms)
        contrib = jnp.minimum(_lane_shift1(inner),
                              seg_to_lanes(ss[1]) + tv_bm)
        icand = jnp.minimum(si + tv_ii, sm + tv_mi)
        cN = jnp.minimum(ss[0] + xtc(XT_SN), ss[2] + xtc(XT_NN))
        cJ = jnp.minimum(ss[5] + xtc(XT_EJ), ss[3] + xtc(XT_JJ))
        cC = jnp.minimum(ss[5] + xtc(XT_EC), ss[4] + xtc(XT_CC))
        cR = ss[6]
        for t in range(1, 6):
            st = (r + t) % 5  # (l-1+t) % 5, static
            full = MA[t - 1]  # (W, 2*Kp + PACK_PAD)
            row = full[:, :Kp]
            bg = full[:, Kp:2 * Kp]  # lane-aligned per-segment bg
            nil = full[:, 2 * Kp:2 * Kp + S]  # (W, S) per-segment null
            if t == 5:  # earliest contributor: fresh assignment
                PM[st] = contrib + row
                PI[st] = icand + bg
                PSM[0, st] = cN + nil
                PSM[1, st] = cJ + nil
                PSM[2, st] = cC + nil
                PSM[3, st] = cR + nil
            else:
                PM[st] = jnp.minimum(PM[st], contrib + row)
                PI[st] = jnp.minimum(PI[st], icand + bg)
                PSM[0, st] = jnp.minimum(PSM[0, st], cN + nil)
                PSM[1, st] = jnp.minimum(PSM[1, st], cJ + nil)
                PSM[2, st] = jnp.minimum(PSM[2, st], cC + nil)
                PSM[3, st] = jnp.minimum(PSM[3, st], cR + nil)

        # -- consume position l ------------------------------------------
        M_l = PM[slot]
        I_l = PI[slot]
        A = _lane_shift1(M_l) + tv_md
        # segment-masked delete-chain scan: shifts never cross a boundary
        D_l = _lane_cummin(A - tv_ddcum, lane_seg, seg) + tv_ddcum
        md = jnp.minimum(M_l, D_l)
        E_l = jnp.concatenate(
            [jnp.min(jnp.where(seg_id == s, md, INF), axis=1, keepdims=True)
             for s in range(S)], axis=1)  # (W, S) masked E feedback
        N_l = PSM[0, slot]
        J_l = PSM[1, slot]
        C_l = PSM[2, slot]
        R_l = PSM[3, slot] + xtc(XT_RR)
        B_l = jnp.minimum(jnp.minimum(N_l + xtc(XT_NB), E_l + xtc(XT_EB)),
                          J_l + xtc(XT_JB))
        T_l = jnp.minimum(E_l + xtc(XT_ET), C_l + xtc(XT_CT))

        # (W, S) per-segment in chain mode; (W, 1) broadcast otherwise
        at_end = lens == l
        Tfin[...] = jnp.where(at_end, T_l, Tfin[...])
        Rfin[...] = jnp.where(at_end, R_l, Rfin[...])

        ss_l = jnp.stack([jnp.full((W, S), INF), B_l, N_l, J_l, C_l,
                          E_l, R_l])
        return M_l, I_l, D_l, ss_l

    def macro_step(i, _):
        sm, si, sd = ST[0], ST[1], ST[2]
        ss = SS[...]
        for r in range(5):
            sm, si, sd, ss = phase(i, r, sm, si, sd, ss)
        ST[0] = sm
        ST[1] = si
        ST[2] = sd
        SS[...] = ss
        return 0

    # skip blocks past the longest window (see _kernel_pending): all-pad
    # pairs and trailing rung-quantization blocks cost no vector work;
    # in chain mode `lens` is per-block so under-filled chains' trailing
    # blocks skip the same way
    @pl.when(nlb * kappa < jnp.max(lens))
    def _run():
        jax.lax.fori_loop(0, kappa // 5, macro_step, 0)

    alt_ref[0, 0] = Tfin[...]
    null_ref[0, 0] = Rfin[...]


def _scores_pairs_packed_core(pidx, tables, tvecs, xts, lengths, codes, *,
                              kappa, nseg, interpret):
    _, _, Kp = tvecs.shape
    Wt = tables.shape[2]
    NPAIR, NLB = codes.shape[0], codes.shape[1]
    W = codes.shape[4]
    inner = functools.partial(_kernel_pending_packed, kappa=kappa, Kp=Kp,
                              nseg=nseg, nlb_dim=1, w=W)

    def kernel(pidx_ref, *rest):
        inner(*rest)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NPAIR, NLB),
        in_specs=[
            pl.BlockSpec((1, 1, kappa, 5, W),
                         lambda pair, nlb, pidx: (pair, nlb, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TABLE_SIZE, Wt),
                         lambda pair, nlb, pidx: (pidx[pair], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, Kp),
                         lambda pair, nlb, pidx: (pidx[pair], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, 16), lambda pair, nlb, pidx: (pair, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, 1), lambda pair, nlb, pidx: (pair, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, W, nseg),
                         lambda pair, nlb, pidx: (pair, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, nseg),
                         lambda pair, nlb, pidx: (pair, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((5, W, Wt), jnp.float32),  # MA gather staging
            pltpu.VMEM((5, W, Kp), jnp.float32),  # PM pending M
            pltpu.VMEM((5, W, Kp), jnp.float32),  # PI pending I
            pltpu.VMEM((4, 5, W, nseg), jnp.float32),  # PSM pending N J C R
            pltpu.VMEM((3, W, Kp), jnp.float32),  # ST prev M/I/D
            pltpu.VMEM((7, W, nseg), jnp.float32),  # SS prev specials
            pltpu.VMEM((W, nseg), jnp.float32),  # T final
            pltpu.VMEM((W, nseg), jnp.float32),  # R final
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((NPAIR, 1, W, nseg), jnp.float32),
        jax.ShapeDtypeStruct((NPAIR, 1, W, nseg), jnp.float32),
    ]
    alt, nul = pl.pallas_call(
        kernel, out_shape=out_shape, grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
    )(pidx, codes, tables, tvecs, xts, lengths)
    return alt[:, 0], nul[:, 0]


_scores_pairs_packed_jit = functools.partial(jax.jit, static_argnames=(
    "kappa", "nseg", "interpret"))(_scores_pairs_packed_core)


def _scores_pairs_packed_chain_core(pidx, tables, tvecs, xts, lengths,
                                    resets, codes, *, kappa, nseg,
                                    interpret):
    """Chained packed pairs kernel call (see _scores_pairs_chain_core).

    xts (N, NLB, W, S, 16) f32; lengths/resets (N, NLB, W, S) i32 —
    PER-SEGMENT active-window metadata over the slot's shared code
    stream; codes (N, NLB, kappa, 5, W) i32 START-indexed; tables
    (NPACK, 1364, 2*Kp+PACK_PAD) packed rows.  Returns (alt, nul):
    (N, NLB, W, NSEG) f32 per-block latched costs."""
    _, _, Kp = tvecs.shape
    Wt = tables.shape[2]
    NPAIR, NLB = codes.shape[0], codes.shape[1]
    W = codes.shape[4]
    S = nseg
    if kappa % 5:
        raise ValueError("pending mode requires kappa % 5 == 0")
    inner = functools.partial(_kernel_pending_packed, kappa=kappa, Kp=Kp,
                              nseg=nseg, nlb_dim=1, w=W, chain=True)

    def kernel(pidx_ref, *rest):
        inner(*rest)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NPAIR, NLB),
        in_specs=[
            pl.BlockSpec((1, 1, kappa, 5, W),
                         lambda pair, nlb, pidx: (pair, nlb, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TABLE_SIZE, Wt),
                         lambda pair, nlb, pidx: (pidx[pair], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, Kp),
                         lambda pair, nlb, pidx: (pidx[pair], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, S, 16),
                         lambda pair, nlb, pidx: (pair, nlb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, S),
                         lambda pair, nlb, pidx: (pair, nlb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, S),
                         lambda pair, nlb, pidx: (pair, nlb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, W, S),
                         lambda pair, nlb, pidx: (pair, nlb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, S),
                         lambda pair, nlb, pidx: (pair, nlb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((5, W, Wt), jnp.float32),  # MA gather staging
            pltpu.VMEM((5, W, Kp), jnp.float32),  # PM pending M
            pltpu.VMEM((5, W, Kp), jnp.float32),  # PI pending I
            pltpu.VMEM((4, 5, W, S), jnp.float32),  # PSM pending N J C R
            pltpu.VMEM((3, W, Kp), jnp.float32),  # ST prev M/I/D
            pltpu.VMEM((7, W, S), jnp.float32),  # SS prev specials
            pltpu.VMEM((W, S), jnp.float32),  # T final
            pltpu.VMEM((W, S), jnp.float32),  # R final
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((NPAIR, NLB, W, S), jnp.float32),
        jax.ShapeDtypeStruct((NPAIR, NLB, W, S), jnp.float32),
    ]
    alt, nul = pl.pallas_call(
        kernel, out_shape=out_shape, grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
    )(pidx, codes, tables, tvecs, xts, lengths, resets)
    return alt, nul


def _iseg_window_expand(win_sblk, win_len, win_xti, xt_lut, *, kappa,
                        nlb):
    """Per-SEGMENT window metadata -> per-block kernel inputs.

    win_sblk/win_len/win_xti: (N, W, S, C) int32 — window c of segment s
    of slot w: starting l-block in the SLOT's shared code chain, nt
    length (0 = pad), xtrans LUT row.  Returns kernel-layout
    (xts (N, NLB, W, S, 16), lens (N, NLB, W, S), resets
    (N, NLB, W, S), end_blk (N, W, S, C))."""
    b = jnp.arange(nlb, dtype=jnp.int32)  # (NLB,)
    blklen = -(-win_len // kappa)
    end_blk = win_sblk + blklen  # exclusive, (N, W, S, C)
    cov = ((win_sblk[..., None] <= b) & (b < end_blk[..., None])
           & (win_len[..., None] > 0))  # (N, W, S, C, NLB)
    anyc = jnp.any(cov, axis=3)  # (N, W, S, NLB)
    cidx = jnp.argmax(cov, axis=3)  # windows of one segment-slot are
    # disjoint in blocks, so argmax is exact

    def sel(a):  # (N, W, S, C) -> per-block (N, W, S, NLB)
        return jnp.take_along_axis(a, cidx, axis=3)

    end_chain = win_sblk * kappa + win_len
    lens_blk = jnp.where(anyc, sel(end_chain), 0)
    reset_blk = (anyc
                 & (b[None, None, None] == sel(win_sblk))).astype(jnp.int32)
    xts_blk = jnp.take(xt_lut, jnp.where(anyc, sel(win_xti), 0), axis=0)
    # kernel layouts: (N, NLB, W, S, ...)
    xts_k = xts_blk.transpose(0, 3, 1, 2, 4)
    lens_k = lens_blk.transpose(0, 3, 1, 2)
    rs_k = reset_blk.transpose(0, 3, 1, 2)
    return xts_k, lens_k, rs_k, end_blk


@functools.partial(jax.jit,
                   static_argnames=("kappa", "nlb", "maxblk", "nseg",
                                    "interpret"))
def _chained_scores_packed_jit(pidx, tables, tvecs, run_sblk, run_len,
                               run_gstart, win_sblk, win_len, win_xti,
                               xt_lut, codes_all, *,
                               kappa, nlb, maxblk, nseg, interpret):
    """Packed-plane chained scoring with per-segment windows.

    run_sblk/run_len/run_gstart (N, W, CR): the slot's shared code
    chain — contiguous read runs gathered exactly like _chain_expand's
    windows (one gather feeds every segment).  win_* (N, W, S, C): each
    segment's windows at slot-chain block coords (_iseg_window_expand).
    Outputs (N, W, S, C) per-window costs."""
    # shared code gather: reuse _chain_expand on the run chain (its
    # xt/len expansion is recomputed per segment below; the dummy xti
    # rows land on LUT row 0 and are ignored)
    _, _, _, ck, _ = _chain_expand(
        run_sblk, run_len, run_gstart, jnp.zeros_like(run_sblk), xt_lut,
        codes_all, kappa=kappa, nlb=nlb, maxblk=maxblk)
    xts_k, lens_k, rs_k, end_blk = _iseg_window_expand(
        win_sblk, win_len, win_xti, xt_lut, kappa=kappa, nlb=nlb)
    alt, nul = _scores_pairs_packed_chain_core(
        pidx, tables, tvecs, xts_k, lens_k, rs_k, ck,
        kappa=kappa, nseg=nseg, interpret=interpret)
    # compact by end block: (N, NLB, W, S) -> (N, W, S, NLB) -> take
    # each window's final block -> (N, W, S, C)
    eb = jnp.clip(end_blk - 1, 0, nlb - 1)  # (N, W, S, C)
    alt_w = jnp.take_along_axis(alt.transpose(0, 2, 3, 1), eb, axis=3)
    nul_w = jnp.take_along_axis(nul.transpose(0, 2, 3, 1), eb, axis=3)
    return alt_w, nul_w


def viterbi_scores_pairs_packed_chained(pidx, tables, tvecs, run_sblk,
                                        run_len, run_gstart, win_sblk,
                                        win_len, win_xti,
                                        xt_lut, codes_all, *, nlb, nseg,
                                        maxblk=None, kappa=None,
                                        interpret=False):
    """Score NPAIR (profile-PACK, slot-chain-group) pairs: W slots, each
    a shared chain of code runs, each segment s carrying its OWN window
    list over that chain (K-dependent windowing packs this way; whole-
    read windows are the special case where every segment lists the same
    window).  Returns (alt, nul): (N, W, S, C); scores are bit-exact vs
    viterbi_scores_pairs_packed on the same windows."""
    kappa, mode, _ = _resolve(kappa, "pending", None)
    assert mode == "pending"
    return _chained_scores_packed_jit(
        pidx, tables, tvecs, run_sblk, run_len, run_gstart, win_sblk,
        win_len, win_xti, xt_lut, codes_all, kappa=kappa, nlb=nlb,
        maxblk=nlb if maxblk is None else maxblk, nseg=nseg,
        interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("kappa", "nlb", "nseg", "interpret"))
def _gather_scores_pairs_packed_jit(pidx, tables, tvecs, xts, lengths,
                                    starts, codes_all, *, kappa, nlb, nseg,
                                    interpret):
    ck = _ck_from_starts(codes_all, starts, nlb, kappa)
    return _scores_pairs_packed_core(pidx, tables, tvecs, xts, lengths, ck,
                                     kappa=kappa, nseg=nseg,
                                     interpret=interpret)


def viterbi_scores_pairs_packed(pidx, tables, tvecs, xts, lengths,
                                codes=None, *, starts=None, codes_all=None,
                                nlb=None, nseg, kappa=None,
                                interpret=False):
    """Score NPAIR (profile-pack, window-group) pairs, NSEG segments each.

    Args mirror viterbi_scores_pairs(_from_starts) except: pidx indexes
    PACKS (tables (NPACK, 1364, 2*Kp+PACK_PAD), tvecs (NPACK, 8, Kp) from
    build_tables_packed), and the outputs are (NPAIR, W, NSEG) — slot w's
    window scored against each of the pack's NSEG profiles.  Pending
    formulation only (START-indexed codes)."""
    kappa, mode, _ = _resolve(kappa, "pending", None)
    assert mode == "pending"
    if codes is not None:
        return _scores_pairs_packed_jit(pidx, tables, tvecs, xts, lengths,
                                        codes, kappa=kappa, nseg=nseg,
                                        interpret=interpret)
    return _gather_scores_pairs_packed_jit(
        pidx, tables, tvecs, xts, lengths, starts, codes_all,
        kappa=kappa, nlb=nlb, nseg=nseg, interpret=interpret)
