"""ctypes bindings for the native support library (native/).

Provides: the striped AVX2 CPU Viterbi (the measured bench baseline and a
host-side fallback engine), fletcher16, fast sequence encoding and
fragment-code precompute.  The library is built on demand with `make`
(g++ is part of the environment; there is no pip/pybind11 path).
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdeciphon_native.so")


class NativeUnavailable(RuntimeError):
    pass


@functools.lru_cache(maxsize=1)
def load() -> ctypes.CDLL:
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as exc:
            raise NativeUnavailable(f"cannot build native library: {exc}")
    lib = ctypes.CDLL(_LIB_PATH)
    lib.dcpn_profile_new.restype = ctypes.c_void_p
    lib.dcpn_profile_new.argtypes = [
        ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p]
    lib.dcpn_profile_del.argtypes = [ctypes.c_void_p]
    lib.dcpn_viterbi.restype = ctypes.c_float
    lib.dcpn_viterbi.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                 ctypes.c_int, ctypes.c_void_p]
    lib.dcpn_viterbi_null.restype = ctypes.c_float
    lib.dcpn_viterbi_null.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.c_int, ctypes.c_float]
    lib.dcpn_bench.restype = ctypes.c_double
    lib.dcpn_bench.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                               ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
                               ctypes.c_int]
    lib.dcpn_fletcher16.restype = ctypes.c_uint16
    lib.dcpn_fletcher16.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
    lib.dcpn_encode.restype = ctypes.c_int
    lib.dcpn_encode.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                ctypes.c_void_p, ctypes.c_void_p]
    lib.dcpn_frag_codes.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.c_void_p]
    return lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


class NativeProfile:
    """A profile loaded into the native striped kernel."""

    def __init__(self, costs):
        """costs: deciphon_tpu.ops.costs.ViterbiCosts."""
        lib = load()
        self._lib = lib
        core = np.ascontiguousarray(costs.core, np.float32)
        match = np.ascontiguousarray(costs.match, np.float32)
        null = np.ascontiguousarray(costs.null, np.float32)
        bg = np.ascontiguousarray(costs.background, np.float32)
        self.K = costs.K
        self._h = lib.dcpn_profile_new(costs.K, _ptr(core), _ptr(match),
                                       _ptr(null), _ptr(bg))

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.dcpn_profile_del(self._h)
            self._h = None

    def viterbi(self, codes: np.ndarray, length: int,
                xt: np.ndarray) -> float:
        codes = np.ascontiguousarray(codes, np.int32)
        xt = np.ascontiguousarray(xt, np.float32)
        return float(self._lib.dcpn_viterbi(self._h, _ptr(codes),
                                            int(length), _ptr(xt)))

    def viterbi_null(self, codes: np.ndarray, length: int,
                     rr: float) -> float:
        codes = np.ascontiguousarray(codes, np.int32)
        return float(self._lib.dcpn_viterbi_null(self._h, _ptr(codes),
                                                 int(length),
                                                 ctypes.c_float(rr)))

    def bench_seconds(self, codes: np.ndarray, length: int, xt: np.ndarray,
                      nwin: int, nthreads: int) -> float:
        codes = np.ascontiguousarray(codes, np.int32)
        xt = np.ascontiguousarray(xt, np.float32)
        return float(self._lib.dcpn_bench(self._h, _ptr(codes), int(length),
                                          _ptr(xt), nwin, nthreads))


def fletcher16(data: bytes) -> int:
    lib = load()
    buf = np.frombuffer(data, np.uint8)
    return int(lib.dcpn_fletcher16(_ptr(buf), len(data)))


def encode(seq: str) -> np.ndarray:
    lib = load()
    raw = seq.encode("ascii")
    out = np.empty(len(raw), np.int8)
    bad = ctypes.c_int64(0)
    rc = lib.dcpn_encode(raw, len(raw), _ptr(out), ctypes.byref(bad))
    if rc != 0:
        raise ValueError(f"invalid symbol {seq[bad.value]!r} at {bad.value}")
    return out


def frag_codes(symbols: np.ndarray) -> np.ndarray:
    lib = load()
    symbols = np.ascontiguousarray(symbols, np.int8)
    out = np.empty((len(symbols), 5), np.int32)
    lib.dcpn_frag_codes(_ptr(symbols), len(symbols), _ptr(out))
    return out


REFERENCE_SERVER_CORES = 8  # baseline normalization target (BASELINE.md)


def cpu_baseline_gcups(core_size: int = 400, length: int = 2048,
                       nwin: int | None = None) -> float:
    """Measured multithreaded striped-kernel GCUPS, normalized to an
    8-core server (the reference's deployment class; this build host may
    have fewer cores, so per-core throughput is scaled)."""
    from ..ops.costs import build_costs
    from ..profile import sample_profile
    from ..scan.sequence import frag_codes_ending
    from ..xtrans import xtrans_cost_vector

    ncores = os.cpu_count() or 1
    if nwin is None:
        nwin = max(2 * ncores, 8)
    costs = build_costs(sample_profile(77, core_size))
    prof = NativeProfile(costs)
    rng = np.random.default_rng(0)
    seq = rng.integers(0, 4, size=length).astype(np.int8)
    codes = frag_codes_ending(seq)
    xt = xtrans_cost_vector(True, False, length)
    prof.viterbi(codes, length, xt)  # warm
    dt = prof.bench_seconds(codes, length, xt, nwin, ncores)
    cells = nwin * length * 5 * core_size
    measured = cells / dt / 1e9
    return measured * REFERENCE_SERVER_CORES / ncores


class NativePairScorer:
    """Multithreaded native-CPU pair scorer: the reads/s baseline engine.

    Implements the scan scheduler's scorer contract (score(items) ->
    {id(item): (null_cost, alt_cost)}) on the striped AVX2 kernel, fanned
    out over OS threads exactly like the reference's OpenMP scan loop
    (c-core/scan.c:188, thread.c:49-86) — ctypes releases the GIL for the
    duration of each kernel call, so the fan-out is real.  Plugged into
    the unchanged Scanner pipeline it yields an end-to-end CPU reads/s
    measurement of this machine, the baseline BASELINE.md's ">=10x
    reads/s" goal is stated against.
    """

    def __init__(self, costs_list, nthreads: int | None = None):
        import threading

        from ..xtrans import XT_RR

        self.profiles = [NativeProfile(c) for c in costs_list]
        self.nthreads = nthreads or os.cpu_count() or 1
        self._xt_rr = XT_RR
        # Wall instrumentation (the same ScanMetrics contract the device
        # scorers fill): `native_score` is the fan-out wall,
        # `native_kernel_threads` the SUM of in-kernel thread seconds —
        # their ratio over nthreads is the measured thread utilization,
        # so the CPU baseline's denominator is profiled, not a black box.
        self.metrics = None
        self._lock = threading.Lock()
        self._kernel_s = 0.0

    def _score_one(self, it):
        import time

        t0 = time.perf_counter()
        prof = self.profiles[it.p_idx]
        codes = it.codes
        xt = it.xt
        L = it.win.length
        alt = prof.viterbi(codes, L, xt)
        nul = prof.viterbi_null(codes, L, float(xt[self._xt_rr]))
        dt = time.perf_counter() - t0
        with self._lock:
            self._kernel_s += dt
        return id(it), (nul, alt)

    def score(self, items) -> dict:
        import time
        from concurrent.futures import ThreadPoolExecutor

        t0 = time.perf_counter()
        k0 = self._kernel_s
        if len(items) == 1:
            out = dict([self._score_one(items[0])])
        else:
            with ThreadPoolExecutor(max_workers=self.nthreads) as pool:
                out = dict(pool.map(self._score_one, items))
        if self.metrics is not None:
            self.metrics.add_wall("native_score",
                                  time.perf_counter() - t0)
            self.metrics.add_wall("native_kernel_threads",
                                  self._kernel_s - k0)
        return out
