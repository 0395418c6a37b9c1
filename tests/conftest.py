import os

# Tests always run on CPU with a virtual 8-device mesh so sharding tests
# work anywhere (and never steal the real TPU chip from bench runs); the
# TPU path is exercised by bench.py / __graft_entry__.py.  The environment
# may preset JAX_PLATFORMS (e.g. to the axon TPU tunnel) — override it.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: the Viterbi lax.scan programs are slow to
# compile on CPU; caching makes repeated test runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/deciphon_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config knob
# is authoritative.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy kernel/mesh cases excluded from the fast tier "
        "(pytest -m 'not slow' covers every kernel surface in minutes; "
        "run the full suite before releases)")
