"""One process of the multi-host scan dryrun (see multihost_dryrun.py).

Builds a deterministic sample workload (same seeds in every process, so
no artifact movement is needed), optionally joins the jax.distributed
coordination service, scans its profile shard, and participates in the
shard merge.  Run via multihost_dryrun.py, not directly.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nprocs", type=int, required=True)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--shared-dir", required=True)
    ap.add_argument("--profiles", type=int, default=5)
    ap.add_argument("--core-size", type=int, default=10)
    ap.add_argument("--seqs", type=int, default=4)
    ap.add_argument("--seq-len", type=int, default=120)
    ap.add_argument("--workload", choices=["synthetic", "minifam"],
                    default="synthetic")
    ap.add_argument("--no-merge", action="store_true",
                    help="scan the shard only; a supervisor merges")
    ap.add_argument("--crash-marker", default=None,
                    help="fault injection: die mid-scan on the attempt "
                         "that creates this marker file (absent -> crash)")
    ap.add_argument("--crash-always", action="store_true",
                    help="fault injection: die before scanning, always")
    args = ap.parse_args()

    if args.crash_always:
        os._exit(1)
    if args.crash_marker and not os.path.exists(args.crash_marker):
        with open(args.crash_marker, "w"):
            pass
        import threading

        # die mid-scan: the supervisor must detect the nonzero exit with
        # no completion sentinel and re-dispatch this shard
        threading.Timer(0.3, lambda: os._exit(1)).start()

    import jax

    jax.config.update("jax_platforms", "cpu")

    # jax.distributed.initialize must run before ANY backend-initializing
    # call — importing deciphon_tpu creates jnp constants, so the init
    # cannot be deferred to the library helper here.
    distributed = args.coordinator is not None and args.nprocs > 1
    if distributed:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.nprocs, process_id=args.pid)

    from deciphon_tpu.parallel.multihost import run_sharded_scan

    import numpy as np

    from deciphon_tpu.profile import sample_profile
    from deciphon_tpu.scan.pipeline import ScanConfig
    from deciphon_tpu.scan.sequence import Sequence

    if args.workload == "minifam":
        # Real profiles + consensus reads: guarantees actual product
        # lines so the cross-process merge ordering is exercised.
        import json
        import tempfile

        from deciphon_tpu.io.dcp import DcpReader
        from deciphon_tpu.press import press

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        dcp = os.path.join(tempfile.mkdtemp(), "minifam.dcp")
        press("/root/reference/c-core/minifam.hmm", dcp)
        profiles = list(DcpReader(dcp))
        seqs = json.load(open(os.path.join(repo, "tests",
                                           "data_consensus.json")))
        sequences = [Sequence.make(i, s["name"], s["seq"])
                     for i, s in enumerate(seqs[:args.seqs])]
    else:
        profiles = [sample_profile(seed=100 + i, core_size=args.core_size)
                    for i in range(args.profiles)]
        rng = np.random.default_rng(7)
        sequences = [
            Sequence.make(i, f"seq{i}",
                          "".join("ACGT"[b] for b in
                                  rng.integers(0, 4, size=args.seq_len)))
            for i in range(args.seqs)
        ]
    merged = run_sharded_scan(
        profiles, sequences, args.shared_dir,
        process_id=args.pid, num_processes=args.nprocs,
        config=ScanConfig(engine="jax"), distributed=distributed,
        merge=not args.no_merge)
    if args.pid == 0 and not args.no_merge:
        print(merged)


if __name__ == "__main__":
    main()
