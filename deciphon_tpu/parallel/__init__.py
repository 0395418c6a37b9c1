from .sharding import (make_mesh, shard_pack, shard_windows, sharded_scan_step,
                       SCAN_AXES)

__all__ = ["make_mesh", "shard_pack", "shard_windows", "sharded_scan_step",
           "SCAN_AXES"]
