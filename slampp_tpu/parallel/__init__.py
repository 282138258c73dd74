"""Multi-device distribution (new capability vs the reference, per
BASELINE.json): sharded lambda assembly and distributed Schur reduction over
jax.sharding meshes with psum/all_gather collectives (SURVEY.md §2.12)."""

from slampp_tpu.parallel.distributed import (
    make_mesh,
    distributed_gn_step,
    shard_graph_edges,
)
