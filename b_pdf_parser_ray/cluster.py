"""Cluster deployment profile: ONE documented switch for the knobs that
change between the single-node test box and a multi-node 100-TB cluster.

The repo's measured guidance (BASELINE.md) is scattered across docstrings:
SORT_SHUFFLE wins at single-node block counts (HASH_SHUFFLE measured 2-3×
slower at sf0.1), HASH_SHUFFLE's partitioned aggregators win once blocks ≫
cores across many nodes; hash-join partition counts derive from footer rows
with a floor that should scale with the executor fleet, not stay at the
local 8.  ``cluster_profile`` turns that advice into an executable config
so the 100-TB deployment is one call, not a code audit.

Inert-at-local contract (pinned by tests/test_round4.py): ``n_nodes=1``
returns exactly the defaults the whole test/bench suite runs under —
applying it changes nothing on this box.
"""

from __future__ import annotations

from dataclasses import dataclass

# a profile switches to the hash-shuffle strategy once the cluster is wide
# enough that a sort exchange's per-partition floor × partitions dominates
# (measured crossover is block-count driven; ≥4 nodes is the conservative
# point where blocks ≫ single-node core counts)
HASH_SHUFFLE_MIN_NODES = 4


@dataclass(frozen=True)
class ClusterProfile:
    n_nodes: int
    cpus_per_node: int
    shuffle_strategy: str
    join_min_partitions: int
    target_max_block_size: int
    # CPU reservation per hash-shuffle/aggregate/join partition, or None to
    # leave the session's DataContext untouched (the n_nodes=1 contract)
    aggregator_cpus_per_partition: float | None = None

    @property
    def total_cpus(self) -> int:
        return self.n_nodes * self.cpus_per_node


def cluster_profile(n_nodes: int = 1, cpus_per_node: int = 32) -> ClusterProfile:
    """Compute the deployment profile for an ``n_nodes`` cluster.

    * ``shuffle_strategy``: SORT_SHUFFLE_PULL_BASED single-node (measured
      2-3× faster than HASH_SHUFFLE at local block counts, BASELINE.md);
      HASH_SHUFFLE from ``HASH_SHUFFLE_MIN_NODES`` nodes up, where the
      partitioned aggregator model stops paying its fixed floor per query
      and starts buying all-to-all bandwidth.
    * ``join_min_partitions``: the hash-join plan floor rises to the
      executor fleet size (2 partitions per core) so a join can never
      under-parallelize a wide cluster even when footer rows are modest;
      the footer-rows clamp (``functions.joins.join_partitions``) still
      raises P beyond the floor for genuinely large sides.
    * ``target_max_block_size``: unchanged (128 MiB) — the object-store
      spill/backpressure sweet spot is per-worker, not per-cluster.
    * ``aggregator_cpus_per_partition``: under HASH_SHUFFLE every shuffle /
      aggregate / join stage reserves ``cpus_per_partition × P`` CPUs for
      its aggregator actors, and Ray Data's default parallelism is 200
      partitions at 0.125 CPU each = 25 CPUs PER STAGE — a pipeline with
      two chained exchanges livelocks any fleet narrower than ~50 cores
      (measured: a 4-node × 8-CPU simulated cluster hung on the first
      two-shuffle query, scripts/multinode_sim.py).  Sized so one default
      stage reserves ≤ 25 % of the fleet, clamped to Ray's 0.125 default
      on fleets wide enough not to care.  None single-node (HASH_SHUFFLE
      is off; the session's own override — e.g. the test fixture's — must
      survive an inert apply).
    """
    if n_nodes < 1 or cpus_per_node < 1:
        raise ValueError("n_nodes and cpus_per_node must be >= 1")
    from .functions.joins import JOIN_MIN_PARTITIONS

    single_node = n_nodes < HASH_SHUFFLE_MIN_NODES
    total_cpus = n_nodes * cpus_per_node
    return ClusterProfile(
        n_nodes=n_nodes,
        cpus_per_node=cpus_per_node,
        shuffle_strategy=(
            "SORT_SHUFFLE_PULL_BASED" if single_node else "HASH_SHUFFLE"
        ),
        join_min_partitions=(
            JOIN_MIN_PARTITIONS
            if single_node
            else max(JOIN_MIN_PARTITIONS, 2 * n_nodes * cpus_per_node)
        ),
        target_max_block_size=128 * 1024 * 1024,
        aggregator_cpus_per_partition=(
            # ≤ 25% of the fleet per default-200-partition stage, clamped to
            # Ray's 0.125 default on wide fleets; NO absolute floor — on a
            # 4-node × 1-CPU fleet a 0.01 floor would still reserve 2 of 4
            # CPUs per stage and two chained exchanges livelock (ADVICE r4)
            None if single_node else min(0.125, 0.25 * total_cpus / 200)
        ),
    )


def apply_cluster_profile(profile: ClusterProfile) -> ClusterProfile:
    """Apply a profile to the current Ray ``DataContext`` and the join
    planner's floor.  Call once after ``ray.init`` on the driver; returns
    the profile for logging.  Applying the ``n_nodes=1`` profile is a
    no-op by construction (the values ARE the defaults)."""
    from ray.data.context import DataContext

    from . import rayfix
    from .functions import joins

    from ray.data.context import ShuffleStrategy

    # the HASH_SHUFFLE strategy needs the schema-broadcast fixes (joins AND
    # chained groupby exchanges — SchemaSafeConcat) wherever it's enabled
    rayfix.apply()

    ctx = DataContext.get_current()
    ctx.shuffle_strategy = getattr(ShuffleStrategy, profile.shuffle_strategy)
    ctx.target_max_block_size = profile.target_max_block_size
    joins.JOIN_MIN_PARTITIONS = profile.join_min_partitions
    if profile.aggregator_cpus_per_partition is not None:
        v = profile.aggregator_cpus_per_partition
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = v
        ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = v
        ctx.join_operator_actor_num_cpus_per_partition_override = v
    return profile
