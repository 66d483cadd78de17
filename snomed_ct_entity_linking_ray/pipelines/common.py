"""Shared pipeline helpers: pruned reads, exact-integer money columns,
partial-then-final aggregation, broadcast lookups.

Scale conventions (SURVEY.md §4):
- every read passes ``columns=[...]`` (prune at the read);
- every grouped sum pre-aggregates inside ``map_batches`` (one row per key
  per batch) before the small final ``groupby`` — the all-to-all shuffle
  moves partials, not rows;
- small sides are broadcast via ``ray.put`` once, never re-shipped per batch.

Float policy: any value that crosses the DuckDB-oracle boundary is either an
integer (cents via ``round(x*100)``), a timestamp, or a string — double
sums are order-dependent across distributed partials and can't be compared
bit-exactly.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _tune_join_context() -> None:
    """Cap hash-join aggregator CPU reservation at a fraction per partition.

    Ray's local-cluster heuristic reserves ``min(1, (CPU/2)/num_partitions)``
    CPUs per join aggregator actor — a FULL CPU each at our small partition
    counts, so two concurrently-alive joins (the Q7/Q8 topologies) reserve
    the ENTIRE box and starve the upstream map tasks that feed them: a
    reproduced hard deadlock at ``num_cpus=4`` (q_volume_shipping) and a
    standing hazard at every size. 0.25/partition keeps a 2-partition join
    at half a CPU and a 16-partition join at 4 — aggregators are mostly
    network/accumulate-bound, matching Ray's own single-node default ethos
    (join.py::_get_default_num_cpus_per_partition = 0.125)."""
    ctx = rd.DataContext.get_current()
    if ctx.join_operator_actor_num_cpus_per_partition_override is None:
        ctx.join_operator_actor_num_cpus_per_partition_override = 0.25
    # Empty-side-safe hash join (upstream deadlock/ArrowInvalid workaround;
    # see stages/joinsafe.py for the reproduction and semantics table).
    from snomed_ct_entity_linking_ray.stages import joinsafe

    joinsafe.install()


def read(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    _tune_join_context()
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def read_arrow(sf_dir: str, table: str, columns: list[str] | None = None) -> pa.Table:
    """Driver-side load of a SMALL table (dimension side of a broadcast join)."""
    import pyarrow.parquet as pq

    return pq.read_table(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def cents(x: np.ndarray | pd.Series) -> np.ndarray:
    """Exact integer cents: round-half-even of x*100 (matches DuckDB
    ``CAST(round(x*100, 0) AS BIGINT)`` for values not exactly at .5, which
    random doubles never are)."""
    arr = np.asarray(x, dtype=np.float64)
    return np.rint(arr * 100.0).astype(np.int64)


def default_buckets(min_buckets: int = 64, per_cpu: int = 4) -> int:
    """Hash-bucket count for grouped combines, scaled to the cluster:
    max(min_buckets, per_cpu x cluster CPUs). More buckets than cores only
    wastes per-task fixed cost; fewer caps reduce parallelism below the
    cluster and raises the per-bucket memory bound (see grouped_sums)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(min_buckets, per_cpu * cpus)


def grouped_sums(
    ds: rd.Dataset,
    keys: list[str],
    sums: dict[str, str],
    count_as: str | None = None,
    n_buckets: int | None = None,
) -> rd.Dataset:
    """Partial-per-batch pandas groupby, then a final groupby over partials.

    ``sums`` maps output column -> input column (summed). ``count_as`` adds a
    row count. All summed inputs should be exact types (ints/cents).

    The final combine is a hash-bucketed ``map_groups`` over ``n_buckets``
    int64 shuffle keys with a VECTORIZED pandas groupby per bucket — NOT
    Ray's native ``groupby(keys).aggregate``: the native sort-aggregate
    merge pays ~0.2 ms of per-group Python per output group (measured 20 s
    for 95k groups on 100k rows; worse with fewer reducers), while this
    shape is O(rows) C-vectorized with only ``n_buckets`` Python-level
    groups.

    MEMORY BOUND: each bucket task holds ~key_cardinality/n_buckets combined
    groups x row width in ONE pandas frame, so ``n_buckets`` must grow with
    both cluster size and estimated key cardinality. The default scales with
    cluster CPUs (``default_buckets``); for extreme cardinalities (10^9+
    groups) pass an explicit n_buckets ≈ cardinality x row_bytes /
    target_bucket_bytes."""
    if n_buckets is None:
        n_buckets = default_buckets()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        agg = {out: (src, "sum") for out, src in sums.items()}
        if count_as:
            any_col = keys[0]
            agg[count_as] = (any_col, "size")
        g = df.groupby(keys, as_index=False, sort=False).agg(**agg)
        h = np.zeros(len(g), dtype=np.uint64)
        for k in keys:
            h = h * np.uint64(1099511628211) ^ pd.util.hash_pandas_object(
                g[k], index=False
            ).to_numpy()
        g["_pb"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return g

    def final(g: pd.DataFrame) -> pd.DataFrame:
        agg = {out: (out, "sum") for out in sums}
        if count_as:
            agg[count_as] = (count_as, "sum")
        return g.groupby(keys, as_index=False, sort=False).agg(**agg)

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_pb")
        .map_groups(final, batch_format="pandas")
    )


def broadcast(obj) -> "ray.ObjectRef":
    return ray.put(obj)


def distinct_column(ds: rd.Dataset, col: str, n_buckets: int | None = None) -> rd.Dataset:
    """Distributed distinct of one column: per-batch drop_duplicates
    (map-side combine), then a hash-bucketed vectorized distinct — the
    grouped_sums shape. The driver never scans the input; the result
    Dataset is bounded by the distinct-key count."""
    if n_buckets is None:
        n_buckets = default_buckets()

    def partial(df: pd.DataFrame) -> pa.Table:
        g = df[[col]].drop_duplicates()
        h = pd.util.hash_pandas_object(g[col], index=False).to_numpy()
        g = g.copy()
        g["_kb"] = (h % np.uint64(n_buckets)).astype(np.int64)
        # Arrow output: empty string columns in pandas blocks trip Ray's
        # sampling size estimator (pandas_block.py vectorize-on-size-0
        # warning); Arrow blocks size exactly.
        return pa.Table.from_pandas(g, preserve_index=False)

    def bucket_distinct(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=[col]).drop(columns=["_kb"])

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_kb")
        .map_groups(bucket_distinct, batch_format="pandas")
    )


# Distinct-key count above which a semi/anti probe set stops being
# broadcast and becomes a hash semi-join: 2M int64 keys ≈ a 16 MB payload
# plus python-set overhead per actor — past that, shipping the set to every
# extractor costs more than one hash shuffle of both (slim) sides.
MAX_BROADCAST_KEYS = 2_000_000


def semi_anti_filter(
    probe: rd.Dataset,
    probe_key: str,
    key_source: rd.Dataset,
    key_col: str,
    anti: bool = False,
    max_broadcast: int = MAX_BROADCAST_KEYS,
) -> rd.Dataset:
    """J2 semi/anti join (VERDICT r2 #3 shape): the key set is computed
    DISTRIBUTIVELY (``distinct_column`` — per-batch distinct + bucketed
    combine; the driver never scans the fact table), then:

    - ≤ ``max_broadcast`` distinct keys: the set is collected once (bounded
      by the distinct count, which is exactly what was just measured),
      broadcast via ray.put, and applied as a per-batch isin — the probe
      side never shuffles;
    - above it: Ray's native hash ``left_semi`` / ``left_anti`` join — both
      sides shuffle once (keys already distinct, so no row multiplication),
      nothing on the driver.
    """
    dk = distinct_column(key_source, key_col).materialize()
    n_keys = dk.count()
    if n_keys <= max_broadcast:
        # a fully-empty distinct Dataset collects to a column-less frame
        p = dk.to_pandas()
        keys = set(p[key_col].tolist()) if key_col in p.columns else set()
        ref = ray.put(keys)

        class Filt:
            def __init__(self):
                self.keys = ray.get(ref)

            def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
                m = df[probe_key].isin(self.keys)
                return df[~m] if anti else df[m]

        return probe.map_batches(Filt, batch_format="pandas", concurrency=(1, 4))
    n_part = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
    return probe.join(
        dk,
        "left_anti" if anti else "left_semi",
        num_partitions=n_part,
        on=(probe_key,),
        right_on=(key_col,),
    )


def tree_to_pandas(
    partials: rd.Dataset,
    combine,
    n_blocks_hint: int = 64,
    fanin: int = 64,
) -> pd.DataFrame:
    """Tree-combine per-block partial frames so the DRIVER only ever sees
    one bounded final frame (never the concatenation of all partials, whose
    row count grows with the number of blocks ∝ corpus size).

    ``combine`` must be associative-idempotent over concatenated partial
    frames (e.g. groupby-sum, distinct). The whole tree is one lazy chain —
    a single streaming execution; each round's repartition moves only the
    already-combined partials (tiny)."""
    cur = partials
    n = n_blocks_hint
    while n > 1:
        n = max(1, n // fanin)
        cur = cur.repartition(n).map_batches(combine, batch_format="pandas")
    return cur.to_pandas()


class BroadcastJoin:
    """Actor-pool stage: inner hash join of each batch against a broadcast
    small-side pandas DataFrame (SURVEY.md §2.4 J1/J5 pattern — small side
    ships once per actor via the ray.put handle, never per batch)."""

    def __init__(self, ref, left_on: str, right_on: str, how: str = "inner"):
        self.small: pd.DataFrame = ray.get(ref)
        self.left_on = left_on
        self.right_on = right_on
        self.how = how

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = df.merge(
            self.small, how=self.how, left_on=self.left_on, right_on=self.right_on
        )
        if self.right_on != self.left_on and self.right_on in out.columns:
            out = out.drop(columns=[self.right_on])
        return out
