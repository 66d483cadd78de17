"""Relational operator family over the testdata star schema.

Each function returns a lazy ``ray.data.Dataset``; the DuckDB oracle for
each lives in ``__ray_entry__.oracle_sql``. These exercise the engine's
generic operator classes from SURVEY.md §2: pruned reads (S1), vectorized
projections/filters (M5-class), broadcast hash joins (J1/J2), partial-then-
final grouped aggregation (G1/G2 combine pattern), top-k (T2), as-of join
(guide §Joins), tumbling/session windows (§2.9 target streaming-shaped ops).

Column names match the oracle SQL aliases exactly (driver hashes by name).
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .common import (
    broadcast,
    cents,
    default_buckets,
    distinct_column,
    grouped_sums,
    read,
    read_arrow,
    semi_anti_filter,
    tree_to_pandas,
)

_PB = np.uint64(0x9E3779B97F4A7C15)


def _user_bucket(u: np.ndarray, n_buckets: int) -> np.ndarray:
    """Stable hash bucket of an int64 user key — the shuffle key for every
    user-partitioned streaming op below. ONE Python-level group per bucket
    (VERDICT r3 #1: per-user ``map_groups`` dispatch costs ~0.2 ms/group,
    hours at 10^8 users; per-bucket dispatch is cluster-sized)."""
    return ((u.astype(np.uint64) * _PB) % np.uint64(n_buckets)).astype(np.int64)


def _run_starts(u: np.ndarray) -> np.ndarray:
    """Index of the first row of each user's contiguous run in a frame
    sorted by user: run_starts[i] = index of row i's segment start."""
    n = len(u)
    idx = np.arange(n, dtype=np.int64)
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = u[1:] != u[:-1]
    return np.maximum.accumulate(np.where(new, idx, 0))


# --- filters / projections -------------------------------------------------

def q_filter_revenue(sf_dir: str):
    """lineitem rows before 1996 with discount > 0.05; revenue is a single
    IEEE multiply so it crosses the oracle boundary bit-exactly."""
    ds = read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    cutoff = _dt.datetime(1996, 1, 1)

    def fn(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.less(t["l_shipdate"], pa.scalar(cutoff)),
            pc.greater(t["l_discount"], 0.05),
        )
        t = t.filter(mask)
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": t["l_linenumber"],
                "revenue": rev,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# --- grouped aggregation (partial + final combine) -------------------------

def q_pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped summary; money sums as exact integer cents."""
    ds = read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"],
                "l_linestatus": df["l_linestatus"],
                "qty_c": cents(df["l_quantity"]),
                "price_c": cents(df["l_extendedprice"]),
                "disc_c": cents(df["l_discount"]),
            }
        )

    prepped = ds.map_batches(prep, batch_format="pandas")
    return grouped_sums(
        prepped,
        ["l_returnflag", "l_linestatus"],
        sums={"sum_qty_cents": "qty_c", "sum_price_cents": "price_c", "sum_disc_cents": "disc_c"},
        count_as="n_rows",
    )


def q_rollup_summary(sf_dir: str):
    """GROUP BY ROLLUP(l_returnflag, l_linestatus) — multi-level OLAP
    aggregate. One corpus pass computes the finest level (the
    ``grouped_sums`` combine); every coarser level re-aggregates the
    BOUNDED finest-level result (group-count-sized, not corpus-sized), so
    the rollup costs one extra tiny pandas pass, not extra shuffles.
    NULL group levels carry the '(all)' sentinel so the value-hash compare
    is string-typed at every level."""
    fine = q_pricing_summary(sf_dir).to_pandas()  # bounded: one row per group

    sums = ["sum_qty_cents", "sum_price_cents", "sum_disc_cents", "n_rows"]
    mid = fine.groupby("l_returnflag", as_index=False)[sums].sum()
    mid["l_linestatus"] = "(all)"
    top = fine[sums].sum().to_frame().T
    top["l_returnflag"] = "(all)"
    top["l_linestatus"] = "(all)"
    cols = ["l_returnflag", "l_linestatus", *sums]
    out = pd.concat([fine[cols], mid[cols], top[cols]], ignore_index=True)
    return out.astype({c: np.int64 for c in sums}).sort_values(
        ["l_returnflag", "l_linestatus"]
    ).reset_index(drop=True)


# --- broadcast hash joins --------------------------------------------------

def q_orders_by_segment(sf_dir: str):
    """orders ⋈ customer (broadcast small side) → per-segment counts/sums."""
    cust = read_arrow(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    ref = broadcast(cust)

    ds = read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    class JoinSeg:
        def __init__(self):
            self.small = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            out = df.merge(self.small, left_on="o_custkey", right_on="c_custkey")
            return pd.DataFrame(
                {
                    "c_mktsegment": out["c_mktsegment"],
                    "total_c": cents(out["o_totalprice"]),
                }
            )

    joined = ds.map_batches(JoinSeg, batch_format="pandas", concurrency=(1, 4))
    return grouped_sums(
        joined, ["c_mktsegment"], sums={"sum_total_cents": "total_c"}, count_as="n_orders"
    )


def q_customers_per_region(sf_dir: str):
    """customer ⋈ nation ⋈ region (two-level broadcast dim join) → counts."""
    nation = read_arrow(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    region = read_arrow(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")[
        ["n_nationkey", "r_name"]
    ]
    ref = broadcast(dim)

    ds = read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    class JoinDim:
        def __init__(self):
            self.small = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            out = df.merge(self.small, left_on="c_nationkey", right_on="n_nationkey")
            out["one"] = np.int64(1)
            return out[["r_name", "one"]]

    joined = ds.map_batches(JoinDim, batch_format="pandas", concurrency=(1, 4))
    return grouped_sums(joined, ["r_name"], sums={"n_customers": "one"})


# --- sort / top-k ----------------------------------------------------------

def q_top_orders(sf_dir: str):
    """Global top-10 orders by totalprice (cents), deterministic tiebreak."""
    ds = read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "total_cents": pa.array(cents(t["o_totalprice"].to_numpy()), pa.int64()),
            }
        )

    # per-batch partial top-k, then a tiny global sort — the full sort never
    # shuffles all rows
    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.nlargest(10, ["total_cents", "o_orderkey"])

    p = ds.map_batches(prep, batch_format="pyarrow").map_batches(
        partial_topk, batch_format="pandas"
    )
    return p.sort(["total_cents", "o_orderkey"], descending=[True, True]).limit(10)


# --- as-of join ------------------------------------------------------------

def q_latest_order_before_event(sf_dir: str):
    """Per event: MAX(o_orderdate) of the same user's orders at/before ts.

    Distributed as-of join (VERDICT r2 #1 closed): BOTH fact tables are
    hash-partitioned by user bucket in one union + groupby shuffle — the
    driver never loads either side (orders is fact-sized, not a dimension)
    — and each bucket runs ONE vectorized ``pd.merge_asof`` over ts-sorted
    frames (reference analogue: the co-partitioned manual shard,
    2nd Place/src/data.py:136-153). Shuffle payload is (user:int64,
    ts:int64-backed timestamp, event_id:int64, side:int8). The bucket
    count scales with the cluster (``default_buckets`` — VERDICT r3 #3:
    a fixed 64 put ~1/64 of BOTH fact tables in one task's heap)."""
    ev = read(sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    n_buckets = default_buckets()

    def _bucket(u: np.ndarray) -> np.ndarray:
        return _user_bucket(u, n_buckets)

    def tag_events(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "user_id": u,
                "ts": df["ts"].astype("datetime64[us]"),
                "event_id": df["event_id"].to_numpy(np.int64),
                "_side": np.ones(len(df), dtype=np.int8),
                "_ub": _bucket(u),
            }
        )

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        u = df["o_custkey"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "user_id": u,
                "ts": df["o_orderdate"].astype("datetime64[us]"),
                "event_id": np.zeros(len(df), dtype=np.int64),
                "_side": np.zeros(len(df), dtype=np.int8),
                "_ub": _bucket(u),
            }
        )

    both = ev.map_batches(tag_events, batch_format="pandas").union(
        orders.map_batches(tag_orders, batch_format="pandas")
    )

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_id": pd.Series([], dtype=np.int64),
                "last_order_ts": pd.Series([], dtype="datetime64[us]"),
            }
        )
        side = g["_side"].to_numpy()
        evg = g[side == 1][["user_id", "ts", "event_id"]]
        og = g[side == 0][["user_id", "ts"]].rename(columns={"ts": "last_order_ts"})
        if not len(evg) or not len(og):
            return empty
        m = pd.merge_asof(
            evg.sort_values("ts", kind="mergesort"),
            og.sort_values("last_order_ts", kind="mergesort"),
            left_on="ts",
            right_on="last_order_ts",
            by="user_id",
            direction="backward",  # latest order date <= event ts
        ).dropna(subset=["last_order_ts"])
        return pd.DataFrame(
            {
                "event_id": m["event_id"].to_numpy(np.int64),
                "last_order_ts": m["last_order_ts"].astype("datetime64[us]"),
            }
        )

    return both.groupby("_ub").map_groups(asof, batch_format="pandas")


# --- windows (tumbling + session) -----------------------------------------

def q_hourly_user_activity(sf_dir: str):
    """Tumbling 1h window per user: event count + value cents.

    The shuffle key is the INT64 epoch-hour, not a datetime64 column —
    grouping on a datetime key measured 39s vs 0.2s for the identical
    aggregate on this input (Ray's sort shuffle degrades badly on
    datetime blocks); the timestamp is reconstructed after the combine."""
    ds = read(sf_dir, "events", ["user_id", "ts", "value"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"],
                # unit pinned explicitly (ADVICE r2): a pyarrow/pandas combo
                # that surfaces the Arrow timestamp as datetime64[ns] would
                # otherwise shift the epoch-hour 1000x
                "hour_idx": (
                    df["ts"].astype("datetime64[us]").astype("int64")
                    // (3600 * 10**6)
                ).astype(np.int64),
                "value_c": cents(df["value"]),
            }
        )

    p = ds.map_batches(prep, batch_format="pandas")
    agg = grouped_sums(
        p, ["user_id", "hour_idx"], sums={"sum_value_cents": "value_c"},
        count_as="n_events",
    )

    def restore_hour(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"],
                "hour": (df["hour_idx"].to_numpy(np.int64) * (3600 * 10**6)).astype(
                    "datetime64[us]"
                ),
                "sum_value_cents": df["sum_value_cents"],
                "n_events": df["n_events"],
            }
        )

    return agg.map_batches(restore_hour, batch_format="pandas")


# --- semi / anti joins (J2-class: broadcast key-set filters) ---------------

def q_customers_without_events(sf_dir: str):
    """Anti-join: customers with no event activity. The probe key set is
    computed DISTRIBUTIVELY (per-batch distinct + bucketed combine — the
    driver never scans the events fact table, VERDICT r2 #2 closed) and
    broadcast below ``common.MAX_BROADCAST_KEYS`` distinct keys; above that
    ``semi_anti_filter`` switches to Ray's native hash left_anti join."""
    return semi_anti_filter(
        read(sf_dir, "customer", ["c_custkey", "c_name"]),
        "c_custkey",
        read(sf_dir, "events", ["user_id"]),
        "user_id",
        anti=True,
    )


def q_parts_with_orders(sf_dir: str):
    """Semi-join: parts referenced by at least one lineitem (same
    distributed-distinct → broadcast-or-hash-join shape as the anti join)."""
    return semi_anti_filter(
        read(sf_dir, "part", ["p_partkey", "p_name"]),
        "p_partkey",
        read(sf_dir, "lineitem", ["l_partkey"]),
        "l_partkey",
    )


# --- priority / order-sensitive dedup (D6-class) ---------------------------

def q_first_event_per_user(sf_dir: str):
    """Order-sensitive dedup: keep each user's earliest event
    (deterministic (ts, event_id) tiebreak) — the distributed form of
    ``drop_duplicates(keep="first")`` with an explicit rank
    (SURVEY.md D6: priority dedup must carry the order explicitly).

    Shuffle shape (VERDICT r3 #1 closed): per-batch map-side first bounds
    the shuffle at one row per (user, batch); the combine hash-buckets by
    user — ONE vectorized sort + drop_duplicates per bucket, never a
    Python-level group per user."""
    ds = read(sf_dir, "events", ["event_id", "user_id", "ts"])
    n_buckets = default_buckets()

    # map-side combine: per-batch first, then a per-bucket vectorized first
    def batch_first(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.sort_values(["ts", "event_id"])
            .drop_duplicates(subset=["user_id"], keep="first")
            .copy()
        )
        g["_ub"] = _user_bucket(g["user_id"].to_numpy(np.int64), n_buckets)
        return g

    def bucket_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"]).drop_duplicates(
            subset=["user_id"], keep="first"
        )
        return pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(np.int64),
                "first_event_id": g["event_id"].to_numpy(np.int64),
                "first_ts": g["ts"].to_numpy(),
            }
        )

    return (
        ds.map_batches(batch_first, batch_format="pandas")
        .groupby("_ub")
        .map_groups(bucket_first, batch_format="pandas")
    )


# --- distinct-count aggregate (G5-class collect_set) -----------------------

def q_user_event_type_counts(sf_dir: str):
    """Distinct event types per user (COUNT(DISTINCT ..) GROUP BY user).

    Shuffle shape (VERDICT r3 #1 closed — this was the worst offender: one
    Python-level group per distinct (user, type) PAIR): per-batch distinct
    pairs bound the shuffle, the combine hash-buckets by USER so every pair
    of a user co-locates, and each bucket runs ONE vectorized
    drop_duplicates + groupby-size over the whole bucket frame."""
    ds = read(sf_dir, "events", ["user_id", "event_type"])
    n_buckets = default_buckets()

    def distinct_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates().copy()
        g["_ub"] = _user_bucket(g["user_id"].to_numpy(np.int64), n_buckets)
        return g

    def bucket_count(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.drop_duplicates(subset=["user_id", "event_type"])
            .groupby("user_id", as_index=False)
            .size()
            .rename(columns={"size": "n_types"})
        )
        out["n_types"] = out["n_types"].astype(np.int64)
        return out

    return (
        ds.map_batches(distinct_pairs, batch_format="pandas")
        .groupby("_ub")
        .map_groups(bucket_count, batch_format="pandas")
    )


def q_rolling_user_value(sf_dir: str, window: int = 3):
    """Rolling-window aggregate (streaming-shaped, §2.9): per user, ordered
    by (ts, event_id), the trailing ``window``-row sum of value cents.

    Shuffle shape (VERDICT r3 #1 closed): ONE hash-bucketed-by-user shuffle;
    each bucket task sorts its whole frame by (user, ts, event_id) once and
    computes every user's rolling sum in ONE segment-aware cumsum kernel
    (cs[i] - cs[i - min(window, pos_in_segment + 1)]) — no per-user
    Python-level dispatch anywhere. Only WITHIN-user order matters (same
    partitioning contract as sessionize)."""
    ds = read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    n_buckets = default_buckets()

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "user_id": u,
                "ts": df["ts"].astype("datetime64[us]"),
                "v": cents(df["value"]),
                "_ub": _user_bucket(u, n_buckets),
            }
        )

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"event_id": pd.Series([], dtype=np.int64),
                 "user_id": pd.Series([], dtype=np.int64),
                 "rolling_value_cents": pd.Series([], dtype=np.int64)}
            )
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        n = len(g)
        idx = np.arange(n, dtype=np.int64)
        pos = idx - _run_starts(u)  # 0-based position within the user's run
        lag = np.minimum(window, pos + 1)
        cs = np.concatenate(([0], np.cumsum(v)))
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(np.int64),
                "user_id": u,
                "rolling_value_cents": (cs[idx + 1] - cs[idx + 1 - lag]).astype(
                    np.int64
                ),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("_ub")
        .map_groups(roll, batch_format="pandas")
    )


def q_top_orders_per_segment(sf_dir: str, k: int = 3):
    """Top-k per group (T2-class, grouped): the k highest-value orders per
    market segment. Per-batch partial top-k per segment (map-side combine
    bounds the shuffle at k rows x segments per batch), then a final
    per-segment top-k; ranks are assigned inside the final group."""
    cust = read_arrow(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    ref = broadcast(cust)
    ds = read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    class JoinPrep:
        def __init__(self):
            self.small = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            out = df.merge(self.small, left_on="o_custkey", right_on="c_custkey")
            out = pd.DataFrame(
                {
                    "c_mktsegment": out["c_mktsegment"],
                    "o_orderkey": out["o_orderkey"].to_numpy(np.int64),
                    "total_cents": cents(out["o_totalprice"]),
                }
            )
            # map-side combine: ≤ k rows per segment leave each batch
            return (
                out.sort_values(
                    ["total_cents", "o_orderkey"], ascending=[False, False]
                )
                .groupby("c_mktsegment", as_index=False)
                .head(k)
            )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["total_cents", "o_orderkey"], ascending=[False, False]
        ).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (
        ds.map_batches(JoinPrep, batch_format="pandas", concurrency=(1, 4))
        .groupby("c_mktsegment")
        .map_groups(final_topk, batch_format="pandas")
    )


def q_sessionize(sf_dir: str, gap_seconds: int = 1800):
    """Session windows per user (gap > 30 min starts a new session).

    Shuffle shape (VERDICT r3 #1 closed): ONE hash-bucketed-by-user
    shuffle; each bucket sorts once by (user, ts, event_id) and derives
    every user's session ids in one boundary-mask cumsum — session_id[i] =
    cum_new_sessions[i] - cum_new_sessions[first row of i's user]. Only
    WITHIN-user order matters (guide §Streaming-shaped workloads)."""
    ds = read(sf_dir, "events", ["event_id", "user_id", "ts"])
    n_buckets = default_buckets()

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "user_id": u,
                "ts": df["ts"].astype("datetime64[us]"),
                "_ub": _user_bucket(u, n_buckets),
            }
        )

    def sess(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"event_id": pd.Series([], dtype=np.int64),
                 "user_id": pd.Series([], dtype=np.int64),
                 "session_id": pd.Series([], dtype=np.int64)}
            )
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        n = len(g)
        starts = _run_starts(u)
        new_user = np.arange(n, dtype=np.int64) == starts
        big_gap = np.empty(n, dtype=bool)
        big_gap[0] = True
        big_gap[1:] = (ts[1:] - ts[:-1]) > gap_seconds * 10**6
        cum = np.cumsum(new_user | big_gap)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(np.int64),
                "user_id": u,
                "session_id": (cum - cum[starts]).astype(np.int64),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("_ub")
        .map_groups(sess, batch_format="pandas")
    )


def q_approx_users(sf_dir: str):
    """Approximate COUNT(DISTINCT user_id) via a HyperLogLog sketch
    (functions/sketches.py) — the cardinality operator that replaces an
    exact distinct shuffle when 1.6% error is acceptable: each batch
    collapses to a fixed 4 KB register array, partials merge by
    elementwise max (order-independent, any tree shape), and only
    register arrays — never keys — cross the wire. At 100 TB the network
    cost is #blocks x 4 KB vs an all-to-all of every distinct key.

    Deterministic end-to-end (splitmix64 hash + integer-exact estimator),
    so the driver hash-compares it against an independent single-process
    oracle (oracles.py::_approx_users)."""
    import zlib

    from ..functions import sketches

    ds = read(sf_dir, "events", ["user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = sketches.splitmix64(
            df["user_id"].to_numpy(np.int64).astype(np.uint64)
        )
        regs = sketches.hll_registers(h)
        raw = regs.tobytes()
        return pd.DataFrame(
            {"regs": [raw], "_b": [zlib.crc32(raw) % 16]}
        )

    def bucket_merge(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(sketches.HLL_M, dtype=np.uint8)
        for raw in g["regs"]:
            regs = sketches.hll_merge(regs, np.frombuffer(raw, dtype=np.uint8))
        return pd.DataFrame({"regs": [regs.tobytes()]})

    merged = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_b")
        .map_groups(bucket_merge, batch_format="pandas")
        .to_pandas()  # <= 16 rows of 4 KB
    )
    final = np.zeros(sketches.HLL_M, dtype=np.uint8)
    for raw in merged["regs"]:
        final = sketches.hll_merge(final, np.frombuffer(raw, dtype=np.uint8))
    return pd.DataFrame(
        {"approx_users": np.array([sketches.hll_estimate(final)], dtype=np.int64)}
    )


def q_grouped_median(sf_dir: str):
    """Per-group exact median (percentile_disc 0.5) of event value cents —
    the GROUPED variant of the ``len_quantiles`` histogram plan, fully
    distributed: per-batch (event_type, value_cents) value-count partials,
    ONE ``grouped_sums`` combine (the shuffle moves one row per distinct
    (group, value) per batch), then groupby(event_type).map_groups walks
    each group's BOUNDED histogram (distinct-value-sized, not row-sized) —
    the walk itself runs inside the cluster, not on the driver."""
    ds = read(sf_dir, "events", ["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"event_type": df["event_type"], "v": cents(df["value"])}
        )
        g = out.groupby(["event_type", "v"], as_index=False, sort=False).size()
        return g.rename(columns={"size": "n"})

    hist = grouped_sums(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type", "v"],
        sums={"n": "n"},
    )

    def median_walk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("v")
        cum = g["n"].cumsum().to_numpy()
        total = int(cum[-1])
        k = max(1, -(-total // 2))  # ceil(0.5 * total), percentile_disc
        idx = int(np.searchsorted(cum, k, side="left"))
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "p50_value_cents": np.array([g["v"].iloc[idx]], dtype=np.int64),
                "n": np.array([total], dtype=np.int64),
            }
        )

    return hist.groupby("event_type").map_groups(median_walk, batch_format="pandas")


def q_customer_event_summary(sf_dir: str):
    """Left join with zero-fill: every customer with their event count
    (customers without events keep 0). The fact side reduces to a
    dictionary-bounded (user_id, n) map via ``grouped_sums``; it ships
    once as a broadcast sorted-array lookup and the dimension side streams
    through a searchsorted attach — no shuffle of either full table."""
    counts = grouped_sums(
        read(sf_dir, "events", ["user_id"]),
        ["user_id"],
        sums={},
        count_as="n_events",
    ).to_pandas()  # bounded by distinct users
    ids = counts["user_id"].to_numpy(np.int64)
    order = np.argsort(ids)
    ref = broadcast((ids[order], counts["n_events"].to_numpy(np.int64)[order]))

    class Attach:
        def __init__(self):
            self.ids, self.n = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            keys = df["c_custkey"].to_numpy(np.int64)
            pos = np.searchsorted(self.ids, keys)
            pos = np.clip(pos, 0, max(0, len(self.ids) - 1))
            hit = (self.ids[pos] == keys) if len(self.ids) else np.zeros(len(keys), bool)
            n = np.where(hit, self.n[pos] if len(self.ids) else 0, 0)
            return pd.DataFrame(
                {"c_custkey": keys, "n_events": n.astype(np.int64)}
            )

    return read(sf_dir, "customer", ["c_custkey"]).map_batches(
        Attach, batch_format="pandas", concurrency=(1, 4)
    )


def q_json_field_sum(sf_dir: str):
    """Semi-structured column parsing: extract the integer ``k`` field from
    the ``props`` JSON string column and sum it per event type — the
    schema-on-read class (JSON sidecar columns are how event logs carry
    sparse attributes at scale).

    Vectorized parse: one pandas C-regex extract per batch (equivalent to
    DuckDB's json_extract_string for this flat shape; a nested payload
    would swap in pa.json or orjson inside the same batch fn), then the
    standard grouped_sums combine. Rows whose props lack ``k`` contribute
    0 to the sum (SQL SUM ignores NULLs) and still count toward ``n``
    (COUNT(*)). A group whose rows ALL lack ``k`` sums to 0, and the
    oracle SQL wraps its SUM in COALESCE(..., 0) to match (VERDICT r4
    #4 alignment — previously a documented divergence; the all-missing
    case is pinned by tests/test_r5_fixes.py on a synthetic group)."""
    ds = read(sf_dir, "events", ["event_type", "props"])

    def parse(df: pd.DataFrame) -> pd.DataFrame:
        s = df["props"].str.extract(r'"k"\s*:\s*(-?\d+)', expand=False)
        k = pd.to_numeric(s, errors="coerce").fillna(0).astype(np.int64)
        return pd.DataFrame({"event_type": df["event_type"], "k": k})

    return grouped_sums(
        ds.map_batches(parse, batch_format="pandas"),
        ["event_type"],
        sums={"sum_k": "k"},
        count_as="n",
    )


def q_cohort_retention(sf_dir: str, n_buckets: int | None = None):
    """Cohort retention: users per (first-event week, active week) — the
    product-analytics matrix. Weeks are exact int64 Monday-truncated
    epoch-days (``d - ((d + 3) % 7)``, verified bit-equal to DuckDB
    date_trunc('week'); the ADVICE-r2 unit pin: int64 epoch arithmetic,
    never raw datetime64 assumptions).

    Fully distributed, no broadcast (users may be corpus-scale): one
    map_batches pass emits slim per-batch partials of BOTH relations —
    (user, min-week) candidates and distinct (user, active-week) rows —
    tagged and hash-bucketed by user in ONE shuffle; each bucket task
    finishes the per-user min, joins locally, and emits (cohort, active)
    pairs; a final ``grouped_sums`` counts users per cell. Bucket count
    scales with the cluster (``default_buckets``, VERDICT r3 #3)."""
    if n_buckets is None:
        n_buckets = default_buckets()
    ds = read(sf_dir, "events", ["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("datetime64[us]").astype("int64")
        d = us // (86400 * 10**6)
        wk = d - ((d + 3) % 7)
        out = pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64), "wk": wk})
        # batch-local combine: per-user min candidate + distinct active wks
        f = out.groupby("user_id", as_index=False)["wk"].min()
        f["kind"] = np.int64(0)
        e = out.drop_duplicates()
        e["kind"] = np.int64(1)
        both = pd.concat([f, e], ignore_index=True)
        both["_ub"] = (
            both["user_id"].to_numpy(np.uint64) * _PB % np.uint64(n_buckets)
        ).astype(np.int64)
        return both

    def bucket_join(g: pd.DataFrame) -> pd.DataFrame:
        f = g[g["kind"] == 0].groupby("user_id")["wk"].min()
        e = g[g["kind"] == 1].drop_duplicates(subset=["user_id", "wk"])
        cohort = e["user_id"].map(f).to_numpy(np.int64)
        cells = (
            pd.DataFrame({"cohort_day": cohort, "active_day": e["wk"].to_numpy()})
            .groupby(["cohort_day", "active_day"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return cells

    partials = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_ub")
        .map_groups(bucket_join, batch_format="pandas")
    )
    return grouped_sums(
        partials, ["cohort_day", "active_day"], sums={"n_users": "n"}
    )


# --- lag/lead window (streaming-shaped, §2.9) -------------------------------

def q_event_gaps(sf_dir: str):
    """LAG window op: per user, microseconds since the SAME user's previous
    event (ordered by ts, event_id); each user's first event is excluded so
    only exact int64 values cross the oracle boundary.

    Same scale shape as ``q_sessionize``: ONE hash-bucketed-by-user shuffle
    carrying (event_id, user_id, ts:int64); each bucket sorts once by
    (user, ts, event_id) and computes every user's gaps in one shifted
    subtraction masked at segment starts — no per-user Python dispatch."""
    ds = read(sf_dir, "events", ["event_id", "user_id", "ts"])
    n_buckets = default_buckets()

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "user_id": u,
                "ts": df["ts"].astype("datetime64[us]"),
                "_ub": _user_bucket(u, n_buckets),
            }
        )

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"event_id": pd.Series([], dtype=np.int64),
             "user_id": pd.Series([], dtype=np.int64),
             "gap_us": pd.Series([], dtype=np.int64)}
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        n = len(g)
        first = np.arange(n, dtype=np.int64) == _run_starts(u)
        gap = np.empty(n, dtype=np.int64)
        gap[0] = 0
        gap[1:] = ts[1:] - ts[:-1]
        keep = ~first
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(np.int64)[keep],
                "user_id": u[keep],
                "gap_us": gap[keep],
            }
        )

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("_ub")
        .map_groups(gaps, batch_format="pandas")
    )


# --- multi-join OLAP pipelines (TPC-H Q3/Q5 shapes) -------------------------

def q_shipping_priority(sf_dir: str, k: int = 10):
    """TPC-H Q3 shape: top-k pending-revenue orders for one market segment.

    Scale plan: the customer segment filter is a broadcast semi-join
    (dimension-sized key set ships once); orders and lineitem are BOTH
    date-pruned at the read boundary inside map_batches; the orders ⋈
    lineitem step is a FACT-FACT hash join (``Dataset.join``, partitioned
    by order key — neither fact is ever driver-resident or broadcast);
    revenue combines via ``grouped_sums`` and a per-batch partial top-k
    bounds the final sort at k rows per block."""
    cut = _dt.datetime(1998, 1, 1)
    cust = read_arrow(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    bld = np.sort(
        cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"].to_numpy(np.int64)
    )
    keys_ref = broadcast(bld)

    orders = read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    class FilterOrders:
        def __init__(self):
            self.keys = ray.get(keys_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            d = df[df["o_orderdate"] < cut]
            ck = d["o_custkey"].to_numpy(np.int64)
            if len(self.keys):
                pos = np.searchsorted(self.keys, ck)
                pos[pos == len(self.keys)] = 0
                hit = self.keys[pos] == ck
            else:  # empty key set: empty semi-join (ADVICE r3 crash class)
                hit = np.zeros(len(ck), dtype=bool)
            d = d[hit]
            return pd.DataFrame(
                {
                    "o_orderkey": d["o_orderkey"].to_numpy(np.int64),
                    "o_orderdate": d["o_orderdate"].astype("datetime64[us]"),
                }
            )

    o_f = orders.map_batches(FilterOrders, batch_format="pandas", concurrency=(1, 4))

    li = read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    )

    def prep_li(df: pd.DataFrame) -> pd.DataFrame:
        # exact integer revenue in cent-hundredths: price_cents x
        # (100 - disc_cents). Rounding the FLOAT product lands exactly on
        # .5 for 2-decimal prices/discounts, where numpy (half-even) and
        # DuckDB round() (half-away) disagree — so no float ever crosses
        # the oracle boundary here.
        d = df[df["l_shipdate"] > cut]
        return pd.DataFrame(
            {
                "l_orderkey": d["l_orderkey"].to_numpy(np.int64),
                "rev_cc": cents(d["l_extendedprice"])
                * (100 - cents(d["l_discount"])),
            }
        )

    li_f = li.map_batches(prep_li, batch_format="pandas")
    n_part = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
    j = li_f.join(o_f, "inner", num_partitions=n_part,
                  on=("l_orderkey",), right_on=("o_orderkey",))
    agg = grouped_sums(
        j, ["l_orderkey", "o_orderdate"], sums={"revenue_ccents": "rev_cc"}
    )

    def ptop(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["revenue_ccents", "o_orderdate", "l_orderkey"],
            ascending=[False, True, True],
        ).head(k)

    return (
        agg.map_batches(ptop, batch_format="pandas")
        .sort(["revenue_ccents", "o_orderdate", "l_orderkey"],
              descending=[True, False, False])
        .limit(k)
    )


def q_local_supplier_volume(sf_dir: str):
    """TPC-H Q5 shape: revenue by nation where the lineitem's supplier and
    the order's customer share a nation inside one region, over one order
    year.

    Scale plan: nation/region are true dimensions (broadcast name maps);
    orders ⋈ customer and lineitem ⋈ (orders⋈customer) are FACT-FACT hash
    joins (``Dataset.join``) — customer is fact-sized in this schema, so
    it is NOT broadcast; the supplier side at TPC-H scale is 10× smaller
    than customer and ships as a broadcast int-array lookup with the hash
    join as the documented fallback above ~100M suppliers."""
    nation = read_arrow(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    region = read_arrow(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    nat = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    nat = nat[nat["r_name"] == "ASIA"]
    nat_keys = np.sort(nat["n_nationkey"].to_numpy(np.int64))
    name_of = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    supp = read_arrow(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    s_keys = np.sort(supp["s_suppkey"].to_numpy(np.int64))
    s_nat = supp.set_index("s_suppkey").loc[s_keys, "s_nationkey"].to_numpy(np.int64)
    supp_ref = broadcast((s_keys, s_nat))
    nat_ref = broadcast((nat_keys, name_of))

    lo = _dt.datetime(1997, 1, 1)
    hi = _dt.datetime(1998, 1, 1)
    orders = read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def prep_orders(df: pd.DataFrame) -> pd.DataFrame:
        d = df[(df["o_orderdate"] >= lo) & (df["o_orderdate"] < hi)]
        return pd.DataFrame(
            {
                "o_orderkey": d["o_orderkey"].to_numpy(np.int64),
                "o_custkey": d["o_custkey"].to_numpy(np.int64),
            }
        )

    o_f = orders.map_batches(prep_orders, batch_format="pandas")

    cust = read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    class PrepCust:
        def __init__(self):
            self.nat_keys, _ = ray.get(nat_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            nk = df["c_nationkey"].to_numpy(np.int64)
            if len(self.nat_keys):
                pos = np.searchsorted(self.nat_keys, nk)
                pos[pos == len(self.nat_keys)] = 0
                hit = self.nat_keys[pos] == nk
            else:
                hit = np.zeros(len(nk), dtype=bool)
            d = df[hit]
            return pd.DataFrame(
                {
                    "c_custkey": d["c_custkey"].to_numpy(np.int64),
                    "c_nationkey": d["c_nationkey"].to_numpy(np.int64),
                }
            )

    c_f = cust.map_batches(PrepCust, batch_format="pandas", concurrency=(1, 4))
    n_part = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
    oc = o_f.join(c_f, "inner", num_partitions=n_part,
                  on=("o_custkey",), right_on=("c_custkey",))

    li = read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    )

    def prep_li(df: pd.DataFrame) -> pd.DataFrame:
        # exact integer cent-hundredths (see q_shipping_priority)
        return pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
                "l_suppkey": df["l_suppkey"].to_numpy(np.int64),
                "rev_cc": cents(df["l_extendedprice"])
                * (100 - cents(df["l_discount"])),
            }
        )

    li_f = li.map_batches(prep_li, batch_format="pandas")
    j = li_f.join(oc, "inner", num_partitions=n_part,
                  on=("l_orderkey",), right_on=("o_orderkey",))

    class AttachSupp:
        def __init__(self):
            self.s_keys, self.s_nat = ray.get(supp_ref)
            _, self.name_of = ray.get(nat_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            sk = df["l_suppkey"].to_numpy(np.int64)
            if len(self.s_keys):
                pos = np.searchsorted(self.s_keys, sk)
                pos[pos == len(self.s_keys)] = 0
                ok = self.s_keys[pos] == sk
                snat = np.where(ok, self.s_nat[pos], np.int64(-1))
            else:
                ok = np.zeros(len(sk), dtype=bool)
                snat = np.full(len(sk), -1, dtype=np.int64)
            keep = ok & (snat == df["c_nationkey"].to_numpy(np.int64))
            d = df[keep]
            return pd.DataFrame(
                {
                    "n_name": pd.Series(snat[keep]).map(self.name_of).to_numpy(object),
                    "rev_cc": d["rev_cc"].to_numpy(np.int64),
                }
            )

    attached = j.map_batches(AttachSupp, batch_format="pandas", concurrency=(1, 4))
    return grouped_sums(attached, ["n_name"], sums={"revenue_ccents": "rev_cc"})


def q_customer_order_distribution(sf_dir: str):
    """Order-count histogram (the TPC-H Q13 shape): per-customer order
    counts via a left join with zero-fill, then the distribution of those
    counts. Tests the outer-join + double-aggregation composition.

    Scale shape: the fact side reduces to (custkey, n_orders) via
    ``grouped_sums`` (distributed map-side combine; never the raw orders).
    The per-customer table is customer-cardinality — the attach is the
    broadcast-or-join dual plan of ``q_customer_event_summary``; here the
    grouped counts table re-buckets straight into the second (tiny)
    histogram combine, so the wide side moves once."""
    counts = grouped_sums(
        read(sf_dir, "orders", ["o_custkey"]), ["o_custkey"], sums={},
        count_as="n_orders",
    ).to_pandas()  # bounded by distinct ordering customers
    keys = counts["o_custkey"].to_numpy(np.int64)
    order = np.argsort(keys)
    ref = broadcast((keys[order], counts["n_orders"].to_numpy(np.int64)[order]))

    class Attach:
        def __init__(self):
            self.keys, self.n = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            ck = df["c_custkey"].to_numpy(np.int64)
            if len(self.keys):
                pos = np.searchsorted(self.keys, ck)
                pos[pos == len(self.keys)] = 0
                hit = self.keys[pos] == ck
                n = np.where(hit, self.n[pos], 0)
            else:
                n = np.zeros(len(ck), dtype=np.int64)
            return pd.DataFrame({"n_orders": n.astype(np.int64)})

    per_cust = read(sf_dir, "customer", ["c_custkey"]).map_batches(
        Attach, batch_format="pandas", concurrency=(1, 4)
    )
    return grouped_sums(per_cust, ["n_orders"], sums={}, count_as="n_customers")


def q_sliding_activity(sf_dir: str, hours: int = 3):
    """Sliding-window aggregate: per present hour, the event count over
    the trailing ``hours``-hour window (DuckDB RANGE-frame semantics —
    missing hours are NOT zero-filled; the window covers present hours in
    (hr - hours, hr]).

    Scale shape: the corpus-wide pass is ONE ``grouped_sums`` on the
    int64 epoch-hour (the q_hourly_user_activity key discipline); the
    sliding sum then runs vectorized (cumsum + searchsorted) over the
    time-bounded hourly table — #rows = distinct hours, bounded by the
    corpus time span, not its volume."""
    ds = read(sf_dir, "events", ["ts"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "hour_idx": (
                    df["ts"].astype("datetime64[us]").astype("int64")
                    // (3600 * 10**6)
                ).astype(np.int64),
            }
        )

    hourly = (
        grouped_sums(
            ds.map_batches(prep, batch_format="pandas"), ["hour_idx"], sums={},
            count_as="n",
        )
        .to_pandas()  # bounded by distinct hours (time span, not volume)
        .sort_values("hour_idx")
        .reset_index(drop=True)
    )
    h = hourly["hour_idx"].to_numpy(np.int64)
    n = hourly["n"].to_numpy(np.int64)
    cum = np.cumsum(n)
    # window start: first present hour > hr - hours
    start = np.searchsorted(h, h - (hours - 1), side="left")
    n_win = cum - np.where(start > 0, cum[start - 1], 0)
    return pd.DataFrame(
        {
            "hr": pd.Series(h * 3600 * 10**6, dtype="int64").astype(
                "datetime64[us]"
            ),
            "n_window": n_win.astype(np.int64),
        }
    )


def q_order_event_window(sf_dir: str, days: int = 7):
    """Range join: per order, the count of same-user events with
    ``ts`` in the half-open window (o_orderdate, o_orderdate + days]
    — the temporal-join sibling of the as-of join (orders with no
    in-window events keep 0, LEFT-JOIN semantics).

    Distributed exactly like ``q_latest_order_before_event``: both fact
    tables hash-partition by user bucket in ONE union + groupby shuffle
    (payload: user, int64 epoch-µs, key, side). Inside a bucket the
    interval counts come from a single merged LEXSORT — events and both
    window endpoints sort together on (user, ts, side) and each
    endpoint's sorted position, corrected for the endpoints before it,
    IS the count of events lex-≤ that endpoint; the window count is the
    difference of its two endpoint counts (events of smaller users
    cancel). No per-user Python, no per-row search — one
    O(m log m) vectorized pass per bucket (the VERDICT r3 #1
    discipline)."""
    ev = read(sf_dir, "events", ["user_id", "ts"])
    orders = read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    n_buckets = default_buckets()
    span_us = np.int64(days) * 86_400_000_000

    def tag_events(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "user_id": u,
                "ts_us": df["ts"].astype("datetime64[us]").astype("int64"),
                "o_orderkey": np.zeros(len(df), dtype=np.int64),
                "_side": np.zeros(len(df), dtype=np.int8),
                "_ub": _user_bucket(u, n_buckets),
            }
        )

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        u = df["o_custkey"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "user_id": u,
                "ts_us": df["o_orderdate"].astype("datetime64[us]").astype("int64"),
                "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
                "_side": np.ones(len(df), dtype=np.int8),
                "_ub": _user_bucket(u, n_buckets),
            }
        )

    both = ev.map_batches(tag_events, batch_format="pandas").union(
        orders.map_batches(tag_orders, batch_format="pandas")
    )

    def window_counts(g: pd.DataFrame) -> pd.DataFrame:
        side = g["_side"].to_numpy()
        u_e = g["user_id"].to_numpy(np.int64)[side == 0]
        t_e = g["ts_us"].to_numpy(np.int64)[side == 0]
        oq = g[side == 1]
        okey = oq["o_orderkey"].to_numpy(np.int64)
        u_q = oq["user_id"].to_numpy(np.int64)
        t_q = oq["ts_us"].to_numpy(np.int64)
        nq = len(okey)
        if nq == 0:
            return pd.DataFrame({"o_orderkey": pd.Series([], dtype=np.int64),
                                 "n_events": pd.Series([], dtype=np.int64)})
        ne = len(u_e)
        # merged items: events (tag 0) then hi endpoints then lo endpoints
        mu = np.concatenate([u_e, u_q, u_q])
        mt = np.concatenate([t_e, t_q + span_us, t_q])
        tag = np.concatenate(
            [np.zeros(ne, np.int8), np.ones(2 * nq, np.int8)]
        )
        order = np.lexsort((tag, mt, mu))  # events first at equal (u, ts)
        pos = np.empty(len(order), dtype=np.int64)
        pos[order] = np.arange(len(order), dtype=np.int64)
        # endpoints before each endpoint in sorted order (inclusive of self)
        qcum = np.cumsum(tag[order].astype(np.int64))
        count_le = pos - (qcum[pos] - 1)  # events lex-<= this endpoint
        hi = count_le[ne : ne + nq]
        lo = count_le[ne + nq :]
        return pd.DataFrame(
            {"o_orderkey": okey, "n_events": (hi - lo).astype(np.int64)}
        )

    return both.groupby("_ub").map_groups(window_counts, batch_format="pandas")


FUNNEL_STAGES = ("view", "click", "purchase")


def q_funnel_conversion(sf_dir: str, stages: tuple = FUNNEL_STAGES):
    """Ordered funnel: per stage k, the users whose FIRST occurrences
    satisfy first(s1) < first(s2) < ... < first(sk) — the product-analytics
    conversion funnel over the event log (strict < on first timestamps;
    deterministic because the comparison is on int64 epoch-µs).

    Scale shape: per-batch conditional-min partials (one row per user per
    batch, int64 sentinel for absent stages) → ONE user-bucket shuffle →
    per-bucket vectorized min-combine + stage-flag cumprod → 3-int count
    partials; the driver sums a bucket-count-bounded table. The event
    payload never re-shuffles and no per-user Python runs anywhere (the
    grouped_sums discipline)."""
    ds = read(sf_dir, "events", ["user_id", "ts", "event_type"])
    n_buckets = default_buckets()
    sent = np.int64(2**62)
    k = len(stages)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        t = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        et = df["event_type"].to_numpy(object)
        frame = pd.DataFrame({"user_id": u})
        for i, s in enumerate(stages):
            m = et == s
            col = np.where(m, t, sent)
            frame[f"t{i}"] = col
        g = frame.groupby("user_id", sort=False).min().reset_index()
        g["_ub"] = _user_bucket(g["user_id"].to_numpy(np.int64), n_buckets)
        return g

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        f = g.drop(columns=["_ub"]).groupby("user_id", sort=False).min()
        ok = np.ones(len(f), dtype=bool)
        counts = []
        prev = None
        for i in range(k):
            t = f[f"t{i}"].to_numpy(np.int64)
            if prev is None:
                ok &= t < sent
            else:
                ok &= (t < sent) & (t > prev)
            counts.append(int(ok.sum()))
            prev = np.where(ok, t, sent)  # non-converted users stay out
        return pd.DataFrame(
            {
                "stage": np.arange(1, k + 1, dtype=np.int64),
                "event_type": pd.Series(list(stages), dtype=object),
                "n_users": pd.Series(counts, dtype=np.int64),
            }
        )

    parts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_ub")
        .map_groups(bucket_counts, batch_format="pandas")
        .to_pandas()  # ≤ k rows per bucket — bounded
    )
    agg = parts.groupby(["stage", "event_type"], sort=True)["n_users"].sum().reset_index()
    agg = agg.sort_values("stage").reset_index(drop=True)
    return pd.DataFrame(
        {
            "stage": agg["stage"].astype(np.int64),
            "event_type": agg["event_type"].astype(object),
            "n_users": agg["n_users"].astype(np.int64),
        }
    )


# --- TPC-H Q17 shape: decorrelated scalar subquery ---------------------------

SMALLQTY_MAX_BROADCAST = 2_000_000  # partkey->avg map entries to broadcast


def q_small_qty_revenue(sf_dir: str, max_broadcast: int = SMALLQTY_MAX_BROADCAST):
    """TPC-H Q17 shape (correlated scalar subquery, decorrelated): total
    revenue of lineitems whose quantity is below 20% of their part's
    average quantity. The classic "aggregate, then re-join the aggregate
    to the detail" decorrelation — the per-part average CANNOT be computed
    in the same pass that filters by it.

    Scale plan: pass 1 reduces lineitem to (partkey, sum_qty, n) via
    ``grouped_sums`` (map-side combine; the shuffle carries one slim row
    per partkey per batch). The re-attach is the broadcast-or-join dual
    plan: the aggregate table is PART-cardinality, broadcast as sorted
    int64 arrays under ``max_broadcast`` keys, hash ``Dataset.join``
    above it. Pass 2 streams lineitem once more, filters by the float64
    threshold (0.2 * sum/n, formed exactly as the oracle forms it), and
    folds exact integer cents partials — the result is one row, so the
    final combine is a driver-side sum of per-batch partials.
    """
    agg = grouped_sums(
        read(sf_dir, "lineitem", ["l_partkey", "l_quantity"]).map_batches(
            lambda df: pd.DataFrame(
                {
                    "l_partkey": df["l_partkey"].to_numpy(np.int64),
                    "q": df["l_quantity"].to_numpy(np.int64),
                }
            ),
            batch_format="pandas",
        ),
        ["l_partkey"],
        sums={"sq": "q"},
        count_as="nq",
    )
    n_keys = agg.count()
    li = read(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])

    def partial_from(df: pd.DataFrame) -> pd.DataFrame:
        thr = 0.2 * (
            df["sq"].to_numpy(np.float64) / df["nq"].to_numpy(np.float64)
        )
        keep = df["l_quantity"].to_numpy(np.float64) < thr
        d = df[keep]
        return pd.DataFrame(
            {
                "revenue_cents": [int(cents(d["l_extendedprice"]).sum())],
                "n_rows": [int(keep.sum())],
            }
        )

    if n_keys <= max_broadcast:
        ap = agg.to_pandas().sort_values("l_partkey")
        ref = broadcast(
            (
                ap["l_partkey"].to_numpy(np.int64),
                ap["sq"].to_numpy(np.int64),
                ap["nq"].to_numpy(np.int64),
            )
        )

        class Attach:
            def __init__(self):
                self.pk, self.sq, self.nq = ray.get(ref)

            def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
                pk = df["l_partkey"].to_numpy(np.int64)
                pos = np.searchsorted(self.pk, pk)  # every key present
                d = pd.DataFrame(
                    {
                        "l_quantity": df["l_quantity"].to_numpy(np.int64),
                        "l_extendedprice": df["l_extendedprice"].to_numpy(
                            np.float64
                        ),
                        "sq": self.sq[pos],
                        "nq": self.nq[pos],
                    }
                )
                return partial_from(d)

        partials = li.map_batches(Attach, batch_format="pandas", concurrency=(1, 8))
    else:
        n_part = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
        joined = li.join(agg, "inner", num_partitions=n_part, on=("l_partkey",))
        partials = joined.map_batches(partial_from, batch_format="pandas")

    tot = partials.to_pandas()
    return pd.DataFrame(
        {
            "revenue_cents": [np.int64(tot["revenue_cents"].sum())],
            "n_rows": [np.int64(tot["n_rows"].sum())],
        }
    )


# --- TPC-H Q8 shape: conditional market share --------------------------------

def q_market_share(
    sf_dir: str, region: str = "ASIA", nation: str = "NATION_7"
):
    """TPC-H Q8 shape (market share): among orders placed by customers of
    ``region``, the fraction of lineitem revenue supplied by ``nation``,
    per order year — the conditional-aggregate-ratio class (numerator is
    a CASE inside the same SUM pass as the denominator).

    Scale plan: the Q5 join tree (nation/region broadcast dimension maps;
    orders ⋈ customer as a fact-fact hash ``Dataset.join``; supplier
    nation attached from a broadcast sorted-int lookup with the hash join
    as the documented large-scale fallback), then ONE ``grouped_sums``
    over (year) carrying both exact cent-hundredth sums; the share is a
    single float64 division per year row, formed exactly as the oracle
    forms it."""
    nat = read_arrow(
        sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]
    ).to_pandas()
    reg = read_arrow(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    nr = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    cust_nations = np.sort(
        nr.loc[nr["r_name"] == region, "n_nationkey"].to_numpy(np.int64)
    )
    nation_keys = np.sort(
        nat.loc[nat["n_name"] == nation, "n_nationkey"].to_numpy(np.int64)
    )

    supp = read_arrow(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    s_keys = np.sort(supp["s_suppkey"].to_numpy(np.int64))
    s_nat = supp.set_index("s_suppkey").loc[s_keys, "s_nationkey"].to_numpy(np.int64)
    supp_ref = broadcast((s_keys, s_nat))
    dims_ref = broadcast((cust_nations, nation_keys))

    orders = read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def prep_orders(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
                "o_custkey": df["o_custkey"].to_numpy(np.int64),
                "o_year": df["o_orderdate"]
                .dt.year.to_numpy(np.int64),
            }
        )

    o_f = orders.map_batches(prep_orders, batch_format="pandas")

    cust = read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    class PrepCust:
        def __init__(self):
            self.keys, _ = ray.get(dims_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            nk = df["c_nationkey"].to_numpy(np.int64)
            if len(self.keys):
                pos = np.searchsorted(self.keys, nk)
                pos[pos == len(self.keys)] = 0
                hit = self.keys[pos] == nk
            else:
                hit = np.zeros(len(nk), dtype=bool)
            return pd.DataFrame(
                {"c_custkey": df["c_custkey"].to_numpy(np.int64)[hit]}
            )

    c_f = cust.map_batches(PrepCust, batch_format="pandas", concurrency=(1, 4))
    n_part = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
    oc = o_f.join(c_f, "inner", num_partitions=n_part,
                  on=("o_custkey",), right_on=("c_custkey",))

    li = read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    )

    def prep_li(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
                "l_suppkey": df["l_suppkey"].to_numpy(np.int64),
                "rev_cc": cents(df["l_extendedprice"])
                * (100 - cents(df["l_discount"])),
            }
        )

    j = li.map_batches(prep_li, batch_format="pandas").join(
        oc, "inner", num_partitions=n_part,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    class AttachSupp:
        def __init__(self):
            self.s_keys, self.s_nat = ray.get(supp_ref)
            _, self.nation_keys = ray.get(dims_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            sk = df["l_suppkey"].to_numpy(np.int64)
            if len(self.s_keys):
                pos = np.searchsorted(self.s_keys, sk)
                pos[pos == len(self.s_keys)] = 0
                ok = self.s_keys[pos] == sk
                snat = np.where(ok, self.s_nat[pos], np.int64(-1))
            else:
                snat = np.full(len(sk), -1, dtype=np.int64)
            rev = df["rev_cc"].to_numpy(np.int64)
            is_nat = np.isin(snat, self.nation_keys)
            return pd.DataFrame(
                {
                    "o_year": df["o_year"].to_numpy(np.int64),
                    "nation_ccents": np.where(is_nat, rev, np.int64(0)),
                    "total_ccents": rev,
                }
            )

    attached = j.map_batches(AttachSupp, batch_format="pandas", concurrency=(1, 4))
    out = (
        grouped_sums(
            attached,
            ["o_year"],
            sums={"nation_ccents": "nation_ccents", "total_ccents": "total_ccents"},
        )
        .to_pandas()
        .sort_values("o_year")
        .reset_index(drop=True)
    )
    out["mkt_share"] = out["nation_ccents"].to_numpy(np.float64) / out[
        "total_ccents"
    ].to_numpy(np.float64)
    return out


# --- TPC-H Q4/Q7/Q10/Q14/Q18/Q19/Q22 shapes (round 4c) -----------------------

def _grouped_max(
    ds, key: str, src: str, out: str, n_buckets: int | None = None
):
    """Grouped MAX with the grouped_sums discipline: per-batch pandas max
    partial (one row per key per batch rides the shuffle), then a
    hash-bucketed vectorized final max — max is associative-idempotent so
    partials combine exactly."""
    if n_buckets is None:
        n_buckets = default_buckets()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key, as_index=False).agg(**{out: (src, "max")})
        h = pd.util.hash_pandas_object(g[key], index=False).to_numpy()
        g["_pb"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return g

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(key, as_index=False).agg(**{out: (out, "max")})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_pb")
        .map_groups(final, batch_format="pandas")
    )


def q_order_priority_count(sf_dir: str):
    """TPC-H Q4 shape (EXISTS subquery decorrelated into a grouped max):
    orders placed in H1-1997 that have at least one lineitem shipped AFTER
    the order date, counted per order priority.

    The correlated ``EXISTS (SELECT .. WHERE l_orderkey = o_orderkey AND
    l_shipdate > o_orderdate)`` becomes ``max(l_shipdate) per orderkey >
    o_orderdate`` — one slim grouped-max pass over lineitem (the shuffle
    carries one (orderkey, max_ship) row per key per batch), a fact-fact
    hash join against the date-pruned orders slice, then a 5-row grouped
    count. Neither fact table is ever driver-resident."""
    lo = _dt.datetime(1997, 1, 1)
    hi = _dt.datetime(1997, 7, 1)

    li = read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]).map_batches(
        lambda df: pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
                "ship_us": df["l_shipdate"]
                .to_numpy("datetime64[us]")
                .astype(np.int64),
            }
        ),
        batch_format="pandas",
    )
    mx = _grouped_max(li, "l_orderkey", "ship_us", "max_ship_us")

    orders = read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
    )

    def prep_orders(df: pd.DataFrame) -> pd.DataFrame:
        d = df[(df["o_orderdate"] >= lo) & (df["o_orderdate"] < hi)]
        return pd.DataFrame(
            {
                "o_orderkey": d["o_orderkey"].to_numpy(np.int64),
                "date_us": d["o_orderdate"]
                .to_numpy("datetime64[us]")
                .astype(np.int64),
                "o_orderpriority": d["o_orderpriority"].astype(str),
            }
        )

    o_f = orders.map_batches(prep_orders, batch_format="pandas")
    n_part = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
    j = o_f.join(mx, "inner", num_partitions=n_part,
                 on=("o_orderkey",), right_on=("l_orderkey",))

    def exists_filter(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["max_ship_us"] > df["date_us"]]
        return pd.DataFrame({"o_orderpriority": d["o_orderpriority"].astype(str)})

    return grouped_sums(
        j.map_batches(exists_filter, batch_format="pandas"),
        ["o_orderpriority"],
        sums={},
        count_as="order_count",
    )


def q_volume_shipping(
    sf_dir: str,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    y_lo: int = 1996,
    y_hi: int = 1999,
):
    """TPC-H Q7 shape (volume shipping): lineitem revenue flowing between
    two nations — supplier in one, ordering customer in the other — per
    (supp_nation, cust_nation, ship year).

    Scale plan: the nation pair is a 2-key broadcast; customers are
    FILTERED to the two nations map-side (emitting (custkey, cust_nation))
    before the orders ⋈ customer fact-fact hash join; lineitem is
    year-pruned map-side and its supplier nation attached from a broadcast
    sorted-int lookup (supplier is dimension-sized; the hash-join fallback
    is the market_share pattern); the second fact-fact join co-locates on
    orderkey, after which only opposing-nation rows survive. The final
    exchange is ONE grouped_sums over ~(2 x years) keys."""
    nat = read_arrow(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    name_of = dict(zip(nat["n_nationkey"].astype(np.int64), nat["n_name"]))
    keys_ab = np.sort(
        nat.loc[nat["n_name"].isin([nation_a, nation_b]), "n_nationkey"]
        .to_numpy(np.int64)
    )
    supp = read_arrow(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    s_keys = np.sort(supp["s_suppkey"].to_numpy(np.int64))
    s_nat = supp.set_index("s_suppkey").loc[s_keys, "s_nationkey"].to_numpy(np.int64)
    dims_ref = broadcast((keys_ab, s_keys, s_nat, name_of))

    cust = read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    # Task-pool functions (closures over the broadcast ref), NOT actor pools:
    # the per-batch state is one ray.get of an already-local plasma object
    # (zero-copy for numpy), so tasks cost nothing extra — while three actor
    # pools would statically reserve 3 CPUs for the lifetime of the stream,
    # which together with the two joins' aggregators reserved the ENTIRE
    # 4-CPU test box and hard-deadlocked the executor (reads output-
    # backpressured at block 0, pools never granted actors; reproduced).
    def prep_cust(df: pd.DataFrame) -> pd.DataFrame:
        keys_ab, _, _, _ = ray.get(dims_ref)
        nk = df["c_nationkey"].to_numpy(np.int64)
        hit = np.isin(nk, keys_ab)
        return pd.DataFrame(
            {
                "c_custkey": df["c_custkey"].to_numpy(np.int64)[hit],
                "cust_nat": nk[hit],
            }
        )

    c_f = cust.map_batches(prep_cust, batch_format="pandas")
    orders = read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    n_part = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
    oc = orders.join(c_f, "inner", num_partitions=n_part,
                     on=("o_custkey",), right_on=("c_custkey",))

    li = read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def prep_li(df: pd.DataFrame) -> pd.DataFrame:
        keys_ab, s_keys, s_nat, _ = ray.get(dims_ref)
        yr = df["l_shipdate"].dt.year.to_numpy(np.int64)
        d = df[(yr >= y_lo) & (yr <= y_hi)]
        yr = yr[(yr >= y_lo) & (yr <= y_hi)]
        sk = d["l_suppkey"].to_numpy(np.int64)
        if len(s_keys):
            pos = np.searchsorted(s_keys, sk)
            pos[pos == len(s_keys)] = 0
            ok = s_keys[pos] == sk
            snat = np.where(ok, s_nat[pos], np.int64(-1))
        else:
            snat = np.full(len(sk), -1, dtype=np.int64)
        hit = np.isin(snat, keys_ab)
        return pd.DataFrame(
            {
                "l_orderkey": d["l_orderkey"].to_numpy(np.int64)[hit],
                "supp_nat": snat[hit],
                "l_year": yr[hit],
                "rev_cc": (
                    cents(d["l_extendedprice"])
                    * (100 - cents(d["l_discount"]))
                )[hit],
            }
        )

    li_f = li.map_batches(prep_li, batch_format="pandas")
    j = li_f.join(oc, "inner", num_partitions=n_part,
                  on=("l_orderkey",), right_on=("o_orderkey",))

    def opposing(df: pd.DataFrame) -> pd.DataFrame:
        _, _, _, name_of = ray.get(dims_ref)
        d = df[df["supp_nat"].to_numpy(np.int64)
               != df["cust_nat"].to_numpy(np.int64)]
        return pd.DataFrame(
            {
                "supp_nation": d["supp_nat"].map(name_of).astype(str),
                "cust_nation": d["cust_nat"].map(name_of).astype(str),
                "l_year": d["l_year"].to_numpy(np.int64),
                "rev_cc": d["rev_cc"].to_numpy(np.int64),
            }
        )

    return grouped_sums(
        j.map_batches(opposing, batch_format="pandas"),
        ["supp_nation", "cust_nation", "l_year"],
        sums={"revenue_ccents": "rev_cc"},
    )


def q_returned_items(sf_dir: str, k: int = 20):
    """TPC-H Q10 shape (returned-item reporting): top-k customers by
    revenue on RETURNED lineitems for orders placed in Q1-1997, with
    name / nation / account balance attached.

    Scale plan: both facts prune map-side (orders to the quarter, lineitem
    to returnflag='R'), meet in a fact-fact hash join on orderkey, and
    reduce via grouped_sums to customer-cardinality partials; a per-batch
    partial top-k bounds the global sort at k rows per block. Only the k
    winner keys are ever driver-resident — their display attributes come
    from ONE re-scan of the customer table filtered by a broadcast k-key
    set (never a full dimension collect)."""
    lo = _dt.datetime(1997, 1, 1)
    hi = _dt.datetime(1997, 4, 1)

    orders = read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def prep_orders(df: pd.DataFrame) -> pd.DataFrame:
        d = df[(df["o_orderdate"] >= lo) & (df["o_orderdate"] < hi)]
        return pd.DataFrame(
            {
                "o_orderkey": d["o_orderkey"].to_numpy(np.int64),
                "o_custkey": d["o_custkey"].to_numpy(np.int64),
            }
        )

    o_f = orders.map_batches(prep_orders, batch_format="pandas")

    li = read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    )

    def prep_li(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["l_returnflag"] == "R"]
        return pd.DataFrame(
            {
                "l_orderkey": d["l_orderkey"].to_numpy(np.int64),
                "rev_cc": cents(d["l_extendedprice"])
                * (100 - cents(d["l_discount"])),
            }
        )

    li_f = li.map_batches(prep_li, batch_format="pandas")
    n_part = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
    j = li_f.join(o_f, "inner", num_partitions=n_part,
                  on=("l_orderkey",), right_on=("o_orderkey",))
    agg = grouped_sums(j, ["o_custkey"], sums={"revenue_ccents": "rev_cc"})

    def ptop(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["revenue_ccents", "o_custkey"], ascending=[False, True]
        ).head(k)

    top = (
        agg.map_batches(ptop, batch_format="pandas")
        .sort(["revenue_ccents", "o_custkey"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )

    win_keys = np.sort(top["o_custkey"].to_numpy(np.int64))
    keys_ref = broadcast(win_keys)

    class PickCust:
        def __init__(self):
            self.keys = ray.get(keys_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            hit = np.isin(df["c_custkey"].to_numpy(np.int64), self.keys)
            d = df[hit]
            return pd.DataFrame(
                {
                    "c_custkey": d["c_custkey"].to_numpy(np.int64),
                    "c_name": d["c_name"].astype(str),
                    "c_nationkey": d["c_nationkey"].to_numpy(np.int64),
                    "acctbal_cents": cents(d["c_acctbal"]),
                }
            )

    attrs = (
        read(sf_dir, "customer",
             ["c_custkey", "c_name", "c_nationkey", "c_acctbal"])
        .map_batches(PickCust, batch_format="pandas", concurrency=(1, 4))
        .to_pandas()
    )
    nat = read_arrow(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    out = top.merge(attrs, left_on="o_custkey", right_on="c_custkey").merge(
        nat, left_on="c_nationkey", right_on="n_nationkey"
    )
    out = out.rename(columns={"o_custkey": "c_custkey_"})
    return pd.DataFrame(
        {
            "c_custkey": out["c_custkey"].to_numpy(np.int64),
            "c_name": out["c_name"].astype(str),
            "n_name": out["n_name"].astype(str),
            "acctbal_cents": out["acctbal_cents"].to_numpy(np.int64),
            "revenue_ccents": out["revenue_ccents"].to_numpy(np.int64),
        }
    ).sort_values(["revenue_ccents", "c_custkey"], ascending=[False, True]).reset_index(
        drop=True
    )


PROMO_MAX_BROADCAST = 2_000_000  # promo partkey set entries to broadcast


def q_promo_revenue(sf_dir: str, max_broadcast: int = PROMO_MAX_BROADCAST):
    """TPC-H Q14 shape (promotion effect): over one ship month, lineitem
    revenue split into promo-part revenue vs total — the conditional-
    aggregate pair whose ratio the report computes.

    Scale plan: the promo partkey set is computed DISTRIBUTIVELY
    (map-side filter + distinct_column) and applied with the broadcast-or-
    join dual plan (sorted-int membership under ``max_broadcast`` keys;
    hash Dataset.join carrying an is_promo flag above it). One stream over
    the month-pruned lineitem folds BOTH exact cent-hundredth sums per
    batch; the driver sums a handful of two-column partials."""
    lo = _dt.datetime(1997, 9, 1)
    hi = _dt.datetime(1997, 10, 1)

    part = read(sf_dir, "part", ["p_partkey", "p_type"])

    def promo_only(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["p_type"] == "PROMO"]
        return pd.DataFrame({"p_partkey": d["p_partkey"].to_numpy(np.int64)})

    promo = distinct_column(
        part.map_batches(promo_only, batch_format="pandas"), "p_partkey"
    ).materialize()
    n_promo = promo.count()

    li = read(
        sf_dir, "lineitem",
        ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def month_prune(df: pd.DataFrame) -> pd.DataFrame:
        d = df[(df["l_shipdate"] >= lo) & (df["l_shipdate"] < hi)]
        return pd.DataFrame(
            {
                "l_partkey": d["l_partkey"].to_numpy(np.int64),
                "rev_cc": cents(d["l_extendedprice"])
                * (100 - cents(d["l_discount"])),
            }
        )

    li_f = li.map_batches(month_prune, batch_format="pandas")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        rev = df["rev_cc"].to_numpy(np.int64)
        is_promo = df["is_promo"].to_numpy(bool)
        return pd.DataFrame(
            {
                "promo_ccents": [int(rev[is_promo].sum())],
                "total_ccents": [int(rev.sum())],
            }
        )

    if n_promo <= max_broadcast:
        p = promo.to_pandas()
        keys = (
            np.sort(p["p_partkey"].to_numpy(np.int64))
            if "p_partkey" in p.columns
            else np.empty(0, np.int64)
        )
        keys_ref = broadcast(keys)

        class Flag:
            def __init__(self):
                self.keys = ray.get(keys_ref)

            def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
                d = df.copy()
                d["is_promo"] = np.isin(
                    d["l_partkey"].to_numpy(np.int64), self.keys
                )
                return fold(d)

        partials = li_f.map_batches(Flag, batch_format="pandas", concurrency=(1, 8))
    else:
        n_part = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)

        def mark(df: pd.DataFrame) -> pd.DataFrame:
            d = df.copy()
            d["is_promo"] = True
            return d

        flagged = promo.map_batches(mark, batch_format="pandas")
        joined = li_f.join(
            flagged, "left_outer", num_partitions=n_part,
            on=("l_partkey",), right_on=("p_partkey",),
        ).map_batches(
            lambda df: df.assign(is_promo=df["is_promo"].fillna(False).astype(bool)),
            batch_format="pandas",
        )
        partials = joined.map_batches(fold, batch_format="pandas")

    tot = partials.to_pandas()
    return pd.DataFrame(
        {
            "promo_ccents": [np.int64(tot["promo_ccents"].sum())],
            "total_ccents": [np.int64(tot["total_ccents"].sum())],
        }
    )


def q_large_volume_customers(sf_dir: str, qty_min: int = 170, k: int = 100):
    """TPC-H Q18 shape (large-volume customers): orders whose total lineitem
    quantity exceeds ``qty_min``, top-k by order value, with the customer
    name attached.

    Scale plan: the HAVING subquery is one grouped_sums over lineitem
    (slim (orderkey, qty) partials ride the shuffle), filtered map-side
    before a fact-fact hash join back to orders; per-batch partial top-k
    bounds the global sort at k rows per block; only the k winners'
    custkeys drive a broadcast-filtered re-scan of customer for names
    (the Q10 display-attribute pattern — no dimension collect)."""
    qty = read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]).map_batches(
        lambda df: pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
                "q": np.rint(df["l_quantity"].to_numpy(np.float64)).astype(
                    np.int64
                ),
            }
        ),
        batch_format="pandas",
    )
    agg = grouped_sums(qty, ["l_orderkey"], sums={"sum_qty": "q"})

    def big_only(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["sum_qty"].to_numpy(np.int64) > qty_min]

    big = agg.map_batches(big_only, batch_format="pandas")

    orders = read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    ).map_batches(
        lambda df: pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
                "o_custkey": df["o_custkey"].to_numpy(np.int64),
                "o_orderdate": df["o_orderdate"].astype("datetime64[us]"),
                "totalprice_cents": cents(df["o_totalprice"]),
            }
        ),
        batch_format="pandas",
    )
    n_part = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
    j = orders.join(big, "inner", num_partitions=n_part,
                    on=("o_orderkey",), right_on=("l_orderkey",))

    def ptop(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["totalprice_cents", "o_orderkey"], ascending=[False, True]
        ).head(k)

    top = (
        j.map_batches(ptop, batch_format="pandas")
        .sort(["totalprice_cents", "o_orderkey"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )

    win_keys = np.sort(np.unique(top["o_custkey"].to_numpy(np.int64)))
    keys_ref = broadcast(win_keys)

    class PickCust:
        def __init__(self):
            self.keys = ray.get(keys_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            hit = np.isin(df["c_custkey"].to_numpy(np.int64), self.keys)
            d = df[hit]
            return pd.DataFrame(
                {
                    "c_custkey": d["c_custkey"].to_numpy(np.int64),
                    "c_name": d["c_name"].astype(str),
                }
            )

    names = (
        read(sf_dir, "customer", ["c_custkey", "c_name"])
        .map_batches(PickCust, batch_format="pandas", concurrency=(1, 4))
        .to_pandas()
    )
    out = top.merge(names, left_on="o_custkey", right_on="c_custkey")
    return pd.DataFrame(
        {
            "c_name": out["c_name"].astype(str),
            "c_custkey": out["c_custkey"].to_numpy(np.int64),
            "o_orderkey": out["o_orderkey"].to_numpy(np.int64),
            "o_orderdate": out["o_orderdate"].astype("datetime64[us]"),
            "totalprice_cents": out["totalprice_cents"].to_numpy(np.int64),
            "sum_qty": out["sum_qty"].to_numpy(np.int64),
        }
    ).sort_values(
        ["totalprice_cents", "o_orderkey"], ascending=[False, True]
    ).reset_index(drop=True)


# Q19 predicate bands: (brand, max size, qty lo, qty hi) per disjunct.
Q19_BANDS = (
    ("Brand#1", 15, 1, 11),
    ("Brand#2", 25, 10, 20),
    ("Brand#3", 35, 20, 30),
)


def q_disjunctive_revenue(sf_dir: str, bands: tuple = Q19_BANDS):
    """TPC-H Q19 shape (disjunctive pushdown): revenue of lineitems whose
    (part brand, part size, quantity) falls in any of three bands — the
    OR-of-ANDs predicate class that exercises cross-table predicate
    evaluation without a reduce.

    Scale plan: part attributes ship ONCE as a broadcast (sorted partkey,
    brand code, size) triple — dimension-bounded, with the hash-join dual
    plan the promo/small_qty family documents; each lineitem batch
    evaluates the whole disjunction vectorized and folds a single
    (revenue, rows) partial. No shuffle at all — the only exchange is the
    driver-side sum of per-batch partials."""
    part = read_arrow(
        sf_dir, "part", ["p_partkey", "p_brand", "p_size"]
    ).to_pandas()
    part = part.sort_values("p_partkey")
    brand_names = sorted({b for b, _, _, _ in bands})
    brand_code = {b: i for i, b in enumerate(brand_names)}
    codes = part["p_brand"].map(lambda b: brand_code.get(b, -1)).to_numpy(np.int64)
    dims_ref = broadcast(
        (
            part["p_partkey"].to_numpy(np.int64),
            codes,
            part["p_size"].to_numpy(np.int64),
        )
    )
    band_rows = [
        (brand_code[b], smax, qlo, qhi) for b, smax, qlo, qhi in bands
    ]

    li = read(
        sf_dir, "lineitem",
        ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    class Fold:
        def __init__(self):
            self.pk, self.brand, self.size = ray.get(dims_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            pk = df["l_partkey"].to_numpy(np.int64)
            if len(self.pk):
                pos = np.searchsorted(self.pk, pk)
                pos[pos == len(self.pk)] = 0
                ok = self.pk[pos] == pk
                brand = np.where(ok, self.brand[pos], np.int64(-1))
                size = np.where(ok, self.size[pos], np.int64(-1))
            else:
                brand = np.full(len(pk), -1, dtype=np.int64)
                size = brand
            qty = np.rint(df["l_quantity"].to_numpy(np.float64)).astype(np.int64)
            keep = np.zeros(len(pk), dtype=bool)
            for bc, smax, qlo, qhi in band_rows:
                keep |= (
                    (brand == bc)
                    & (size >= 1)
                    & (size <= smax)
                    & (qty >= qlo)
                    & (qty <= qhi)
                )
            rev = (
                cents(df["l_extendedprice"]) * (100 - cents(df["l_discount"]))
            )[keep]
            return pd.DataFrame(
                {
                    "revenue_ccents": [int(rev.sum())],
                    "n_rows": [int(keep.sum())],
                }
            )

    tot = li.map_batches(Fold, batch_format="pandas", concurrency=(1, 8)).to_pandas()
    return pd.DataFrame(
        {
            "revenue_ccents": [np.int64(tot["revenue_ccents"].sum())],
            "n_rows": [np.int64(tot["n_rows"].sum())],
        }
    )


def q_sales_opportunity(sf_dir: str, cutoff: "_dt.datetime" = None):
    """TPC-H Q22 shape (global-sales opportunity): per nation, the count and
    total balance of customers whose balance exceeds the positive-balance
    average AND who have placed no order since ``cutoff`` (the lapsed
    high-balance prospects the report targets).

    The scalar subquery becomes an exact integer comparison — ``bal_cents
    * n_positive > sum_positive_cents`` is bit-equal to ``c_acctbal >
    AVG(...)`` as rationals, so no float crosses the oracle boundary. The
    average's (sum, count) folds map-side into one-row partials; the
    NOT-EXISTS is the distributed semi_anti_filter over the date-pruned
    orders slice (distinct o_custkey → broadcast-or-hash-anti-join); the
    final exchange is one nation-keyed grouped_sums."""
    if cutoff is None:
        cutoff = _dt.datetime(2001, 1, 1)
    cust = read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])

    def avg_partial(df: pd.DataFrame) -> pd.DataFrame:
        bal = cents(df["c_acctbal"])
        pos = bal > 0
        return pd.DataFrame(
            {"sum_c": [int(bal[pos].sum())], "n_c": [int(pos.sum())]}
        )

    tot = cust.map_batches(avg_partial, batch_format="pandas").to_pandas()
    sum_c = int(tot["sum_c"].sum())
    n_c = int(tot["n_c"].sum())

    def rich_only(df: pd.DataFrame) -> pd.DataFrame:
        bal = cents(df["c_acctbal"])
        keep = bal * n_c > sum_c
        d = df[keep]
        return pd.DataFrame(
            {
                "c_custkey": d["c_custkey"].to_numpy(np.int64),
                "c_nationkey": d["c_nationkey"].to_numpy(np.int64),
                "bal_cents": bal[keep],
            }
        )

    rich = cust.map_batches(rich_only, batch_format="pandas")
    recent = read(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
        lambda df: pd.DataFrame(
            {
                "o_custkey": df.loc[
                    df["o_orderdate"] >= cutoff, "o_custkey"
                ].to_numpy(np.int64)
            }
        ),
        batch_format="pandas",
    )
    no_orders = semi_anti_filter(rich, "c_custkey", recent, "o_custkey", anti=True)

    nat = read_arrow(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    name_of = dict(zip(nat["n_nationkey"].astype(np.int64), nat["n_name"]))
    name_ref = broadcast(name_of)

    class AttachNation:
        def __init__(self):
            self.name_of = ray.get(name_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "n_name": df["c_nationkey"].map(self.name_of).astype(str),
                    "bal_cents": df["bal_cents"].to_numpy(np.int64),
                }
            )

    return grouped_sums(
        no_orders.map_batches(AttachNation, batch_format="pandas",
                              concurrency=(1, 4)),
        ["n_name"],
        sums={"totacctbal_cents": "bal_cents"},
        count_as="numcust",
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_event_type_pivot(sf_dir: str, types: tuple = EVENT_TYPES):
    """PIVOT class: per-user event counts spread into one column per event
    type (the wide-format feature frame a training pipeline feeds to a
    model). One pass: each batch folds a (user x types) partial count
    frame vectorized (one boolean mask per type), then a single user-keyed
    grouped_sums combines partials — the shuffle carries at most one row
    per (user, batch), never raw events."""
    ds = read(sf_dir, "events", ["user_id", "event_type"])
    cols = {t: f"n_{t}" for t in types}

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].astype(str)
        out = pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64)})
        for t, c in cols.items():
            out[c] = (et == t).to_numpy(np.int64)
        return out.groupby("user_id", as_index=False).sum()

    return grouped_sums(
        ds.map_batches(partial, batch_format="pandas"),
        ["user_id"],
        sums={c: c for c in cols.values()},
    )


def q_event_seq(sf_dir: str):
    """ROW_NUMBER window class: each event's 1-based rank within its user's
    history ordered by (ts, event_id). Same scale shape as q_event_gaps —
    ONE hash-bucketed-by-user shuffle of slim rows, one sort + segment
    cumcount per bucket (index minus run start), no per-user dispatch."""
    ds = read(sf_dir, "events", ["event_id", "user_id", "ts"])
    n_buckets = default_buckets()

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "user_id": u,
                "ts": df["ts"].astype("datetime64[us]"),
                "_ub": _user_bucket(u, n_buckets),
            }
        )

    def seq(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype=np.int64),
                    "user_id": pd.Series([], dtype=np.int64),
                    "seq": pd.Series([], dtype=np.int64),
                }
            )
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        idx = np.arange(len(g), dtype=np.int64)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(np.int64),
                "user_id": u,
                "seq": idx - _run_starts(u) + 1,
            }
        )

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("_ub")
        .map_groups(seq, batch_format="pandas")
    )


def q_top_supplier(sf_dir: str):
    """TPC-H Q15 shape (top supplier): per-supplier revenue over a
    three-month ship window; return the supplier row(s) whose revenue
    equals the global maximum, names attached. Ref semantics: the
    revenue-view + ``= (SELECT max(..))`` correlated filter.

    Scale plan: one grouped_sums over the window-filtered lineitem (slim
    (suppkey, cents) partials ride the shuffle; revenue is quantized to
    integer cents per row BEFORE summing so the sum is order-independent);
    the global max is a scalar Dataset aggregate (no collect); winners —
    bounded by the tie count — drive a broadcast-filtered dimension
    re-scan for names (the Q18/Q10 display-attribute pattern)."""
    lo = _dt.datetime(1995, 1, 1)
    hi = _dt.datetime(1995, 4, 1)
    li = read(
        sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"]
    )

    def rev(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["l_shipdate"] >= lo) & (df["l_shipdate"] < hi)
        d = df[m.to_numpy()]
        return pd.DataFrame(
            {
                "s_suppkey": d["l_suppkey"].to_numpy(np.int64),
                "rev_cents": cents(
                    d["l_extendedprice"].to_numpy(np.float64)
                    * (1.0 - d["l_discount"].to_numpy(np.float64))
                ),
            }
        )

    agg = grouped_sums(
        li.map_batches(rev, batch_format="pandas"),
        ["s_suppkey"],
        sums={"total_revenue": "rev_cents"},
    )

    empty = pd.DataFrame(
        {
            "s_suppkey": pd.Series([], dtype=np.int64),
            "s_name": pd.Series([], dtype=str),
            "total_revenue": pd.Series([], dtype=np.int64),
        }
    )
    mx = agg.max("total_revenue")
    if mx is None:  # empty ship window
        return empty

    winners = agg.filter(
        expr=f"total_revenue == {int(mx)}"
    ).to_pandas()  # bounded by the tie count

    win_keys = np.sort(np.unique(winners["s_suppkey"].to_numpy(np.int64)))
    keys_ref = broadcast(win_keys)

    class PickSupp:
        def __init__(self):
            self.keys = ray.get(keys_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            hit = np.isin(df["s_suppkey"].to_numpy(np.int64), self.keys)
            d = df[hit]
            return pd.DataFrame(
                {
                    "s_suppkey": d["s_suppkey"].to_numpy(np.int64),
                    "s_name": d["s_name"].astype(str),
                }
            )

    names = (
        read(sf_dir, "supplier", ["s_suppkey", "s_name"])
        .map_batches(PickSupp, batch_format="pandas", concurrency=(1, 4))
        .to_pandas()
    )
    out = winners.merge(names, on="s_suppkey")
    return pd.DataFrame(
        {
            "s_suppkey": out["s_suppkey"].to_numpy(np.int64),
            "s_name": out["s_name"].astype(str),
            "total_revenue": out["total_revenue"].to_numpy(np.int64),
        }
    ).sort_values("s_suppkey", ignore_index=True)


def q_lone_return_supplier(sf_dir: str, n_buckets: int | None = None):
    """TPC-H Q21 shape adapted to this schema (which has no
    commit/receipt dates): for each supplier, the number of
    MULTI-supplier orders on which it was the ONLY supplier with a
    returned line (``l_returnflag = 'R'``) — the double-correlated
    EXISTS (another supplier shipped the order) + NOT EXISTS (another
    supplier's line was returned) self-join, SURVEY §2 J2 family at
    fact-fact scale.

    Scale plan: ONE hash-bucketed shuffle on l_orderkey carrying
    per-batch-deduped slim (orderkey, suppkey, returned) integer
    partials; each bucket resolves both correlated quantifiers
    vectorized (pandas groupby-transform over the whole bucket frame:
    distinct-supplier count + returned-supplier count per order) and
    emits only the lone-returner (suppkey) hits; a second,
    supplier-bounded grouped_sums yields the final counts, and names
    attach by broadcast-filtered dimension re-scan. No fact collect;
    both shuffles carry integers only; bucket count scales with the
    cluster (default_buckets) so per-task memory is ~|orders|/buckets."""
    if n_buckets is None:
        n_buckets = default_buckets()
    li = read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_returnflag"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "ok": df["l_orderkey"].to_numpy(np.int64),
                "sk": df["l_suppkey"].to_numpy(np.int64),
                "ret": (df["l_returnflag"].astype(str) == "R").to_numpy(np.int64),
            }
        ).groupby(["ok", "sk"], as_index=False).agg(ret=("ret", "max"))
        h = pd.util.hash_pandas_object(g["ok"], index=False).to_numpy()
        g["_pb"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return g

    def lone(g: pd.DataFrame) -> pd.DataFrame:
        # re-combine cross-batch partials, then both quantifiers at once
        g = g.groupby(["ok", "sk"], as_index=False).agg(ret=("ret", "max"))
        grp = g.groupby("ok")
        n_supp = grp["sk"].transform("size").to_numpy(np.int64)
        n_ret = grp["ret"].transform("sum").to_numpy(np.int64)
        keep = (g["ret"].to_numpy(np.int64) == 1) & (n_supp >= 2) & (n_ret == 1)
        return pd.DataFrame(
            {
                "s_suppkey": g["sk"].to_numpy(np.int64)[keep],
                "one": np.ones(int(keep.sum()), dtype=np.int64),
            }
        )

    hits = (
        li.map_batches(partial, batch_format="pandas")
        .groupby("_pb")
        .map_groups(lone, batch_format="pandas")
    )
    counts = grouped_sums(hits, ["s_suppkey"], sums={"numwait": "one"}).to_pandas()
    # ^ bounded by the supplier dimension

    if len(counts) == 0:
        return pd.DataFrame(
            {
                "s_suppkey": pd.Series([], dtype=np.int64),
                "s_name": pd.Series([], dtype=str),
                "numwait": pd.Series([], dtype=np.int64),
            }
        )

    keys_ref = broadcast(np.sort(counts["s_suppkey"].to_numpy(np.int64)))

    class PickSupp:
        def __init__(self):
            self.keys = ray.get(keys_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            hit = np.isin(df["s_suppkey"].to_numpy(np.int64), self.keys)
            d = df[hit]
            return pd.DataFrame(
                {
                    "s_suppkey": d["s_suppkey"].to_numpy(np.int64),
                    "s_name": d["s_name"].astype(str),
                }
            )

    names = (
        read(sf_dir, "supplier", ["s_suppkey", "s_name"])
        .map_batches(PickSupp, batch_format="pandas", concurrency=(1, 4))
        .to_pandas()
    )
    out = counts.merge(names, on="s_suppkey")
    return pd.DataFrame(
        {
            "s_suppkey": out["s_suppkey"].to_numpy(np.int64),
            "s_name": out["s_name"].astype(str),
            "numwait": out["numwait"].to_numpy(np.int64),
        }
    ).sort_values("s_suppkey", ignore_index=True)


def q_cube_summary(sf_dir: str):
    """GROUP BY CUBE(l_returnflag, l_linestatus) — all four grouping sets.
    Same plan as q_rollup_summary: ONE corpus pass computes the finest
    level; every coarser set (including the ROLLUP-missing
    (NULL, linestatus) marginal) re-aggregates the BOUNDED finest-level
    frame, so CUBE costs three tiny pandas passes on a group-count-sized
    table, never extra shuffles. NULL levels carry the '(all)' sentinel
    so the value-hash compare is string-typed at every level."""
    fine = q_pricing_summary(sf_dir).to_pandas()  # bounded: one row per group

    sums = ["sum_qty_cents", "sum_price_cents", "sum_disc_cents", "n_rows"]
    by_rf = fine.groupby("l_returnflag", as_index=False)[sums].sum()
    by_rf["l_linestatus"] = "(all)"
    by_ls = fine.groupby("l_linestatus", as_index=False)[sums].sum()
    by_ls["l_returnflag"] = "(all)"
    top = fine[sums].sum().to_frame().T
    top["l_returnflag"] = "(all)"
    top["l_linestatus"] = "(all)"
    cols = ["l_returnflag", "l_linestatus", *sums]
    out = pd.concat(
        [fine[cols], by_rf[cols], by_ls[cols], top[cols]], ignore_index=True
    )
    return out.astype({c: np.int64 for c in sums}).sort_values(
        ["l_returnflag", "l_linestatus"]
    ).reset_index(drop=True)


QUANTILE_QS = (0.5, 0.9, 0.99)


def q_exact_quantiles(sf_dir: str, n_bins: int = 4096):
    """EXACT per-group quantiles (DuckDB ``quantile_disc`` semantics: the
    ceil(q·n)-th smallest, pinned by 200-trial probe + property test) of
    lineitem extendedprice cents per returnflag — for an UNBOUNDED value
    domain with BOUNDED memory. q_grouped_median's value-count histogram
    plan needs one row per DISTINCT value; at 100 TB a price-like column
    can have ~10^9 distinct values per group, so that plan's combine
    state is unbounded. This is the scale path: iterative-histogram
    selection (the classic 2-round distributed selection).

      pass 1 — grouped (min, max, count): per-batch pandas partials,
        tree-combined; state = one row per group.
      pass 2 — per-(group, linear-bin) counts with
        bin = (v−min)·n_bins // (max−min+1); state = groups × n_bins
        integers, INDEPENDENT of distinct-value count. The driver walks
        each group's bin cumsum to the target bin + residual rank per
        quantile (tiny).
      pass 3 — per-(group, value) counts ONLY for rows inside a
        candidate bin (≈ n/n_bins of the corpus rides the combine);
        each group walks its now-bounded in-bin histogram to the
        residual rank.

    Three streaming scans, zero value-domain-sized state, all integers
    across the oracle boundary."""
    import math

    qs = QUANTILE_QS

    def to_cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "g": df["l_returnflag"].astype(str),
                "v": cents(df["l_extendedprice"]),
            }
        )

    def scan():
        return read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])

    # pass 1: per-group min / max / count
    def stat_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = to_cents(df)
        return d.groupby("g", as_index=False).agg(
            mn=("v", "min"), mx=("v", "max"), n=("v", "size")
        )

    def stat_combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("g", as_index=False).agg(
            mn=("mn", "min"), mx=("mx", "max"), n=("n", "sum")
        )

    stats = tree_to_pandas(
        scan().map_batches(stat_partial, batch_format="pandas"), stat_combine
    )
    if len(stats) == 0:
        return pd.DataFrame(
            {
                "l_returnflag": pd.Series([], dtype=str),
                "n_rows": pd.Series([], dtype=np.int64),
                **{
                    f"p{int(q * 100)}_cents": pd.Series([], dtype=np.int64)
                    for q in qs
                },
            }
        )
    smap = {
        r.g: (int(r.mn), int(r.mx), int(r.n)) for r in stats.itertuples()
    }
    smap_ref = broadcast(smap)

    # pass 2: per-(group, bin) counts against the broadcast stats
    class BinCount:
        def __init__(self):
            self.smap = ray.get(smap_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            d = to_cents(df)
            mn = d["g"].map({g: s[0] for g, s in self.smap.items()}).to_numpy(np.int64)
            w = d["g"].map(
                {g: s[1] - s[0] + 1 for g, s in self.smap.items()}
            ).to_numpy(np.int64)
            d["b"] = (d["v"].to_numpy(np.int64) - mn) * np.int64(n_bins) // w
            return d.groupby(["g", "b"], as_index=False).size().rename(
                columns={"size": "n"}
            )

    def bin_combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["g", "b"], as_index=False).agg(n=("n", "sum"))

    bins = tree_to_pandas(
        scan().map_batches(BinCount, batch_format="pandas", concurrency=(1, 8)),
        bin_combine,
    )

    # driver: target bin + residual rank per (group, quantile) — tiny
    targets: dict[str, dict[float, tuple[int, int]]] = {}
    for g, gb in bins.groupby("g"):
        gb = gb.sort_values("b")
        cum = gb["n"].cumsum().to_numpy(np.int64)
        total = smap[g][2]
        targets[g] = {}
        for q in qs:
            k = max(1, math.ceil(q * total))  # quantile_disc rank
            i = int(np.searchsorted(cum, k, side="left"))
            before = int(cum[i - 1]) if i > 0 else 0
            targets[g][q] = (int(gb["b"].iloc[i]), k - before)
    want = {g: {b for b, _ in t.values()} for g, t in targets.items()}
    want_ref = broadcast(want)

    # pass 3: per-(group, value) counts inside candidate bins only
    class CandCount:
        def __init__(self):
            self.smap = ray.get(smap_ref)
            self.want = ray.get(want_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            d = to_cents(df)
            mn = d["g"].map({g: s[0] for g, s in self.smap.items()}).to_numpy(np.int64)
            w = d["g"].map(
                {g: s[1] - s[0] + 1 for g, s in self.smap.items()}
            ).to_numpy(np.int64)
            b = (d["v"].to_numpy(np.int64) - mn) * np.int64(n_bins) // w
            d["b"] = b
            keep = np.fromiter(
                (bb in self.want.get(gg, ()) for gg, bb in zip(d["g"], b)),
                dtype=bool,
                count=len(d),
            )
            return d[keep].groupby(["g", "b", "v"], as_index=False).size().rename(
                columns={"size": "n"}
            )

    def cand_combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["g", "b", "v"], as_index=False).agg(n=("n", "sum"))

    cand = tree_to_pandas(
        scan().map_batches(CandCount, batch_format="pandas", concurrency=(1, 8)),
        cand_combine,
    )

    rows = []
    for g in sorted(targets):
        rec: dict = {"l_returnflag": g, "n_rows": smap[g][2]}
        cg = cand[cand["g"] == g]
        for q in qs:
            b, r = targets[g][q]
            h = cg[cg["b"] == b].sort_values("v")
            cum = h["n"].cumsum().to_numpy(np.int64)
            i = int(np.searchsorted(cum, r, side="left"))
            rec[f"p{int(q * 100)}_cents"] = int(h["v"].iloc[i])
        rows.append(rec)
    out = pd.DataFrame(rows)
    return out.astype(
        {c: np.int64 for c in out.columns if c != "l_returnflag"}
    )


def q_shipmode_priority(sf_dir: str):
    """TPC-H Q12 shape (shipping modes and order priority): for lineitems
    shipped in 1996, count per line-status the lines belonging to
    high-priority orders ('1-URGENT'/'2-HIGH') vs all others. The testdata
    lineitem carries no l_shipmode/commitdate, so l_linestatus stands in
    for the mode axis and l_shipdate for the receipt window — the operator
    shape (fact-fact equi-join + conditional CASE counts) is Q12's.
    Ref semantics: the reference's eval join classifies joined rows by a
    category attribute the same way (SURVEY.md §2.4 J8).

    Scale plan: both facts prune map-side at the read (lineitem to a
    2-column year slice, orders to (orderkey, one int flag) — the priority
    string never rides the shuffle); they meet in the empty-safe hash join
    on orderkey (the Q10/Q21 fact-fact pattern, num_partitions sized to
    the cluster), and reduce via grouped_sums to a 2-row result. No
    driver-side loop, no full materialization."""
    lo = _dt.datetime(1996, 1, 1)
    hi = _dt.datetime(1997, 1, 1)

    li = read(sf_dir, "lineitem", ["l_orderkey", "l_linestatus", "l_shipdate"])

    def prep_li(df: pd.DataFrame) -> pd.DataFrame:
        d = df[(df["l_shipdate"] >= lo) & (df["l_shipdate"] < hi)]
        return pd.DataFrame(
            {
                "l_orderkey": d["l_orderkey"].to_numpy(np.int64),
                "l_linestatus": d["l_linestatus"].astype(str),
            }
        )

    orders = read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def prep_o(df: pd.DataFrame) -> pd.DataFrame:
        pri = df["o_orderpriority"].astype(str)
        hi_flag = pri.isin(["1-URGENT", "2-HIGH"]).to_numpy(np.int64)
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
                "hi": hi_flag,
                "lo": np.int64(1) - hi_flag,
            }
        )

    n_part = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
    j = li.map_batches(prep_li, batch_format="pandas").join(
        orders.map_batches(prep_o, batch_format="pandas"),
        "inner",
        num_partitions=n_part,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    return grouped_sums(
        j,
        ["l_linestatus"],
        sums={"high_line_count": "hi", "low_line_count": "lo"},
    )


def q_user_modal_event(sf_dir: str):
    """Per-user MODAL event type (grouped mode with a deterministic
    tie-break: highest count, then lexicographically smallest type) — the
    survivorship-style categorical reducer (most-frequent-value wins) the
    golden-record family uses, as a standalone grouped aggregate.

    Shuffle shape (the VERDICT-r3-#1 discipline): per-batch (user, type)
    partial counts bound the shuffle at one row per (user, type, batch);
    the combine hash-buckets by USER so all of a user's types co-locate,
    and each bucket runs ONE vectorized groupby-sum + sort +
    drop_duplicates over the whole bucket frame — never a Python-level
    group per user. Type cardinality is dictionary-bounded, so the
    shuffle payload is ~#users x #types ints."""
    ds = read(sf_dir, "events", ["user_id", "event_type"])
    n_buckets = default_buckets()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["user_id", "event_type"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        g["_ub"] = _user_bucket(g["user_id"].to_numpy(np.int64), n_buckets)
        return g

    def bucket_mode(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["user_id", "event_type"], as_index=False)["n"].sum()
        c = c.sort_values(
            ["user_id", "n", "event_type"], ascending=[True, False, True]
        ).drop_duplicates(subset=["user_id"], keep="first")
        return pd.DataFrame(
            {
                "user_id": c["user_id"].to_numpy(np.int64),
                "mode_event": c["event_type"].astype(str),
                "n_events": c["n"].to_numpy(np.int64),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_ub")
        .map_groups(bucket_mode, batch_format="pandas")
    )


def q_grouped_variance(sf_dir: str):
    """Per-group sample variance from exact mergeable moments — the
    algebraic-aggregate class (count / sum / sum-of-squares are the
    textbook mergeable sketch; variance is a closed-form post-expression).
    Demonstrated on l_quantity per l_returnflag.

    Scale shape: ONE ``grouped_sums`` pass carries three exact int64
    moments per (group, batch) — quantities are small integers stored as
    doubles, so n*ss and s*s stay far inside int64 — and the variance is
    formed over the dictionary-bounded group table as a single
    ((n*ss - s*s) / (n*(n-1))) expression of exact integers written
    identically to the oracle SQL (Python arbitrary-precision ints mirror
    DuckDB's HUGEINT intermediates), so the float compares bit-exactly."""
    ds = read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        q = df["l_quantity"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"].astype(str),
                "s": q,
                "ss": q * q,
            }
        )

    m = grouped_sums(
        ds.map_batches(moments, batch_format="pandas"),
        ["l_returnflag"],
        sums={"s": "s", "ss": "ss"},
        count_as="n",
    ).to_pandas()

    var = np.empty(len(m), dtype=np.float64)
    for i, (n, s, ss) in enumerate(zip(m["n"], m["s"], m["ss"])):
        n, s, ss = int(n), int(s), int(ss)
        var[i] = np.float64(n * ss - s * s) / np.float64(n * (n - 1))
    out = pd.DataFrame(
        {
            "l_returnflag": m["l_returnflag"].astype(str),
            "n": m["n"].to_numpy(np.int64),
            "sum_qty": m["s"].to_numpy(np.int64),
            "var_qty": var,
        }
    )
    return ray.data.from_pandas(out)


def q_user_event_path(sf_dir: str):
    """Per-user ordered event path (SQL ``string_agg(event_type, '>'
    ORDER BY ts, event_id)``) — the collect-list/path-analysis window
    class behind funnel mining and session-replay features. Ordering
    spans batches, so unlike the count-style reducers the partial CANNOT
    pre-aggregate; the honest shape is ONE user-bucketed shuffle of the
    slim (user, ts, event_id, type) projection, then one vectorized
    sort + groupby-join per bucket (the sessionize discipline — never a
    Python-level group per user). Path length is bounded by per-user
    event count; a production corpus with unbounded users per bucket
    scales ``n_buckets`` exactly like grouped_sums."""
    ds = read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    n_buckets = default_buckets()

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_ub"] = _user_bucket(df["user_id"].to_numpy(np.int64), n_buckets)
        return df

    def bucket_path(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        agg = g.groupby("user_id", sort=False)["event_type"].agg(
            path=">".join, n_events="size"
        )
        return pd.DataFrame(
            {
                "user_id": agg.index.to_numpy(np.int64),
                "path": agg["path"].to_numpy(object),
                "n_events": agg["n_events"].to_numpy(np.int64),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("_ub")
        .map_groups(bucket_path, batch_format="pandas")
    )


def q_priority_revenue_share(sf_dir: str):
    """Percent-of-total (the ``ratio_to_report`` / ``SUM() OVER ()``
    window class): each order priority's share of total order revenue.
    The grand-total window never needs a global pass over rows — revenue
    collapses to the dictionary-bounded per-priority table via ONE
    ``grouped_sums``, and the total + share form over that table as a
    single exact-int division written identically to the oracle."""
    ds = read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderpriority": df["o_orderpriority"].astype(str),
                "cc": cents(df["o_totalprice"]),
            }
        )

    g = grouped_sums(
        ds.map_batches(partial, batch_format="pandas"),
        ["o_orderpriority"],
        sums={"revenue_ccents": "cc"},
    ).to_pandas()
    total = int(g["revenue_ccents"].sum())
    out = pd.DataFrame(
        {
            "o_orderpriority": g["o_orderpriority"].astype(str),
            "revenue_ccents": g["revenue_ccents"].to_numpy(np.int64),
            "share": g["revenue_ccents"].to_numpy(np.int64).astype(np.float64)
            / np.float64(total),
        }
    )
    return ray.data.from_pandas(out)


def q_event_transitions(sf_dir: str):
    """Event-type transition counts (the Markov-chain / sequence-mining
    primitive: for each consecutive (from, to) pair within a user's
    ts-ordered stream, how often it occurs — SQL ``lead() OVER (PARTITION
    BY user ORDER BY ts)`` + GROUP BY). ONE user-bucketed shuffle of the
    slim (user, ts, event_id, type) projection; each bucket sorts once and
    derives every transition with a vectorized shift + user-boundary mask
    (no per-user Python — the sessionize discipline), emitting
    dictionary-bounded (from, to) partials into a tiny final combine."""
    ds = read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    n_buckets = default_buckets()

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_ub"] = _user_bucket(df["user_id"].to_numpy(np.int64), n_buckets)
        return df

    def bucket_transitions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        t = g["event_type"].to_numpy(object)
        same_user = u[:-1] == u[1:]
        frm = t[:-1][same_user]
        to = t[1:][same_user]
        c = (
            pd.DataFrame({"from_type": frm, "to_type": to})
            .groupby(["from_type", "to_type"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        c["n"] = c["n"].astype(np.int64)
        return c

    partials = (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("_ub")
        .map_groups(bucket_transitions, batch_format="pandas")
    )
    return grouped_sums(partials, ["from_type", "to_type"], sums={"n": "n"})


def q_hourly_distinct_users(sf_dir: str):
    """Distinct users per tumbling hour (COUNT(DISTINCT) inside a window
    — the distinct-aggregation class, NOT expressible as a mergeable sum):
    per-batch (hour, user) dedup bounds the first shuffle at one row per
    distinct pair per batch; a keyed ``grouped_sums`` collapses to the
    exact global distinct set; the second reduction is a bounded count per
    hour. The epoch-hour int64 key discipline of q_hourly_user_activity
    (datetime shuffle keys measured 200x slower there)."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "hour_idx": (
                    df["ts"].astype("datetime64[us]").astype("int64")
                    // (3600 * 10**6)
                ).astype(np.int64),
                "user_id": df["user_id"].to_numpy(np.int64),
            }
        )
        return g.drop_duplicates()

    pairs = grouped_sums(
        read(sf_dir, "events", ["user_id", "ts"])
        .map_batches(prep, batch_format="pandas"),
        ["hour_idx", "user_id"],
        sums={},
        count_as="_dup",
    )
    per_hour = grouped_sums(pairs, ["hour_idx"], sums={}, count_as="n_users")

    def restore(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "hour": (df["hour_idx"].to_numpy(np.int64) * (3600 * 10**6)).astype(
                    "datetime64[us]"
                ),
                "n_users": df["n_users"].to_numpy(np.int64),
            }
        )

    return per_hour.map_batches(restore, batch_format="pandas")


def q_next_event_after_order(sf_dir: str):
    """Forward as-of join: for each order, the FIRST event of the same
    user at/after the order date — the complement of
    q_latest_order_before_event (backward), covering both directions of
    the as-of class. Same co-partitioned shape: both fact tables
    hash-bucket by user in one union shuffle, each bucket runs ONE
    vectorized ``pd.merge_asof(direction='forward')`` over sorted frames;
    orders with no later event drop (inner semantics, mirroring the
    oracle's join)."""
    orders = read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    ev = read(sf_dir, "events", ["user_id", "ts"])
    n_buckets = default_buckets()

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        u = df["o_custkey"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "user_id": u,
                "ts": df["o_orderdate"].astype("datetime64[us]"),
                "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
                "_side": np.zeros(len(df), dtype=np.int8),
                "_ub": _user_bucket(u, n_buckets),
            }
        )

    def tag_events(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "user_id": u,
                "ts": df["ts"].astype("datetime64[us]"),
                "o_orderkey": np.zeros(len(df), dtype=np.int64),
                "_side": np.ones(len(df), dtype=np.int8),
                "_ub": _user_bucket(u, n_buckets),
            }
        )

    both = orders.map_batches(tag_orders, batch_format="pandas").union(
        ev.map_batches(tag_events, batch_format="pandas")
    )

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "o_orderkey": pd.Series([], dtype=np.int64),
                "next_event_ts": pd.Series([], dtype="datetime64[us]"),
            }
        )
        side = g["_side"].to_numpy()
        og = g[side == 0][["user_id", "ts", "o_orderkey"]]
        eg = g[side == 1][["user_id", "ts"]].rename(columns={"ts": "next_event_ts"})
        if not len(og) or not len(eg):
            return empty
        m = pd.merge_asof(
            og.sort_values("ts", kind="mergesort"),
            eg.sort_values("next_event_ts", kind="mergesort"),
            left_on="ts",
            right_on="next_event_ts",
            by="user_id",
            direction="forward",  # first event ts >= order date
        ).dropna(subset=["next_event_ts"])
        return pd.DataFrame(
            {
                "o_orderkey": m["o_orderkey"].to_numpy(np.int64),
                "next_event_ts": m["next_event_ts"].astype("datetime64[us]"),
            }
        )

    return both.groupby("_ub").map_groups(asof, batch_format="pandas")


# --- TPC-H Q9/Q20/Q16 shapes (r4j) -----------------------------------------

def _supplier_nation_refs(sf_dir: str):
    """Broadcast supplier→nationkey arrays + nationkey→name map (the Q5
    dimension-attach pattern, q_local_supplier_volume). Supplier is 10x
    smaller than customer at TPC-H scale and ships ONCE via ray.put; the
    documented fallback above ~100M suppliers is a hash join."""
    supp = read_arrow(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    s_keys = np.sort(supp["s_suppkey"].to_numpy(np.int64))
    s_nat = supp.set_index("s_suppkey").loc[s_keys, "s_nationkey"].to_numpy(np.int64)
    nation = read_arrow(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    name_of = dict(zip(nation["n_nationkey"].astype(int), nation["n_name"]))
    return broadcast((s_keys, s_nat, name_of))


def q_nation_profit(sf_dir: str, token: str = "bolt"):
    """TPC-H Q9 shape (profit by nation and order year, adapted: no
    partsupp table in this schema, so profit = discounted revenue): for
    lineitems of parts whose name contains ``token``, sum revenue grouped
    by the SUPPLIER's nation and the order year.

    Scale plan: the part-name filter reduces part to a key set broadcast
    once (dimension-bounded; the ``semi_anti_filter`` hash-join plan is the
    documented fallback at 10^9 parts); supplier→nation is the same
    broadcast attach as Q5; the only fact-fact exchange is the
    lineitem ⋈ orders hash join, and the final groupby moves one partial
    row per (nation, year) per batch (``grouped_sums``)."""
    part = read_arrow(sf_dir, "part", ["p_partkey", "p_name"]).to_pandas()
    keep = part[part["p_name"].str.contains(token, regex=False)]
    p_ref = broadcast(np.sort(keep["p_partkey"].to_numpy(np.int64)))
    sn_ref = _supplier_nation_refs(sf_dir)

    li = read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    class PrepLi:
        def __init__(self):
            self.p_keys = ray.get(p_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            pk = df["l_partkey"].to_numpy(np.int64)
            if len(self.p_keys):
                pos = np.searchsorted(self.p_keys, pk)
                pos[pos == len(self.p_keys)] = 0
                hit = self.p_keys[pos] == pk
            else:
                hit = np.zeros(len(pk), dtype=bool)
            d = df[hit]
            return pd.DataFrame(
                {
                    "l_orderkey": d["l_orderkey"].to_numpy(np.int64),
                    "l_suppkey": d["l_suppkey"].to_numpy(np.int64),
                    "rev_cc": cents(d["l_extendedprice"])
                    * (100 - cents(d["l_discount"])),
                }
            )

    li_f = li.map_batches(PrepLi, batch_format="pandas", concurrency=(1, 4))

    orders = read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def prep_orders(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
                "o_year": df["o_orderdate"].dt.year.to_numpy(np.int64),
            }
        )

    o_f = orders.map_batches(prep_orders, batch_format="pandas")
    n_part = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
    j = li_f.join(o_f, "inner", num_partitions=n_part,
                  on=("l_orderkey",), right_on=("o_orderkey",))

    class AttachNation:
        def __init__(self):
            self.s_keys, self.s_nat, self.name_of = ray.get(sn_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            sk = df["l_suppkey"].to_numpy(np.int64)
            pos = np.searchsorted(self.s_keys, sk)
            pos[pos == len(self.s_keys)] = 0
            ok = self.s_keys[pos] == sk
            d = df[ok]
            snat = self.s_nat[pos[ok]]
            return pd.DataFrame(
                {
                    "n_name": pd.Series(snat).map(self.name_of).to_numpy(object),
                    "o_year": d["o_year"].to_numpy(np.int64),
                    "rev_cc": d["rev_cc"].to_numpy(np.int64),
                }
            )

    tagged = j.map_batches(AttachNation, batch_format="pandas", concurrency=(1, 4))
    return grouped_sums(tagged, ["n_name", "o_year"], {"profit_ccents": "rev_cc"})


def q_qualified_suppliers(sf_dir: str, token: str = "red", min_qty_cents: int = 30_000):
    """TPC-H Q20 shape (suppliers who shipped a significant volume of the
    filtered parts in 1997; adapted — no partsupp availqty, so the
    qualification is a HAVING on the shipped-quantity sum): suppliers whose
    total 1997 shipped quantity of ``token``-named parts exceeds the
    threshold, with name attached.

    Scale plan: part filter → broadcast key set; date + membership filters
    prune at the map; the shuffle carries one (suppkey, qty) partial per
    batch (``grouped_sums``); the supplier-name attach is the broadcast
    dimension map."""
    part = read_arrow(sf_dir, "part", ["p_partkey", "p_name"]).to_pandas()
    keep = part[part["p_name"].str.contains(token, regex=False)]
    p_ref = broadcast(np.sort(keep["p_partkey"].to_numpy(np.int64)))
    supp = read_arrow(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    name_ref = broadcast(dict(zip(supp["s_suppkey"].astype(int), supp["s_name"])))

    lo = _dt.datetime(1997, 1, 1)
    hi = _dt.datetime(1998, 1, 1)
    li = read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])

    class Prep:
        def __init__(self):
            self.p_keys = ray.get(p_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            d = df[(df["l_shipdate"] >= lo) & (df["l_shipdate"] < hi)]
            pk = d["l_partkey"].to_numpy(np.int64)
            if len(self.p_keys):
                pos = np.searchsorted(self.p_keys, pk)
                pos[pos == len(self.p_keys)] = 0
                hit = self.p_keys[pos] == pk
            else:
                hit = np.zeros(len(pk), dtype=bool)
            d = d[hit]
            return pd.DataFrame(
                {
                    "l_suppkey": d["l_suppkey"].to_numpy(np.int64),
                    "qty_cents": cents(d["l_quantity"]),
                }
            )

    f = li.map_batches(Prep, batch_format="pandas", concurrency=(1, 4))
    sums = grouped_sums(f, ["l_suppkey"], {"total_qty_cents": "qty_cents"})

    class Qualify:
        def __init__(self):
            self.name_of = ray.get(name_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            d = df[df["total_qty_cents"] > min_qty_cents]
            return pd.DataFrame(
                {
                    "s_suppkey": d["l_suppkey"].to_numpy(np.int64),
                    "s_name": pd.Series(d["l_suppkey"]).map(self.name_of).to_numpy(object),
                    "total_qty_cents": d["total_qty_cents"].to_numpy(np.int64),
                }
            )

    return sums.map_batches(Qualify, batch_format="pandas", concurrency=(1, 4))


def q_brand_supplier_counts(sf_dir: str):
    """TPC-H Q16 shape (distinct suppliers per part group; adapted — the
    part↔supplier relation comes from lineitem, there being no partsupp):
    COUNT(DISTINCT l_suppkey) per (p_brand, p_type) for parts not of brand
    'Brand#1'.

    Shuffle shape: per-batch distinct (brand, type, suppkey) triples bound
    the exchange; the combine hash-buckets by (brand, type) so all of a
    group's triples co-locate, then ONE vectorized drop_duplicates +
    groupby-size per bucket (the q_user_event_type_counts discipline — no
    per-group Python dispatch)."""
    part = read_arrow(sf_dir, "part", ["p_partkey", "p_brand", "p_type"]).to_pandas()
    keep = part[part["p_brand"] != "Brand#1"]
    p_keys = np.sort(keep["p_partkey"].to_numpy(np.int64))
    bt = keep.set_index("p_partkey").loc[p_keys]
    p_ref = broadcast(
        (p_keys, bt["p_brand"].to_numpy(object), bt["p_type"].to_numpy(object))
    )
    n_buckets = default_buckets()

    li = read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    class DistinctTriples:
        def __init__(self):
            self.p_keys, self.brand, self.ptype = ray.get(p_ref)

        def __call__(self, df: pd.DataFrame) -> pa.Table:
            pk = df["l_partkey"].to_numpy(np.int64)
            if len(self.p_keys):
                pos = np.searchsorted(self.p_keys, pk)
                pos[pos == len(self.p_keys)] = 0
                hit = self.p_keys[pos] == pk
            else:
                hit = np.zeros(len(pk), dtype=bool)
            g = pd.DataFrame(
                {
                    "p_brand": self.brand[pos[hit]],
                    "p_type": self.ptype[pos[hit]],
                    "supp": df["l_suppkey"].to_numpy(np.int64)[hit],
                }
            ).drop_duplicates()
            h = pd.util.hash_pandas_object(
                g["p_brand"].astype(str) + "|" + g["p_type"].astype(str), index=False
            ).to_numpy()
            g["_kb"] = (h % np.uint64(n_buckets)).astype(np.int64)
            return pa.Table.from_pandas(g, preserve_index=False)

    triples = li.map_batches(DistinctTriples, batch_format="pandas", concurrency=(1, 4))

    def bucket_count(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.drop_duplicates(subset=["p_brand", "p_type", "supp"])
            .groupby(["p_brand", "p_type"], as_index=False)
            .size()
            .rename(columns={"size": "supplier_cnt"})
        )
        out["supplier_cnt"] = out["supplier_cnt"].astype(np.int64)
        return out

    return triples.groupby("_kb").map_groups(bucket_count, batch_format="pandas")


def q_value_histogram(sf_dir: str, n_bins: int = 20):
    """Equi-width histogram of event value cents — the two-pass
    distributed histogram: pass 1 computes global (min, max) from
    per-batch partials (a driver-side fold over one tiny row per batch);
    pass 2 broadcasts the integer bin arithmetic and bincounts each batch,
    with ``grouped_sums`` folding the per-batch partial counts. All
    arithmetic integer: width = ceil((max-min+1)/n_bins) via
    (max-min+n_bins)//n_bins, bin = (v-min)//width — bit-equal to the
    oracle's BIGINT // expressions."""
    ds = read(sf_dir, "events", ["value"])

    def minmax(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"mn": pd.Series([], dtype=np.int64),
                                 "mx": pd.Series([], dtype=np.int64)})
        v = cents(df["value"])
        return pd.DataFrame({"mn": [v.min()], "mx": [v.max()]})

    stats = ds.map_batches(minmax, batch_format="pandas").to_pandas()
    mn = int(stats["mn"].min())
    mx = int(stats["mx"].max())
    width = max(1, (mx - mn + n_bins) // n_bins)

    def binned(df: pd.DataFrame) -> pd.DataFrame:
        v = cents(df["value"])
        b = (v - mn) // width
        cnt = np.bincount(b, minlength=1)
        nz = np.nonzero(cnt)[0]
        return pd.DataFrame(
            {
                "bin": nz.astype(np.int64),
                "lo_cents": (mn + nz * width).astype(np.int64),
                "n_events": cnt[nz].astype(np.int64),
            }
        )

    return grouped_sums(
        ds.map_batches(binned, batch_format="pandas"),
        ["bin", "lo_cents"],
        {"n_events": "n_events"},
    )


def q_late_events(sf_dir: str, tolerance_hours: int = 1):
    """Late-arrival detection (the watermark primitive of §2.9 streaming
    semantics, batch-expressed): an event is LATE if its event time is
    more than ``tolerance_hours`` behind the maximum event time among the
    user's PRIOR arrivals. The fixture's events are perfectly time-
    ordered, so the ARRIVAL sequence is a deterministic hash permutation
    of event_id (the golden-ratio multiplier, wrap-exact in both numpy
    uint64 and the oracle's HUGEINT-mod SQL) — the stand-in for the
    arrival-order column a real stream would carry. This is exactly the
    allowed-lateness test a streaming engine applies before dropping /
    side-outputting a record.

    Shuffle shape: ONE hash-bucketed-by-user exchange; each bucket sorts
    once by (user, arrival_key) and computes the running prior-max with
    cythonized groupby cummax+shift — no per-user Python dispatch (the
    q_rolling_user_value discipline)."""
    ds = read(sf_dir, "events", ["event_id", "user_id", "ts"])
    n_buckets = default_buckets()
    tol = np.timedelta64(tolerance_hours * 3600 * 10**6, "us")

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        ak = (eid.astype(np.uint64) * _PB).astype(np.uint64)
        return pd.DataFrame(
            {
                "event_id": eid,
                "user_id": u,
                "ts": df["ts"].astype("datetime64[us]"),
                "_ak": ak.view(np.int64),  # order-preserving? no — see late()
                "_ub": _user_bucket(u, n_buckets),
            }
        )

    def late(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"event_id": pd.Series([], dtype=np.int64),
                 "user_id": pd.Series([], dtype=np.int64),
                 "lag_us": pd.Series([], dtype=np.int64)}
            )
        # int64 view of the uint64 arrival key does NOT sort like the
        # oracle's HUGEINT — restore unsigned order before sorting
        g = g.assign(_aku=g["_ak"].to_numpy(np.int64).view(np.uint64))
        g = g.sort_values(["user_id", "_aku", "event_id"], kind="mergesort")
        prior_max = g.groupby("user_id")["ts"].cummax().groupby(
            g["user_id"]
        ).shift(1)
        is_late = prior_max.notna() & (
            g["ts"].to_numpy() < (prior_max - tol).to_numpy()
        )
        d = g[is_late.to_numpy()]
        lag = (
            prior_max[is_late.to_numpy()].to_numpy("datetime64[us]")
            - d["ts"].to_numpy("datetime64[us]")
        ).astype("timedelta64[us]").astype(np.int64)
        return pd.DataFrame(
            {
                "event_id": d["event_id"].to_numpy(np.int64),
                "user_id": d["user_id"].to_numpy(np.int64),
                "lag_us": lag,
            }
        )

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("_ub")
        .map_groups(late, batch_format="pandas")
    )


def q_segment_runs(sf_dir: str):
    """Gaps-and-islands (run-length encoding) per user: consecutive
    same-``event_type`` runs in (ts, event_id) order → per-user run count
    and longest run. The classic sessionize-adjacent SQL shape the engine
    must own for behavioural segmentation.

    Shuffle shape: the sessionize discipline — one user-bucketed exchange,
    then per bucket ONE mergesort + boundary-mask cumsum for run ids and
    ONE vectorized bincount/groupby for lengths; no per-user dispatch."""
    ds = read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    n_buckets = default_buckets()

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        out = df[["event_id", "user_id", "ts", "event_type"]].copy()
        out["_ub"] = _user_bucket(u, n_buckets)
        return out

    def runs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype=np.int64),
                 "n_runs": pd.Series([], dtype=np.int64),
                 "max_run_len": pd.Series([], dtype=np.int64)}
            )
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        et = pd.factorize(g["event_type"])[0]
        n = len(g)
        start = np.empty(n, dtype=bool)
        start[0] = True
        start[1:] = (u[1:] != u[:-1]) | (et[1:] != et[:-1])
        run_id = np.cumsum(start) - 1
        run_len = np.bincount(run_id)
        run_user = u[start]
        out = (
            pd.DataFrame({"user_id": run_user, "run_len": run_len})
            .groupby("user_id", as_index=False)
            .agg(n_runs=("run_len", "size"), max_run_len=("run_len", "max"))
        )
        out["n_runs"] = out["n_runs"].astype(np.int64)
        out["max_run_len"] = out["max_run_len"].astype(np.int64)
        return out

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("_ub")
        .map_groups(runs, batch_format="pandas")
    )


def q_audience_overlap(sf_dir: str):
    """Audience-overlap matrix: for every unordered pair of event types,
    the number of users active in BOTH — the co-occurrence/segment-
    intersection query of audience analytics (bitmap-index AND at the
    warehouse layer).

    Scale shape: per-batch distinct (user, type) bounds the exchange; the
    combine hash-buckets by USER so each user's type set co-locates, and
    each bucket emits the user's C(k,2) type pairs VECTORIZED (per-user
    degree ≤ |event types|, a dictionary-bounded constant — the safe side
    of bipartite projection; the hot side would be projecting over types).
    A final ``grouped_sums`` folds pair counts."""
    ds = read(sf_dir, "events", ["user_id", "event_type"])
    n_buckets = default_buckets()

    def distinct_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates().copy()
        g["_ub"] = _user_bucket(g["user_id"].to_numpy(np.int64), n_buckets)
        return g

    def project(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["user_id", "event_type"])
        g = g.sort_values(["user_id", "event_type"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        t = g["event_type"].to_numpy(object)
        n = len(g)
        if n == 0:
            return pd.DataFrame({"type_a": pd.Series([], dtype=object),
                                 "type_b": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64)})
        idx = np.arange(n, dtype=np.int64)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = u[1:] != u[:-1]
        seg_start = np.maximum.accumulate(np.where(new, idx, 0))
        a_parts: list = []
        b_parts: list = []
        # per-user triu over sorted type lists; degree is bounded by the
        # event-type dictionary, so this inner loop is O(users x k^2)
        starts = idx[new]
        ends = np.append(starts[1:], n)
        for s0, e0 in zip(starts, ends):
            d = e0 - s0
            if d >= 2:
                ia, ib = np.triu_indices(d, k=1)
                a_parts.append(t[s0:e0][ia])
                b_parts.append(t[s0:e0][ib])
        a = np.concatenate(a_parts) if a_parts else np.array([], dtype=object)
        b = np.concatenate(b_parts) if b_parts else np.array([], dtype=object)
        return pd.DataFrame(
            {"type_a": a, "type_b": b, "n": np.ones(len(a), dtype=np.int64)}
        )

    contrib = (
        ds.map_batches(distinct_pairs, batch_format="pandas")
        .groupby("_ub")
        .map_groups(project, batch_format="pandas")
    )
    return grouped_sums(contrib, ["type_a", "type_b"], {"n_common_users": "n"})


def q_value_outliers(sf_dir: str):
    """Grouped z-score outliers, EXACT: events whose value sits more than
    3 population standard deviations from their event_type's mean. The
    float-free contract: |n·v − sum| > isqrt(9·(n·sumsq − sum²)) — the
    squared form the oracle evaluates in HUGEINT — so no float mean/σ
    ever crosses a boundary and results are identical at any batch
    layout.

    Two-pass shape: pass 1 folds per-batch (n, Σv, Σv²) partials per type
    (``grouped_sums``; the moments discipline of q_grouped_variance);
    the driver derives each type's integer threshold with PYTHON BIG INTS
    (9·n·sumsq overflows int64 at ~10⁹ rows/group — bounded driver math,
    one row per type); pass 2 broadcasts {type: (n, sum, t)} and filters
    each batch with vectorized int64 compares."""
    import math

    ds = read(sf_dir, "events", ["event_id", "event_type", "value"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        v = cents(df["value"])
        return pd.DataFrame(
            {
                "event_type": df["event_type"].astype(str),
                "v": v,
                "v2": v * v,
            }
        )

    stats = grouped_sums(
        ds.map_batches(prep, batch_format="pandas"),
        ["event_type"],
        {"s": "v", "ss": "v2"},
        count_as="n",
    ).to_pandas()
    thresholds = {}
    for r in stats.itertuples(index=False):
        n, s_, ss = int(r.n), int(r.s), int(r.ss)
        t = math.isqrt(max(9 * (n * ss - s_ * s_), 0))
        thresholds[str(r.event_type)] = (n, s_, t)
    ref = broadcast(thresholds)

    class Filter:
        def __init__(self):
            self.th = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            et = df["event_type"].astype(str)
            v = cents(df["value"])
            n = et.map({k: x[0] for k, x in self.th.items()}).to_numpy(np.int64)
            s_ = et.map({k: x[1] for k, x in self.th.items()}).to_numpy(np.int64)
            t = et.map({k: x[2] for k, x in self.th.items()}).to_numpy(np.int64)
            keep = np.abs(n * v - s_) > t
            d = df[keep]
            return pd.DataFrame(
                {
                    "event_id": d["event_id"].to_numpy(np.int64),
                    "event_type": d["event_type"].astype(str),
                    "value_cents": v[keep],
                }
            )

    return ds.map_batches(Filter, batch_format="pandas", concurrency=(1, 4))


def q_user_first_last(sf_dir: str):
    """First AND last event per user in one pass, plus the value delta —
    the symmetric mergeable pair of ``q_first_event_per_user``
    (arg-min/arg-max by (ts, event_id) are both MERGEABLE aggregates, so
    one shuffle carries two slim rows per user per batch and the combine
    is the same vectorized sort + head/tail per user bucket)."""
    ds = read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"])
    n_buckets = default_buckets()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "ts": df["ts"].astype("datetime64[us]"),
                "event_id": df["event_id"].to_numpy(np.int64),
                "event_type": df["event_type"].astype(str),
                "v": cents(df["value"]),
            }
        ).sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        first = d.drop_duplicates(subset=["user_id"], keep="first")
        last = d.drop_duplicates(subset=["user_id"], keep="last")
        out = pd.concat([first, last], ignore_index=True)
        out["_ub"] = _user_bucket(out["user_id"].to_numpy(np.int64), n_buckets)
        return out

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        first = g.drop_duplicates(subset=["user_id"], keep="first").set_index(
            "user_id"
        )
        last = g.drop_duplicates(subset=["user_id"], keep="last").set_index(
            "user_id"
        )
        users = first.index.to_numpy(np.int64)
        return pd.DataFrame(
            {
                "user_id": users,
                "first_type": first["event_type"].to_numpy(object),
                "last_type": last["event_type"].to_numpy(object),
                "value_delta_cents": (
                    last["v"].to_numpy(np.int64) - first["v"].to_numpy(np.int64)
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_ub")
        .map_groups(combine, batch_format="pandas")
    )


def q_top2_gap(sf_dir: str):
    """Runner-up gap per group: the difference between the highest and
    second-highest event value in each event_type — the argmax-confidence
    margin (a two-element mergeable partial: each batch ships its local
    top-2 per group, the combine re-top-2s — the bounded generalization
    of MAX)."""
    ds = read(sf_dir, "events", ["event_type", "value"])

    def top2(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {"event_type": df["event_type"].astype(str), "v": cents(df["value"])}
        )
        d = d.sort_values(["event_type", "v"], ascending=[True, False],
                          kind="mergesort")
        return d.groupby("event_type", as_index=False).head(2)

    partial = ds.map_batches(top2, batch_format="pandas")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("v", ascending=False, kind="mergesort").head(2)
        v = g["v"].to_numpy(np.int64)
        gap = v[0] - v[1] if len(v) >= 2 else np.int64(0)
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "top_cents": np.array([v[0]], dtype=np.int64),
                "gap_cents": np.array([gap], dtype=np.int64),
            }
        )

    return partial.groupby("event_type").map_groups(final, batch_format="pandas")


def q_order_latency(sf_dir: str):
    """Order-fulfilment latency: days from order date to the LAST shipment
    of any of its lineitems — the grouped-max-over-join latency metric
    (one fact-fact hash join on the shared key, then ``grouped_sums``-
    shaped max partials; the max is taken per batch first so the shuffle
    carries one row per order per batch)."""
    orders = read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    li = read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    n_buckets = default_buckets()

    def li_prep(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
                "ship_us": df["l_shipdate"].astype("datetime64[us]").astype(np.int64),
            }
        )
        out = g.groupby("l_orderkey", as_index=False)["ship_us"].max()
        out["_ob"] = _user_bucket(out["l_orderkey"].to_numpy(np.int64), n_buckets)
        return out

    def li_combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("l_orderkey", as_index=False)["ship_us"].max()

    last_ship = (
        li.map_batches(li_prep, batch_format="pandas")
        .groupby("_ob")
        .map_groups(li_combine, batch_format="pandas")
    )
    n_part = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
    j = orders.join(last_ship, "inner", num_partitions=n_part,
                    on=("o_orderkey",), right_on=("l_orderkey",))

    def days(df: pd.DataFrame) -> pd.DataFrame:
        od = df["o_orderdate"].astype("datetime64[us]").astype(np.int64)
        us_per_day = 86_400 * 10**6
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
                "fill_days": (df["ship_us"].to_numpy(np.int64) - od)
                // us_per_day,
            }
        )

    return j.map_batches(days, batch_format="pandas")


def q_hourly_delta(sf_dir: str):
    """Derivative of an aggregated time series: total event value per
    hour plus the cent delta vs the previous PRESENT hour — the
    aggregate-then-window composition (the window runs over the BOUNDED
    aggregated series, never the fact rows; lag() on partials is free
    once the grouped_sums pass has collapsed the input)."""
    ds = read(sf_dir, "events", ["ts", "value"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "hour_idx": df["ts"].astype("datetime64[us]").astype(np.int64)
                // (3600 * 10**6),
                "v": cents(df["value"]),
            }
        )

    sums = grouped_sums(
        ds.map_batches(prep, batch_format="pandas"), ["hour_idx"], {"sum_cents": "v"}
    ).to_pandas()  # bounded by distinct hours
    sums = sums.sort_values("hour_idx")
    hrs = sums["hour_idx"].to_numpy(np.int64)
    v = sums["sum_cents"].to_numpy(np.int64)
    delta = np.zeros(len(v), dtype=np.int64)
    delta[1:] = v[1:] - v[:-1]
    out = pd.DataFrame(
        {
            "hour": (hrs * (3600 * 10**6)).astype("datetime64[us]"),
            "sum_cents": v,
            "delta_cents": delta,
        }
    )
    out = out.iloc[1:]  # the first hour has no predecessor (oracle WHERE)
    import ray.data as rd

    return rd.from_pandas(out)


# --- SCD current view (warehouse latest-state class) ------------------------

def q_latest_user_state(sf_dir: str):
    """Current-state view of a mutable entity from its event history — the
    SCD-Type-2 endpoint query: for every (user_id, event_type) attribute
    the value/ts/event_id of the LATEST event (deterministic tiebreak:
    max ts, then max event_id). This is how a warehouse reconstructs "the
    record as of now" from an append-only change log (reference-semantics
    cousin: the keep-latest arm of priority dedup, SURVEY.md D6 /
    `1st Place/src/mimic_dev_main.py` drop_duplicates(keep=...) family).

    Shuffle shape: the `q_first_event_per_user` discipline mirrored to
    keep="last" on a composite key — per-batch map-side latest bounds the
    shuffle at one row per ((user, type), batch); the combine hash-buckets
    by USER (co-locating all of a user's attributes), ONE vectorized
    sort + drop_duplicates per bucket. No per-group Python, no driver
    materialization; output is attribute-cardinality-bounded, not
    event-bounded."""
    ds = read(sf_dir, "events",
              ["event_id", "user_id", "event_type", "ts", "value"])
    n_buckets = default_buckets()

    def batch_latest(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.sort_values(["ts", "event_id"])
            .drop_duplicates(subset=["user_id", "event_type"], keep="last")
            .copy()
        )
        g["_ub"] = _user_bucket(g["user_id"].to_numpy(np.int64), n_buckets)
        return g

    def bucket_latest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"]).drop_duplicates(
            subset=["user_id", "event_type"], keep="last"
        )
        return pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(np.int64),
                "event_type": g["event_type"].to_numpy(),
                "ts": g["ts"].to_numpy(),
                "event_id": g["event_id"].to_numpy(np.int64),
                "value": g["value"].to_numpy(np.float64),
            }
        )

    return (
        ds.map_batches(batch_latest, batch_format="pandas")
        .groupby("_ub")
        .map_groups(bucket_latest, batch_format="pandas")
    )


# --- grouped Pearson correlation (exact-sums single-expression class) -------

def q_grouped_corr(sf_dir: str):
    """Per-group Pearson correlation of two measures (quantity vs discount
    cents per l_returnflag) — the feature-screening statistic, computed the
    only way a distributed engine should: five EXACT integer moment sums
    per group (the `grouped_variance` discipline extended to the cross
    moment), then ONE identical final float expression on the driver-
    bounded group table. No float rides the shuffle, so block order can
    never change a bit of the answer.

    Bit-equality contract with the SQL oracle: n/sx/sy/sxx/syy/sxy are
    exact ints on both sides (DuckDB SUM(BIGINT) is exact HUGEINT; Python
    ints are unbounded), and the final expression
    ``CAST(num AS DOUBLE) / sqrt(CAST(d1 AS DOUBLE) * CAST(d2 AS DOUBLE))``
    is the same three IEEE ops (two correctly-rounded casts feed one
    multiply, one correctly-rounded sqrt, one divide) evaluated here as
    ``float(num) / math.sqrt(float(d1) * float(d2))``."""
    import math

    ds = read(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_discount"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        x = df["l_quantity"].to_numpy(np.float64).astype(np.int64)
        y = cents(df["l_discount"])
        return pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"],
                "x": x,
                "y": y,
                "xx": x * x,
                "yy": y * y,
                "xy": x * y,
            }
        )

    sums = grouped_sums(
        ds.map_batches(prep, batch_format="pandas"),
        ["l_returnflag"],
        sums={"sx": "x", "sy": "y", "sxx": "xx", "syy": "yy", "sxy": "xy"},
        count_as="n",
    ).to_pandas()  # bounded: one row per distinct return flag

    rows = []
    for _, r in sums.iterrows():
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        sxx, syy, sxy = int(r["sxx"]), int(r["syy"]), int(r["sxy"])
        num = n * sxy - sx * sy
        d1 = n * sxx - sx * sx
        d2 = n * syy - sy * sy
        corr = (
            float(num) / math.sqrt(float(d1) * float(d2))
            if d1 > 0 and d2 > 0
            else 0.0
        )
        rows.append((r["l_returnflag"], np.int64(n), corr))
    out = pd.DataFrame(rows, columns=["l_returnflag", "n", "corr_qd"])
    out = out.sort_values("l_returnflag").reset_index(drop=True)
    import ray.data as rd

    return rd.from_pandas(out)


# --- order-independent table checksum (migration-validation class) ----------

def q_table_checksum(sf_dir: str):
    """Anti-entropy fingerprint of a fact table: an ORDER-INDEPENDENT
    checksum (sum of a per-row integer hash, mod 1e9+7) plus the row
    count — the cheap both-sides validation a 100-TB migration or a
    checkpoint-resume run uses to prove "same rows" without sorting or
    shuffling anything (commutative aggregation ⇒ block order, partition
    count and retry history cannot change it).

    Per-row term: the family integer mixer over (orderkey, linenumber,
    quantity) — ((k % 1000003) * 2654435761 + ln * 97 + qty * 131) mod
    1e9+7, every intermediate < 2^63 by construction. Shuffle shape: one
    map_batches emits a single int64 partial per batch (term sums taken
    mod 1e9+7 per batch, so partial sums stay < 2^63 for ~9e9 batches);
    the combine is a 1-row grouped sum. Nothing scales with the table but
    the read."""
    ds = read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"])
    MOD = np.int64(1_000_000_007)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = df["l_orderkey"].to_numpy(np.int64)
        ln = df["l_linenumber"].to_numpy(np.int32).astype(np.int64)
        q = df["l_quantity"].to_numpy(np.float64).astype(np.int64)
        term = ((k % 1000003) * 2654435761 + ln * 97 + q * 131) % MOD
        return pd.DataFrame(
            {
                "_one": np.array([0], dtype=np.int64),
                "s": np.array([int(term.sum() % MOD)], dtype=np.int64),
                "n": np.array([len(df)], dtype=np.int64),
            }
        )

    sums = grouped_sums(
        ds.map_batches(partial, batch_format="pandas"),
        ["_one"],
        sums={"s": "s", "n_rows": "n"},
    ).to_pandas()  # exactly one row
    out = pd.DataFrame(
        {
            "n_rows": sums["n_rows"].astype(np.int64),
            "checksum": (sums["s"] % MOD).astype(np.int64),
        }
    )
    import ray.data as rd

    return rd.from_pandas(out)


# --- referential-integrity audit (migration-validation class) ---------------

def q_fk_audit(sf_dir: str):
    """Foreign-key orphan audit across the star schema: for each child→
    parent edge, the child row count and the number of rows whose FK has
    no matching parent key — `q_table_checksum`'s companion in the
    migration-validation kit (checksum proves "same rows", this proves
    "joinable rows"; both run before anyone trusts a copied corpus).

    Scale shape per edge: the parent key set is computed DISTRIBUTIVELY
    (`distinct_column`) and applied by `semi_anti_filter`'s documented
    broadcast/hash-join dual plan — nothing driver-resident beyond the
    measured distinct count; the orphan count is a streaming count() of
    the anti side. Output is bounded: one row per audited edge."""
    edges = [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
    ]
    rows = []
    for child, fk, parent, pk in edges:
        ch = read(sf_dir, child, [fk])
        if child == "customer":  # int32 nationkey: widen for the key compare
            ch = ch.map_batches(
                lambda df, c=fk: pd.DataFrame({c: df[c].astype(np.int64)}),
                batch_format="pandas",
            )
        pr = read(sf_dir, parent, [pk]).map_batches(
            lambda df, c=pk, f=fk: pd.DataFrame(
                {f: df[c].astype(np.int64)}
            ),
            batch_format="pandas",
        )
        n_rows = ch.count()
        n_orphans = semi_anti_filter(ch, fk, pr, fk, anti=True).count()
        rows.append((child, fk, np.int64(n_rows), np.int64(n_orphans)))
    out = pd.DataFrame(
        rows, columns=["child_table", "fk_col", "n_rows", "n_orphans"]
    )
    import ray.data as rd

    return rd.from_pandas(out)


# --- time-weighted average (streaming-shaped) --------------------------------

def q_twa_user_value(sf_dir: str):
    """Time-weighted average of each user's event value (the metric-rollup
    a monitoring/billing pipeline computes over irregular event streams:
    each value is held until the NEXT event, so it contributes for its
    holding interval, not once per row).

    Per user, ordered by (ts, event_id): with per-gap whole-second
    durations gap_i = (ts_{i+1} - ts_i) in us // 1_000_000,

      weighted_cents = sum_i v_i * gap_i
      span_s         = sum_i gap_i
      twa_cents      = weighted_cents / span_s   (one float64 division)

    Users whose events all share one second (span_s = 0) are dropped —
    the oracle's NULL-division row.

    Shuffle shape: the sessionize/rolling contract — ONE hash-bucketed-by-
    user shuffle (`default_buckets()`), each bucket sorts its whole frame
    once and reduces every user with np.add.reduceat at run boundaries.
    No per-user dispatch; int64 products bounded (cents * whole-second
    gaps * run length << 2^63 for any plausible retention window)."""
    ds = read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    n_buckets = default_buckets()

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "user_id": u,
                "tus": df["ts"].astype("datetime64[us]").astype(np.int64),
                "v": cents(df["value"]),
                "_ub": _user_bucket(u, n_buckets),
            }
        )

    def twa(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "user_id": pd.Series([], dtype=np.int64),
                "n_events": pd.Series([], dtype=np.int64),
                "span_s": pd.Series([], dtype=np.int64),
                "weighted_cents": pd.Series([], dtype=np.int64),
                "twa_cents": pd.Series([], dtype=np.float64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(["user_id", "tus", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        tus = g["tus"].to_numpy(np.int64)
        n = len(g)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], n]
        # per-gap whole seconds; the last row of each run holds no gap
        gap = np.zeros(n, dtype=np.int64)
        if n > 1:
            gap[:-1] = np.where(
                u[1:] == u[:-1], (tus[1:] - tus[:-1]) // 1_000_000, 0
            )
        csg = np.concatenate(([0], np.cumsum(gap)))
        csw = np.concatenate(([0], np.cumsum(v * gap)))
        span = (csg[ends] - csg[starts]).astype(np.int64)
        weighted = (csw[ends] - csw[starts]).astype(np.int64)
        keep = span > 0
        if not keep.any():
            return empty
        return pd.DataFrame(
            {
                "user_id": u[starts][keep],
                "n_events": (ends - starts).astype(np.int64)[keep],
                "span_s": span[keep],
                "weighted_cents": weighted[keep],
                "twa_cents": weighted[keep].astype(np.float64) / span[keep],
            }
        )

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("_ub")
        .map_groups(twa, batch_format="pandas")
    )


# --- per-column profiling (migration-validation kit, with fk_audit) ----------

def q_profile_columns(sf_dir: str):
    """Column-level data profile of the orders table — per column: row
    count, null count, exact distinct count, min and max (as VARCHAR so
    one schema carries int and string columns). The third leg of the
    migration-validation kit (`table_checksum` = same rows, `fk_audit` =
    joinable rows, this = same value distributions).

    Scale shape per column: n_distinct via `distinct_column` (hash-
    partitioned distinct combine — the only shuffle); nulls/min/max as
    per-batch one-row partials reduced driver-side (`tree_to_pandas`
    bounds the collect at one row per block). Output: one row per audited
    column."""
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    ds = read(sf_dir, "orders", cols)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # ONE wide typed row per batch: native-typed min/max per column
        # (stringifying here would make the cross-batch reduce
        # lexicographic — wrong for ints)
        rec: dict = {}
        for c in cols:
            s = df[c]
            sv = s.dropna()
            rec[f"n_{c}"] = [np.int64(len(s))]
            rec[f"null_{c}"] = [np.int64(s.isna().sum())]
            rec[f"min_{c}"] = [sv.min() if len(sv) else None]
            rec[f"max_{c}"] = [sv.max() if len(sv) else None]
        return pd.DataFrame(rec)

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        if len(p) == 0:
            return p
        rec: dict = {}
        for c in cols:
            rec[f"n_{c}"] = [np.int64(p[f"n_{c}"].sum())]
            rec[f"null_{c}"] = [np.int64(p[f"null_{c}"].sum())]
            mn = p[f"min_{c}"].dropna()
            mx = p[f"max_{c}"].dropna()
            rec[f"min_{c}"] = [mn.min() if len(mn) else None]
            rec[f"max_{c}"] = [mx.max() if len(mx) else None]
        return pd.DataFrame(rec)

    parts = tree_to_pandas(
        ds.map_batches(partial, batch_format="pandas"), combine
    )
    rows = []
    for c in cols:
        mins = parts[f"min_{c}"].dropna()
        maxs = parts[f"max_{c}"].dropna()
        # distinct over the single column; dropna mirrors COUNT(DISTINCT)
        dc = distinct_column(
            read(sf_dir, "orders", [c]).map_batches(
                lambda df, c=c: df.dropna(subset=[c]), batch_format="pandas"
            ),
            c,
        ).count()
        rows.append(
            (
                c,
                np.int64(parts[f"n_{c}"].sum()),
                np.int64(parts[f"null_{c}"].sum()),
                np.int64(dc),
                str(mins.min()) if len(mins) else None,
                str(maxs.max()) if len(maxs) else None,
            )
        )
    out = pd.DataFrame(
        rows,
        columns=["col", "n_rows", "n_null", "n_distinct", "min_v", "max_v"],
    )
    import ray.data as rd

    return rd.from_pandas(out)


# --- universal quantification (ALL-quantifier relational shape) ---------------

def q_fully_returned_orders(sf_dir: str):
    """Orders whose lineitems were ALL returned (l_returnflag = 'R'),
    counted per order status — the universal-quantifier (relational
    division) shape: EXISTS filters are everywhere in the registry
    (Q4 et al.); this is the FORALL dual, decided by the count identity
    n_lineitems == n_returned (no NOT EXISTS double-negation anywhere
    near the data).

    Scale shape: one `grouped_sums` pass over two slim lineitem columns
    (count + flag-sum per orderkey), a vectorized equality filter on the
    bounded per-order aggregate, then `semi_anti_filter`'s dual-plan semi
    join against orders and one tiny grouped count. No row of either fact
    table is ever driver-resident."""
    li = read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"])

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
                "ret": (df["l_returnflag"].astype(str) == "R").to_numpy(
                    np.int64
                ),
            }
        )

    per_order = grouped_sums(
        li.map_batches(flag, batch_format="pandas"),
        ["l_orderkey"],
        sums={"n_ret": "ret"},
        count_as="n",
    )
    all_ret = per_order.map_batches(
        lambda df: df[df["n"] == df["n_ret"]][["l_orderkey"]],
        batch_format="pandas",
    )
    orders = read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    hit = semi_anti_filter(orders, "o_orderkey", all_ret, "l_orderkey")
    return grouped_sums(hit, ["o_orderstatus"], sums={}, count_as="n_orders")


# --- 2-D skyline (Pareto frontier) --------------------------------------------

def q_pareto_orders(sf_dir: str):
    """Pareto-optimal orders on (total price MAX, order date MIN) — the
    skyline operator (Börzsönyi ICDE'01): an order survives iff no other
    order has price >= AND date <= with at least one strict. The
    standard product-search / quality-vs-age frontier query.

    Distributed 2-D skyline: the frontier is fully determined by the
    per-DATE maximum price (date cardinality is dictionary-bounded —
    ~2.5k days per retention decade — so the aggregate is tiny at any
    corpus size). One `grouped_sums`-shaped max-per-date pass, a
    driver-side running-max sweep over the sorted date axis (bounded
    rows), then a broadcast (date, price) frontier-point filter back over
    orders — survivors are exactly the rows equal to a frontier point
    (same-date same-price ties all survive: neither dominates).

    price is exact integer cents; no float is compared anywhere."""
    ds = read(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderdate"])

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
                "d": df["o_orderdate"].astype("datetime64[us]").astype(np.int64),
                "p": cents(df["o_totalprice"]),
            }
        )

    slimmed = ds.map_batches(slim, batch_format="pandas")

    def pmax_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("d", as_index=False)["p"].max()
        return g.rename(columns={"p": "pmax"})

    def pmax_combine(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        return df.groupby("d", as_index=False)["pmax"].max()

    per_date = tree_to_pandas(
        slimmed.map_batches(pmax_partial, batch_format="pandas"), pmax_combine
    )
    per_date = per_date.sort_values("d").reset_index(drop=True)
    pm = per_date["pmax"].to_numpy(np.int64)
    # frontier: strictly above the running max of all EARLIER dates
    prev = np.concatenate(([np.iinfo(np.int64).min],
                           np.maximum.accumulate(pm)[:-1]))
    front = per_date[pm > prev]
    # frontier dates are unique and sorted: membership = one searchsorted
    fref = broadcast(
        (front["d"].to_numpy(np.int64), front["pmax"].to_numpy(np.int64))
    )

    def keep_frontier(df: pd.DataFrame) -> pd.DataFrame:
        fd, fp = ray.get(fref)
        d = df["d"].to_numpy(np.int64)
        p = df["p"].to_numpy(np.int64)
        ix = np.searchsorted(fd, d)
        ix_c = np.minimum(ix, len(fd) - 1) if len(fd) else ix
        m = (
            (fd[ix_c] == d) & (fp[ix_c] == p)
            if len(fd)
            else np.zeros(len(df), dtype=bool)
        )
        out = df[m] if len(df) else df
        return pd.DataFrame(
            {
                "o_orderkey": out["o_orderkey"].to_numpy(np.int64),
                "o_orderdate": out["d"].to_numpy(np.int64).astype(
                    "datetime64[us]"
                ),
                "price_cents": out["p"].to_numpy(np.int64),
            }
        )

    return slimmed.map_batches(keep_frontier, batch_format="pandas")


def q_mad_outliers(sf_dir: str):
    """Robust grouped outliers via MEDIAN ABSOLUTE DEVIATION — the
    data-quality complement to ``q_value_outliers``' z-score: events whose
    value sits more than 3 MADs from their event_type's median.  Unlike
    mean/σ, the median/MAD pair is not dragged by the outliers themselves
    (breakdown point 50%), which is why profiling systems prefer it.
    Everything is exact integer cents: med and mad are lower medians
    (``percentile_disc(0.5)``, the ceil-walk of ``q_grouped_median``) and
    the outlier test ``|v − med| > 3·mad`` is an int64 compare — no float
    crosses the oracle boundary.

    Three slim passes, all distinct-value-bounded:
      1. (event_type, value) count histogram → per-type median walk
         (``grouped_sums`` + bounded per-group walk inside the cluster);
      2. broadcast {type: med}; (event_type, |v−med|) histogram → per-type
         MAD walk;
      3. broadcast {type: (med, mad)}; vectorized int64 filter per batch.
    The shuffles carry one row per distinct (group, value) per batch —
    never raw events — and the broadcast maps are group-cardinality-
    bounded."""
    ds = read(sf_dir, "events", ["event_id", "event_type", "value"])

    def value_hist(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"event_type": df["event_type"], "v": cents(df["value"])}
        )
        g = out.groupby(["event_type", "v"], as_index=False, sort=False).size()
        return g.rename(columns={"size": "n"})

    def walk(hist: rd.Dataset, out_col: str) -> pd.DataFrame:
        def one(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values("v")
            cum = g["n"].cumsum().to_numpy()
            total = int(cum[-1])
            k = max(1, -(-total // 2))  # ceil(p*n): percentile_disc(0.5)
            idx = int(np.searchsorted(cum, k, side="left"))
            return pd.DataFrame(
                {
                    "event_type": [g["event_type"].iloc[0]],
                    out_col: np.array([g["v"].iloc[idx]], dtype=np.int64),
                }
            )

        return (
            hist.groupby("event_type")
            .map_groups(one, batch_format="pandas")
            .to_pandas()  # one row per event_type — group-bounded
        )

    med = walk(
        grouped_sums(
            ds.map_batches(value_hist, batch_format="pandas"),
            ["event_type", "v"],
            sums={"n": "n"},
        ),
        "med",
    )
    med_ref = broadcast(med.set_index("event_type")["med"])

    class DevHist:
        def __init__(self):
            self.med = ray.get(med_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            v = cents(df["value"])
            m = df["event_type"].map(self.med).to_numpy(np.int64)
            out = pd.DataFrame(
                {"event_type": df["event_type"], "v": np.abs(v - m)}
            )
            g = out.groupby(
                ["event_type", "v"], as_index=False, sort=False
            ).size()
            return g.rename(columns={"size": "n"})

    mad = walk(
        grouped_sums(
            ds.map_batches(DevHist, batch_format="pandas",
                           concurrency=(1, 8)),
            ["event_type", "v"],
            sums={"n": "n"},
        ),
        "mad",
    )
    both = med.merge(mad, on="event_type")
    both_ref = broadcast(
        {
            str(r.event_type): (int(r.med), int(r.mad))
            for r in both.itertuples(index=False)
        }
    )

    class Filter:
        def __init__(self):
            self.th = ray.get(both_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            et = df["event_type"].astype(str)
            v = cents(df["value"])
            m = et.map({k: x[0] for k, x in self.th.items()}).to_numpy(np.int64)
            d = et.map({k: x[1] for k, x in self.th.items()}).to_numpy(np.int64)
            keep = np.abs(v - m) > 3 * d
            o = df[keep]
            return pd.DataFrame(
                {
                    "event_id": o["event_id"].to_numpy(np.int64),
                    "event_type": o["event_type"].astype(str),
                    "value_cents": v[keep],
                    "med_cents": m[keep],
                    "mad_cents": d[keep],
                }
            )

    return ds.map_batches(Filter, batch_format="pandas", concurrency=(1, 8))


def q_near_events(sf_dir: str, window_s: int = 3600,
                  n_buckets: int | None = None):
    """Banded range self-join: pairs of events by the SAME user whose
    timestamps differ by 0 < Δ ≤ ``window_s`` — the co-occurrence /
    near-duplicate-activity join class (fraud rings, bot bursts,
    session stitching) that equality joins cannot express.  Output
    (user_id, event_id_a, event_id_b, gap_us) with a = the earlier event.

    Distribution: ONE hash-bucketed shuffle keyed by user (the
    sessionize/as-of co-partitioning) carrying slim (user, ts, id) rows;
    each bucket sorts once by (user, ts) and enumerates windows
    vectorized — per row the window end is a single ``searchsorted``
    against the bucket's time array clipped to the user segment, and the
    pair lists materialize by repeat/arange, never a Python loop.  Work
    is O(rows·log + pairs); output volume is data-dependent (burst
    density × window) — the honest cost of a range join — and the window
    parameter is the knob that bounds it."""
    if n_buckets is None:
        n_buckets = default_buckets()
    w_us = np.int64(window_s) * 1_000_000
    ds = read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        u = df["ts"].astype("datetime64[us]").astype("int64")
        out = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "u": u,
                "event_id": df["event_id"].to_numpy(np.int64),
            }
        )
        out["_ub"] = (
            out["user_id"].to_numpy(np.uint64)
            * np.uint64(0x9E3779B97F4A7C15)
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return out

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "u", "event_id"])
        uid = g["user_id"].to_numpy(np.int64)
        u = g["u"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        n = len(g)
        if n < 2:
            return pd.DataFrame(
                {
                    "user_id": np.empty(0, np.int64),
                    "event_id_a": np.empty(0, np.int64),
                    "event_id_b": np.empty(0, np.int64),
                    "gap_us": np.empty(0, np.int64),
                }
            )
        # user segment ends for each row
        seg_start = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        seg_end = np.r_[seg_start[1:], n]
        row_end = np.repeat(seg_end, np.diff(np.r_[seg_start, n]))
        # window end: first j past the last u[j] <= u[i] + w WITHIN the
        # row's user segment. ``u`` is sorted per segment, not globally,
        # so a plain searchsorted is wrong; this is a VECTORIZED binary
        # search with per-row bounds [i, row_end) — ~log2(rows) passes of
        # O(rows) numpy, no per-user Python or Ray dispatch.
        idx = np.arange(n, dtype=np.int64)
        target = u + w_us
        lo = idx + 1
        hi_b = row_end.copy()
        while True:
            active = lo < hi_b
            if not active.any():
                break
            mid = (lo + hi_b) // 2
            go_right = active & (u[np.minimum(mid, n - 1)] <= target)
            lo = np.where(go_right, mid + 1, lo)
            hi_b = np.where(active & ~go_right, mid, hi_b)
        hi = lo
        cnt = hi - idx - 1
        cnt = np.maximum(cnt, 0)
        total = int(cnt.sum())
        ia = np.repeat(idx, cnt)
        # ib = ia + 1 .. hi-1, built without Python loops
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(cnt, out=offs[1:])
        ib = (np.arange(total, dtype=np.int64) - offs[ia]) + ia + 1
        gap = u[ib] - u[ia]
        keep = gap > 0  # strict: equal-timestamp pairs are excluded
        return pd.DataFrame(
            {
                "user_id": uid[ia][keep],
                "event_id_a": eid[ia][keep],
                "event_id_b": eid[ib][keep],
                "gap_us": gap[keep],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_ub")
        .map_groups(pairs, batch_format="pandas")
    )


def q_cheapest_supplier(sf_dir: str, n_buckets: int | None = None):
    """Minimum-cost supplier per part — the TPC-H Q2 shape (correlated
    scalar subquery on a group MIN, decorrelated): for every part, the
    supplier(s) whose cheapest line for that part equals the global
    cheapest line for the part.  Exact integer cents throughout.

    Decorrelation, fully distributed: one slim grouped MIN combine per
    (part, supplier) — partial per batch, hash-bucketed vectorized final —
    then ONE shuffle keyed by part where each bucket computes the per-part
    min and filters its (part, supplier) rows to the argmin in the same
    vectorized pass (no second scan, no broadcast of the fact side).  The
    supplier name attaches from the dimension table via broadcast
    (dimension-bounded, the J1/J5 pattern)."""
    if n_buckets is None:
        n_buckets = default_buckets()
    ds = read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "p": df["l_partkey"].to_numpy(np.int64),
                "s": df["l_suppkey"].to_numpy(np.int64),
                "c": cents(df["l_extendedprice"]),
            }
        ).groupby(["p", "s"], as_index=False).agg(c=("c", "min"))
        g["_pb"] = (
            g["p"].to_numpy(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return g

    def argmin(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["p", "s"], as_index=False).agg(c=("c", "min"))
        m = g.groupby("p")["c"].transform("min")
        out = g[g["c"] == m]
        return pd.DataFrame(
            {
                "p_partkey": out["p"].to_numpy(np.int64),
                "s_suppkey": out["s"].to_numpy(np.int64),
                "cost_cents": out["c"].to_numpy(np.int64),
            }
        )

    winners = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_pb")
        .map_groups(argmin, batch_format="pandas")
    )
    sup = read(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    ref = broadcast(sup.set_index("s_suppkey")["s_name"])

    class Name:
        def __init__(self):
            self.nm = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            d = df.copy()
            d["s_name"] = d["s_suppkey"].map(self.nm).astype(str)
            return d

    return winners.map_batches(Name, batch_format="pandas", concurrency=(1, 4))


FD_CANDIDATES = [
    ("part", "p_name", "p_brand"),
    ("part", "p_name", "p_type"),
    ("part", "p_brand", "p_type"),
    ("orders", "o_custkey", "o_orderpriority"),
]


def q_fd_violations(sf_dir: str):
    """Functional-dependency violation profiling (the Metanome/data-
    profiling class): for each candidate FD A→B, how many A-groups map to
    more than one distinct B and how many rows sit in those violating
    groups — the audit that decides whether a column pair can serve as a
    merge/survivorship rule before linkage trusts it.  Output one row per
    candidate: (tbl, lhs, rhs, n_groups, n_violating_groups,
    n_violating_rows), all exact integers.

    Distribution: per candidate, one map-side partial that reduces each
    batch to distinct (A, B) rows with a row-count partial, then ONE
    hash-bucketed combine keyed by A computing (distinct-B count, row
    sum) per group and folding the per-bucket violation tallies; a tiny
    tree-combine sums the per-bucket tallies — the driver only ever sees
    one row per bucket per candidate."""
    out_rows = []
    n_buckets = default_buckets()
    for tbl, lhs, rhs in FD_CANDIDATES:
        ds = read(sf_dir, tbl, [lhs, rhs])

        def partial(df: pd.DataFrame, lhs=lhs, rhs=rhs) -> pd.DataFrame:
            g = df.groupby([lhs, rhs], as_index=False).size()
            g = g.rename(columns={"size": "n"})
            h = pd.util.hash_pandas_object(g[lhs], index=False).to_numpy()
            g["_fb"] = (h % np.uint64(n_buckets)).astype(np.int64)
            return g

        def tally(g: pd.DataFrame, lhs=lhs, rhs=rhs) -> pd.DataFrame:
            gg = g.groupby([lhs, rhs], as_index=False).agg(n=("n", "sum"))
            per = gg.groupby(lhs).agg(
                n_b=(rhs, "nunique"), rows=("n", "sum")
            )
            viol = per["n_b"] > 1
            return pd.DataFrame(
                {
                    "n_groups": [np.int64(len(per))],
                    "n_violating_groups": [np.int64(int(viol.sum()))],
                    "n_violating_rows": [
                        np.int64(int(per.loc[viol, "rows"].sum()))
                    ],
                }
            )

        folded = tree_to_pandas(
            ds.map_batches(partial, batch_format="pandas")
            .groupby("_fb")
            .map_groups(tally, batch_format="pandas"),
            lambda df: pd.DataFrame(
                {
                    "n_groups": [df["n_groups"].sum()],
                    "n_violating_groups": [df["n_violating_groups"].sum()],
                    "n_violating_rows": [df["n_violating_rows"].sum()],
                }
            ),
        )
        out_rows.append(
            {
                "tbl": tbl,
                "lhs": lhs,
                "rhs": rhs,
                "n_groups": np.int64(folded["n_groups"].iloc[0]),
                "n_violating_groups": np.int64(
                    folded["n_violating_groups"].iloc[0]
                ),
                "n_violating_rows": np.int64(
                    folded["n_violating_rows"].iloc[0]
                ),
            }
        )
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame(out_rows))


def q_winsorized_stats(sf_dir: str, p_lo: int = 5, p_hi: int = 95):
    """Winsorized grouped statistics — the robust-prep class: per
    event_type, values clipped to the exact [p05, p95] percentile band
    before summing, so a handful of extreme rows can't dominate a mean
    (the standard pre-aggregation step for noisy metrics).  Percentile
    thresholds are exact lower quantiles (``percentile_disc``, the
    grouped_median ceil-walk); clipping and summation are pure int64.
    Output (event_type, lo_cents, hi_cents, n, sum_clipped).

    Two passes, both distinct-value-bounded: one (group, value) count
    histogram feeds BOTH quantile walks (single shuffle); the clip pass
    re-streams events against the broadcast {type: (lo, hi)} map and
    folds through ``grouped_sums``."""
    ds = read(sf_dir, "events", ["event_type", "value"])

    def value_hist(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"event_type": df["event_type"], "v": cents(df["value"])}
        )
        g = out.groupby(["event_type", "v"], as_index=False, sort=False).size()
        return g.rename(columns={"size": "n"})

    hist = grouped_sums(
        ds.map_batches(value_hist, batch_format="pandas"),
        ["event_type", "v"],
        sums={"n": "n"},
    )

    def both_walk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("v")
        cum = g["n"].cumsum().to_numpy()
        total = int(cum[-1])
        out = {}
        for name, p in (("lo", p_lo), ("hi", p_hi)):
            k = max(1, -(-(total * p) // 100))  # ceil(p% of total)
            out[name] = np.int64(
                g["v"].iloc[int(np.searchsorted(cum, k, side="left"))]
            )
        return pd.DataFrame(
            {"event_type": [g["event_type"].iloc[0]],
             "lo": [out["lo"]], "hi": [out["hi"]]}
        )

    th = (
        hist.groupby("event_type")
        .map_groups(both_walk, batch_format="pandas")
        .to_pandas()  # one row per event_type — group-bounded
    )
    ref = broadcast(
        {str(r.event_type): (int(r.lo), int(r.hi))
         for r in th.itertuples(index=False)}
    )

    class Clip:
        def __init__(self):
            self.th = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            et = df["event_type"].astype(str)
            v = cents(df["value"])
            lo = et.map({k: x[0] for k, x in self.th.items()}).to_numpy(np.int64)
            hi = et.map({k: x[1] for k, x in self.th.items()}).to_numpy(np.int64)
            return pd.DataFrame(
                {
                    "event_type": et,
                    "lo_cents": lo,
                    "hi_cents": hi,
                    "c": np.clip(v, lo, hi),
                }
            )

    return grouped_sums(
        ds.map_batches(Clip, batch_format="pandas", concurrency=(1, 8)),
        ["event_type", "lo_cents", "hi_cents"],
        sums={"sum_clipped": "c"},
        count_as="n",
    ).select_columns(["event_type", "lo_cents", "hi_cents", "n", "sum_clipped"])


# --- join discovery (data-lake joinability profiling) ------------------------

# (table, column) pairs profiled for joinability: every integer key-ish
# column of the fixture schema. Dictionary-bounded by construction — the
# COLUMN inventory is schema metadata, never data.
JOINDISC_COLS: tuple = (
    ("region", "r_regionkey"), ("nation", "n_nationkey"),
    ("nation", "n_regionkey"), ("customer", "c_custkey"),
    ("customer", "c_nationkey"), ("supplier", "s_suppkey"),
    ("supplier", "s_nationkey"), ("part", "p_partkey"),
    ("orders", "o_orderkey"), ("orders", "o_custkey"),
    ("lineitem", "l_orderkey"), ("lineitem", "l_partkey"),
    ("lineitem", "l_suppkey"), ("events", "event_id"),
    ("events", "user_id"), ("documents", "doc_id"),
    ("embeddings", "vec_id"),
)


def q_join_discovery(sf_dir: str, t_num: int = 1, t_den: int = 2,
                     n_buckets: int | None = None):
    """JOIN DISCOVERY over the data lake (the JOSIE / Aurum class, Zhu et
    al. SIGMOD'19): directed column pairs (A → B) where at least
    ``t_num/t_den`` of A's distinct values also occur in B — set
    CONTAINMENT over distinct value sets, the signal that surfaces
    foreign-key joins nobody declared.  Output
    ``(col_a, col_b, n_a, n_inter)`` for every pair clearing the exact
    integer cross-multiplied gate ``t_den·|A∩B| >= t_num·|A|``.

    Scale shape: each table is read ONCE (key columns only, pruned at
    the read) and every column contributes map-side-distinct
    ``(col_id, value)`` rows into ONE value-hash-bucketed combine; a
    bucket re-distincts, then per VALUE emits its column-id list's
    directed pairs (per-value degree ≤ #columns — schema-bounded, the
    safe side of the bipartite projection, the ``audience_overlap``
    rationale) PLUS per-column distinct-count partials as a tagged
    stream (col_b = -1).  One ``grouped_sums`` folds both; the final
    gate runs on the driver over ≤ #columns² rows — schema-bounded, not
    data-bounded.  Values never ride more than one shuffle and text/fact
    payloads never move.

    Block-count note: the N-way union inherits every stream's read
    blocks, and Ray's default blocking for these SLIM projected reads
    produces hundreds of tiny blocks whose per-block fixed cost
    dominated the measured wall time (39 s → 4 s at sf0.1/32 CPUs).
    Each read therefore sizes its block count from the projected BYTES
    (file size / 32 MB, clamped to [2, 2×cluster CPUs]) — data-
    proportional, so a 100-TB table still fans out to the cluster while
    a dimension read stays at 2 blocks."""
    import os as _os

    import ray.data as rd

    if n_buckets is None:
        n_buckets = default_buckets()
    col_names = [f"{t}.{c}" for t, c in JOINDISC_COLS]
    by_table: dict = {}
    for cid, (t, c) in enumerate(JOINDISC_COLS):
        by_table.setdefault(t, []).append((cid, c))

    def emitter(cols):
        def emit(df: pd.DataFrame) -> pd.DataFrame:
            parts = []
            for cid, c in cols:
                v = np.unique(df[c].to_numpy(np.int64))
                parts.append(pd.DataFrame(
                    {"cid": np.full(len(v), cid, np.int64), "v": v}
                ))
            g = pd.concat(parts, ignore_index=True)
            g["_vb"] = (
                g["v"].to_numpy(np.uint64) * _PB % np.uint64(n_buckets)
            ).astype(np.int64)
            return g
        return emit

    cpus = int(ray.cluster_resources().get("CPU", 8))

    def blocks_for(table: str) -> int:
        p = _os.path.join(sf_dir, f"{table}.parquet")
        if _os.path.isdir(p):  # sharded table: sum the shard files
            sz = sum(
                _os.path.getsize(_os.path.join(p, f)) for f in _os.listdir(p)
            )
        else:
            sz = _os.path.getsize(p)
        return int(min(max(2, sz // (32 << 20)), 2 * cpus))

    streams = [
        rd.read_parquet(
            _os.path.join(sf_dir, f"{t}.parquet"),
            columns=[c for _, c in cols],
            override_num_blocks=blocks_for(t),
        ).map_batches(emitter(cols), batch_format="pandas")
        for t, cols in by_table.items()
    ]
    u = streams[0]
    for s in streams[1:]:
        u = u.union(s)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # Per bucket the work loops over COLUMN PAIRS (schema-bounded,
        # ≤ C(#cols,2) sorted-array intersections in C), never over
        # values — a per-value Python walk measured 39 s at sf0.1 where
        # this shape runs in ~2 s, and at corpus scale per-value work is
        # O(distinct values) per bucket.
        g = g.drop_duplicates(subset=["cid", "v"])
        cid = g["cid"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        arrs = {c: np.sort(v[cid == c]) for c in np.unique(cid)}
        cols = sorted(arrs)
        ca: list = []
        cb: list = []
        nn: list = []
        for i, a in enumerate(cols):
            for b in cols[i + 1:]:
                inter = np.intersect1d(
                    arrs[a], arrs[b], assume_unique=True
                ).size
                if inter:
                    # directed: both orders share the same intersection
                    ca.append(a); cb.append(b); nn.append(inter)
                    ca.append(b); cb.append(a); nn.append(inter)
        # tagged per-column distinct-count partials (col_b = -1)
        for c in cols:
            ca.append(c); cb.append(-1); nn.append(len(arrs[c]))
        return pd.DataFrame(
            {"ca": np.asarray(ca, np.int64), "cb": np.asarray(cb, np.int64),
             "n": np.asarray(nn, np.int64)}
        )

    folded = tree_to_pandas(
        grouped_sums(
            u.groupby("_vb").map_groups(bucket_pairs, batch_format="pandas"),
            ["ca", "cb"],
            {"n": "n"},
        ),
        lambda df: df.groupby(["ca", "cb"], as_index=False).agg(n=("n", "sum")),
    )  # schema-bounded: <= #columns² rows
    sizes = dict(
        zip(folded[folded["cb"] == -1]["ca"].to_numpy(np.int64),
            folded[folded["cb"] == -1]["n"].to_numpy(np.int64))
    )
    p = folded[folded["cb"] != -1]
    n_a = p["ca"].map(sizes).to_numpy(np.int64)
    ni = p["n"].to_numpy(np.int64)
    keep = t_den * ni >= t_num * n_a
    out = pd.DataFrame(
        {
            "col_a": [col_names[i] for i in p["ca"].to_numpy(np.int64)[keep]],
            "col_b": [col_names[i] for i in p["cb"].to_numpy(np.int64)[keep]],
            "n_a": n_a[keep],
            "n_inter": ni[keep],
        }
    )
    return rd.from_pandas(out)


# --- KMV bottom-k distinct sketch --------------------------------------------

KMV_K = 64


def q_kmv_users(sf_dir: str, k: int = KMV_K):
    """Approximate distinct users per event type by the KMV / bottom-k
    sketch (Beyer et al. SIGMOD'07) — the ORDER-STATISTICS complement of
    the HLL registers ``q_approx_users`` ships: keep the k smallest
    splitmix64 hashes per group; the k-th smallest U_(k) estimates
    distinct ≈ (k−1)/U_(k).  Mergeable by construction (k smallest of a
    union = k smallest of the per-partial k-smallest), so partials are
    associative-idempotent and block order cannot change a bit.

    Exactness contract: hashes are uint64 splitmix64 (the pinned HLL
    kernel); the estimator is the INTEGER floor
    ``(k−1) * 2^64 // h_k`` (Python bigints — no float), with the exact
    distinct count when a group holds fewer than k distinct hashes.
    Per-batch partial = k smallest distinct hashes per type (≤ k rows
    per (type, batch)); the final fold runs over the dictionary-bounded
    type table on the driver."""
    from ..functions.sketches import splitmix64

    import ray.data as rd

    ds = read(sf_dir, "events", ["event_type", "user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates()
        h = splitmix64(g["user_id"].to_numpy(np.int64).view(np.uint64))
        p = pd.DataFrame({"event_type": g["event_type"].astype(str),
                          "h": h.astype(np.uint64).view(np.int64)})
        # k smallest per type in UNSIGNED order (int64 view: reorder via
        # xor with the sign bit so numpy's signed sort ranks uint64)
        p["_s"] = p["h"].to_numpy(np.int64) ^ np.int64(-0x8000000000000000)
        p = p.sort_values(["event_type", "_s"], kind="mergesort")
        p = p.drop_duplicates(subset=["event_type", "h"])
        p = p.groupby("event_type", group_keys=False).head(k)
        return p[["event_type", "h", "_s"]]

    folded = tree_to_pandas(
        ds.map_batches(partial, batch_format="pandas"),
        lambda df: (
            df.sort_values(["event_type", "_s"], kind="mergesort")
            .drop_duplicates(subset=["event_type", "h"])
            .groupby("event_type", group_keys=False)
            .head(k)
        ),
    )  # <= k rows per event type
    rows = []
    for et, g in folded.groupby("event_type"):
        hs = sorted(
            int(h) & 0xFFFFFFFFFFFFFFFF for h in g["h"].to_numpy(np.int64)
        )
        if len(hs) < k:
            est = len(hs)
        else:
            est = (k - 1) * (1 << 64) // hs[k - 1]
        rows.append((et, est))
    rows.sort()
    out = pd.DataFrame(rows, columns=["event_type", "est_users"])
    out["est_users"] = out["est_users"].astype(np.int64)
    return rd.from_pandas(out)


# --- CDC merge apply ---------------------------------------------------------

def q_cdc_state(sf_dir: str):
    """CDC / MERGE-INTO apply: collapse an ordered change log into the
    current snapshot — the warehouse upsert semantics (Delta/Hudi/Iceberg
    MERGE): per key the LAST operation wins in (ts, event_id) order, and
    a last-op DELETE removes the row entirely.  Fixture mapping: events
    are the change stream per ``user_id``; ``event_type = 'error'`` is
    the delete marker, every other type upserts ``value``.

    Output: (user_id, op, value_cents) for surviving users only.

    Shuffle shape: the ``latest_user_state`` keep-last discipline on the
    single user key — per-batch map-side last bounds the exchange at one
    row per (user, batch); one user-bucketed vectorized combine applies
    keep-last + the delete filter. Values cross the oracle boundary as
    integer cents."""
    ds = read(sf_dir, "events",
              ["event_id", "user_id", "event_type", "ts", "value"])
    n_buckets = default_buckets()

    def batch_last(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.sort_values(["ts", "event_id"])
            .drop_duplicates(subset=["user_id"], keep="last")
            .copy()
        )
        g["_ub"] = _user_bucket(g["user_id"].to_numpy(np.int64), n_buckets)
        return g

    def bucket_apply(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"]).drop_duplicates(
            subset=["user_id"], keep="last"
        )
        live = g[g["event_type"] != "error"]
        return pd.DataFrame(
            {
                "user_id": live["user_id"].to_numpy(np.int64),
                "op": live["event_type"].astype(str),
                "value_cents": cents(live["value"]),
            }
        )

    return (
        ds.map_batches(batch_last, batch_format="pandas")
        .groupby("_ub")
        .map_groups(bucket_apply, batch_format="pandas")
    )


# --- deterministic global shuffle index --------------------------------------

def q_shuffle_index(sf_dir: str):
    """Deterministic TRAINING-ORDER shuffle: every doc gets its exact
    rank under the RNG-free integer mixer (the ``sample_topk_hash``
    mixer) — the reproducible, resumable global data ordering an epoch
    of LLM training consumes (same answer on any cluster size, any
    block order, any retry; no RNG state to checkpoint).

    Output: (doc_id, rk, shuffle_pos), shuffle_pos = 0-based rank by
    (rk, doc_id).

    Scale shape — global rank WITHOUT a global sort (the
    ``q_sorted_neighborhood_pairs`` machinery on the hash key): a slim
    pass takes the mixer's min/max from per-batch partials; value-range
    buckets co-locate each hash range; per-bucket counts fold to
    exclusive prefix offsets (driver-bounded: one row per bucket,
    broadcast once); each bucket sorts its range vectorized and adds
    its offset. The shuffle moves 16 B/row."""
    import ray.data as rd

    ds = read(sf_dir, "documents", ["doc_id"])
    n_buckets = default_buckets()

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].to_numpy(np.int64)
        rk = ((d % 1000003) * 2654435761) % 1000000007
        return pd.DataFrame({"doc_id": d, "rk": rk.astype(np.int64)})

    slim_ds = ds.map_batches(slim, batch_format="pandas").materialize()

    def minmax(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"lo": pd.Series([], dtype=np.int64),
                                 "hi": pd.Series([], dtype=np.int64)})
        v = df["rk"].to_numpy(np.int64)
        return pd.DataFrame({"lo": [v.min()], "hi": [v.max()]})

    mm = slim_ds.map_batches(minmax, batch_format="pandas").to_pandas()
    lo, hi = int(mm["lo"].min()), int(mm["hi"].max())
    width = max(1, (hi - lo + n_buckets) // n_buckets)

    def add_vb(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_vb"] = np.minimum(
            (df["rk"].to_numpy(np.int64) - lo) // width, n_buckets - 1
        ).astype(np.int64)
        return df

    keyed = slim_ds.map_batches(add_vb, batch_format="pandas").materialize()
    counts = (
        grouped_sums(keyed, ["_vb"], sums={}, count_as="n")
        .to_pandas()
        .sort_values("_vb")
    )
    nrow = counts["n"].to_numpy(np.int64)
    offsets = dict(
        zip(counts["_vb"].to_numpy(np.int64).tolist(),
            (np.cumsum(nrow) - nrow).tolist())
    )
    off_ref = broadcast(offsets)

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)[int(g["_vb"].iloc[0])]
        g = g.sort_values(["rk", "doc_id"])
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "rk": g["rk"].to_numpy(np.int64),
                "shuffle_pos": off + np.arange(len(g), dtype=np.int64),
            }
        )

    return keyed.groupby("_vb").map_groups(rank_bucket, batch_format="pandas")


# --- SCD Type-2 history construction -----------------------------------------

SCD2_OPEN_SENTINEL = np.int64(1) << 62  # open interval "valid_to" marker


def q_scd2_history(sf_dir: str):
    """Slowly-Changing-Dimension TYPE-2 history: turn the per-user change
    log into validity intervals — every event's state is valid from its
    own timestamp until the SAME user's next change (the warehouse
    dimension-history complement of ``q_cdc_state``'s current snapshot
    and ``q_latest_user_state``'s keep-last view). The open (current)
    interval carries the 2^62 sentinel instead of NULL so the contract is
    exact int64 in both engines.

    Output: (user_id, event_id, value_cents, valid_from_us, valid_to_us).

    Scale shape: the ``q_event_gaps`` discipline — ONE hash-bucketed-by-
    user shuffle of slim int64 rows; each bucket sorts once by
    (user, ts, event_id) and computes every user's lead() in one shifted
    array masked at user boundaries. No per-user dispatch; nothing
    row-count-dependent ever reaches the driver."""
    ds = read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    n_buckets = default_buckets()

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["event_id", "user_id", "ts_us", "value_cents", "_ub"]
        if len(df) == 0:
            return pd.DataFrame(
                {"event_id": pd.Series([], dtype=np.int64),
                 "user_id": pd.Series([], dtype=np.int64),
                 "ts_us": pd.Series([], dtype=np.int64),
                 "value_cents": pd.Series([], dtype=np.int64),
                 "_ub": pd.Series([], dtype=np.int64)})[cols]
        u = df["user_id"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "user_id": u,
                "ts_us": df["ts"].astype("datetime64[us]").astype("int64"),
                "value_cents": cents(df["value"]),
                "_ub": _user_bucket(u, n_buckets),
            }
        )[cols]

    def bucket_hist(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        nxt = np.empty(len(g), dtype=np.int64)
        nxt[:-1] = ts[1:]
        nxt[-1] = SCD2_OPEN_SENTINEL
        same = np.empty(len(g), dtype=bool)
        same[:-1] = u[1:] == u[:-1]
        same[-1] = False
        valid_to = np.where(same, nxt, SCD2_OPEN_SENTINEL)
        return pd.DataFrame(
            {
                "user_id": u,
                "event_id": g["event_id"].to_numpy(np.int64),
                "value_cents": g["value_cents"].to_numpy(np.int64),
                "valid_from_us": ts,
                "valid_to_us": valid_to,
            }
        )

    return (
        ds.map_batches(slim, batch_format="pandas")
        .groupby("_ub")
        .map_groups(bucket_hist, batch_format="pandas")
    )


# --- k-anonymity audit -------------------------------------------------------

K_ANON = 20  # minimum quasi-identifier group size


def q_k_anonymity(sf_dir: str, k: int = K_ANON):
    """k-anonymity audit (Sweeney 2002 — the data-governance gate every
    published dataset needs): group the table by its QUASI-IDENTIFIER
    tuple and report the groups smaller than ``k`` — rows in those groups
    are re-identifiable by joining the quasi-identifiers against an
    external source, so a release either generalizes or suppresses them.
    Quasi-identifiers here: (market segment, account-balance band); the
    band is exact integer cents shifted non-negative before the floor
    division, so the Python // and SQL // agree (the truncating-division
    pitfall pinned by truth_discovery).

    Output: (c_mktsegment, bal_band, n) for violating groups only.

    Scale shape: one ``grouped_sums`` count (map-side combine, bounded by
    the quasi-identifier vocabulary) + a vectorized filter — no
    corpus-scale state anywhere."""
    ds = read(sf_dir, "customer", ["c_mktsegment", "c_acctbal"])

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        c = cents(df["c_acctbal"])
        return pd.DataFrame(
            {
                "c_mktsegment": df["c_mktsegment"].astype(str),
                "bal_band": (c + 100000) // 100000,
            }
        )

    counts = grouped_sums(
        ds.map_batches(slim, batch_format="pandas"),
        ["c_mktsegment", "bal_band"],
        sums={},
        count_as="n",
    )
    return counts.map_batches(
        lambda df: df[df["n"] < k], batch_format="pandas"
    )


# --- calendar-spine densified hourly series ----------------------------------

def q_dense_hourly(sf_dir: str):
    """Gap-filled (densified) hourly series: events per (hour, type) with
    EXPLICIT zero rows for every hour in the observed span — the calendar
    spine every monitoring/forecasting consumer needs (a missing hour and
    a zero hour are different facts; ``q_hourly_delta`` windows over
    PRESENT hours only, this op manufactures the absent ones).

    Output: (hour, event_type, n) over span(min hour … max hour) × the
    observed event-type vocabulary.

    Scale shape: ONE ``grouped_sums`` pass collapses the corpus to the
    (hour, type) aggregate — bounded by calendar span × type vocabulary,
    not corpus size — and the dense grid is manufactured driver-side from
    that bounded table (hours grow with wall-clock time, never with data
    volume), then returned as a Dataset."""
    import ray.data as rd

    ds = read(sf_dir, "events", ["ts", "event_type"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("datetime64[us]").astype("int64")
        return pd.DataFrame(
            {
                "hour": us // 3_600_000_000,
                "event_type": df["event_type"].astype(str),
            }
        )

    agg = grouped_sums(
        ds.map_batches(prep, batch_format="pandas"),
        ["hour", "event_type"],
        sums={},
        count_as="n",
    ).to_pandas()  # <= span-hours x types rows (calendar-bounded)

    if len(agg) == 0:  # empty fact table -> empty spine (oracle-equal)
        return rd.from_pandas(pd.DataFrame(
            {"hour": pd.Series([], dtype=np.int64),
             "event_type": pd.Series([], dtype=object),
             "n": pd.Series([], dtype=np.int64)}))

    hours = np.arange(agg["hour"].min(), agg["hour"].max() + 1, dtype=np.int64)
    types = sorted(agg["event_type"].unique())
    grid = pd.DataFrame(
        {
            "hour": np.repeat(hours, len(types)),
            "event_type": np.tile(np.array(types, dtype=object), len(hours)),
        }
    )
    out = grid.merge(agg, on=["hour", "event_type"], how="left")
    out["n"] = out["n"].fillna(0).astype(np.int64)
    return rd.from_pandas(out)


# --- mergeable log2 quantile sketch ------------------------------------------

def q_quantile_sketch(sf_dir: str):
    """Approximate grouped quantiles from a MERGEABLE log2-binned
    histogram — the sketch-family member for order statistics next to
    HLL (distinct), KMV (distinct), and Misra-Gries (heavy hitters):
    each value lands in bin = bit_length(cents) (a power-of-two bracket),
    partials are plain (group, bin, count) rows that merge by addition in
    ANY order, and a quantile's answer is the LOWER BOUND of the bin
    where the cumulative count crosses — a one-sided exact bound with
    ≤ 2× relative error, which is what monitoring dashboards actually
    need at 10^12 rows (exact per-group quantiles are the
    ``q_exact_quantiles`` path).

    Output: (event_type, p50_lb, p90_lb) integer-cent lower bounds.

    Scale shape: one ``grouped_sums`` pass over (type, bin) — ≤ 64 bins ×
    type vocabulary rows total — then a driver fold of that bounded
    table. All-integer: bit_length via ``np.frexp`` exponents with an
    exact int64 correction (ADVICE r4: above 2^53 the float64 cast can
    round a value just under a power of two UP to it, bumping the frexp
    exponent by one; the shift-compare below restores the exact integer
    bit_length for the full int64 range), crossings by integer
    cross-multiplication."""
    ds = read(sf_dir, "events", ["event_type", "value"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        c = cents(df["value"])
        cp = np.maximum(c, 0)
        e = np.frexp(cp.astype(np.float64))[1].astype(np.int64)
        # exact correction: true b satisfies 2^(b-1) <= x; float rounding
        # can only overshoot by one, so one shift-compare repairs it
        e = np.minimum(e, 63)
        eh = np.maximum(e - 1, 0)
        e = e - (cp < (np.int64(1) << eh)).astype(np.int64)
        return pd.DataFrame(
            {
                "event_type": df["event_type"].astype(str),
                "bin": np.where(c <= 0, 0, e),
            }
        )

    hist = grouped_sums(
        ds.map_batches(prep, batch_format="pandas"),
        ["event_type", "bin"],
        sums={},
        count_as="n",
    ).to_pandas()  # <= 64 bins x type vocabulary

    rows = []
    for et, g in hist.groupby("event_type"):
        g = g.sort_values("bin")
        n = g["n"].to_numpy(np.int64)
        bins = g["bin"].to_numpy(np.int64)
        cum = np.cumsum(n)
        total = int(cum[-1])
        lb = np.where(bins == 0, 0, np.int64(1) << np.maximum(bins - 1, 0))
        p50 = int(lb[np.argmax(2 * cum >= total)])
        p90 = int(lb[np.argmax(10 * cum >= 9 * total)])
        rows.append((et, p50, p90))
    out = pd.DataFrame(rows, columns=["event_type", "p50_lb", "p90_lb"])
    out["p50_lb"] = out["p50_lb"].astype(np.int64)
    out["p90_lb"] = out["p90_lb"].astype(np.int64)
    import ray.data as rd

    return rd.from_pandas(out)


# --- decile lift table -------------------------------------------------------

def q_decile_lift(sf_dir: str, n_tiles: int = 10):
    """Decile LIFT table: rank every user by lifetime value, split into
    ``n_tiles`` equal buckets (SQL ntile semantics: the first n%tiles
    buckets take the extra member), and report users + value per decile
    — the marketing/LTV concentration chart ("the top decile carries
    2× its share").

    Output: (decile 1-based, n_users, total_cents).

    Scale shape: per-user cent totals are one ``grouped_sums`` pass;
    the GLOBAL rank over those totals reuses the ``q_shuffle_index``
    rank-without-a-global-sort machinery — value-range buckets on the
    cent total (descending), per-bucket exclusive prefix offsets from a
    bounded counts table, one vectorized sort per bucket; the ntile
    boundaries are exact integer arithmetic on the known user count.
    The shuffle carries 16 B/user; nothing user-cardinality ever sits
    on the driver."""
    ds = read(sf_dir, "events", ["user_id", "value"])

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "cents": cents(df["value"]),
            }
        )

    totals = grouped_sums(
        ds.map_batches(slim, batch_format="pandas"),
        ["user_id"],
        sums={"cents": "cents"},
    ).materialize()
    n_buckets = default_buckets()

    def minmax(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"lo": pd.Series([], dtype=np.int64),
                                 "hi": pd.Series([], dtype=np.int64)})
        v = df["cents"].to_numpy(np.int64)
        return pd.DataFrame({"lo": [v.min()], "hi": [v.max()]})

    mm = totals.map_batches(minmax, batch_format="pandas").to_pandas()
    if len(mm) == 0 or "lo" not in mm.columns:  # empty fact table
        return rd_from(pd.DataFrame(
            {"decile": pd.Series([], dtype=np.int64),
             "n_users": pd.Series([], dtype=np.int64),
             "total_cents": pd.Series([], dtype=np.int64)}))
    lo, hi = int(mm["lo"].min()), int(mm["hi"].max())
    width = max(1, (hi - lo + n_buckets) // n_buckets)

    def add_vb(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        # DESCENDING value order: bucket 0 holds the largest totals
        df["_vb"] = np.minimum(
            (hi - df["cents"].to_numpy(np.int64)) // width, n_buckets - 1
        ).astype(np.int64)
        return df

    keyed = totals.map_batches(add_vb, batch_format="pandas").materialize()
    counts = (
        grouped_sums(keyed, ["_vb"], sums={}, count_as="n")
        .to_pandas()
        .sort_values("_vb")
    )
    nrow = counts["n"].to_numpy(np.int64)
    n_total = int(nrow.sum())
    offsets = dict(
        zip(counts["_vb"].to_numpy(np.int64).tolist(),
            (np.cumsum(nrow) - nrow).tolist())
    )
    # exact ntile boundaries: first n%tiles buckets take ceil(n/tiles)
    q, r = divmod(n_total, n_tiles)
    sizes = np.array([q + 1] * r + [q] * (n_tiles - r), dtype=np.int64)
    bounds = np.cumsum(sizes)
    ref = broadcast((offsets, bounds))

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        offs, bnds = ray.get(ref)
        off = offs[int(g["_vb"].iloc[0])]
        g = g.sort_values(["cents", "user_id"], ascending=[False, True],
                          kind="mergesort")
        rank = off + np.arange(len(g), dtype=np.int64)
        decile = np.searchsorted(bnds, rank, side="right") + 1
        return pd.DataFrame(
            {"decile": decile.astype(np.int64),
             "cents": g["cents"].to_numpy(np.int64)}
        )

    ranked = keyed.groupby("_vb").map_groups(rank_bucket, batch_format="pandas")
    return grouped_sums(
        ranked, ["decile"], sums={"total_cents": "cents"}, count_as="n_users"
    )


# --- seasonal-naive forecast error -------------------------------------------

def q_seasonal_naive(sf_dir: str, season: int = 24):
    """Seasonal-naive FORECAST-BASELINE error: predict each hour's event
    count with the count ``season`` hours earlier on the zero-filled
    spine, and report the per-type absolute-error mass — the baseline
    every forecasting model must beat, evaluated over the densified
    series (the zero rows matter: a missing hour forecast as 0 vs
    observed 0 is a CORRECT forecast, which present-hours-only series
    get wrong).

    Output: (event_type, n_forecasts, abs_err_sum).

    Scale shape: rides ``q_dense_hourly``'s calendar-bounded aggregated
    spine; the lag-and-diff is one vectorized pass over that bounded
    table."""
    spine = q_dense_hourly(sf_dir).to_pandas()  # calendar-bounded
    if len(spine) == 0:
        return rd_from(pd.DataFrame(
            {"event_type": pd.Series([], dtype=object),
             "n_forecasts": pd.Series([], dtype=np.int64),
             "abs_err_sum": pd.Series([], dtype=np.int64)}))
    rows = []
    for et, g in spine.groupby("event_type"):
        g = g.sort_values("hour")
        n = g["n"].to_numpy(np.int64)
        if len(n) <= season:
            continue
        err = np.abs(n[season:] - n[:-season])
        rows.append((et, len(err), int(err.sum())))
    out = pd.DataFrame(rows, columns=["event_type", "n_forecasts",
                                      "abs_err_sum"])
    out["n_forecasts"] = out["n_forecasts"].astype(np.int64)
    out["abs_err_sum"] = out["abs_err_sum"].astype(np.int64)
    return rd_from(out)


def rd_from(df: pd.DataFrame):
    import ray.data as rd

    return rd.from_pandas(df)


# --- event-type co-occurrence (bitmask histogram) ----------------------------

def q_type_cooccurrence(sf_dir: str):
    """Event-type CO-OCCURRENCE: distinct users who performed BOTH types,
    per type pair — the behavioral-segment intersection matrix (the
    events-side sibling of the media ``audience_overlap``).

    Output: (type_a, type_b, n_users) with type_a < type_b.

    Scale shape: the type vocabulary is dictionary-bounded, so each
    user's type set packs into ONE int bitmask — per-batch distinct
    (user, bit) partials, one user-bucketed combine ORs the bits, and
    each bucket emits its bounded MASK HISTOGRAM (≤ 2^|types| rows);
    the driver folds histograms and reads every pair count off the
    mask counts. No pair ever shuffles; state is 2^|types| integers."""
    ds = read(sf_dir, "events", ["user_id", "event_type"])
    tdf = distinct_column(ds, "event_type").to_pandas()
    types = (sorted(tdf["event_type"].astype(str).tolist())
             if "event_type" in tdf.columns else [])
    if not types:  # empty fact table -> empty matrix (oracle-equal)
        return rd_from(pd.DataFrame(
            {"type_a": pd.Series([], dtype=object),
             "type_b": pd.Series([], dtype=object),
             "n_users": pd.Series([], dtype=np.int64)}))
    if len(types) > 63:
        # one bit per type in an int64 mask AND a 2^|types| histogram —
        # both break past 63 types (ADVICE r4: mirror the BFS_DEPTH_BITS
        # loud-guard discipline instead of silently overflowing the mask)
        raise ValueError(
            f"q_type_cooccurrence: {len(types)} distinct event types "
            "exceed the 63-bit int64 mask (and the 2^|types| histogram "
            "state); use a pairwise count plan for open type vocabularies"
        )
    bit_of = {t: 1 << i for i, t in enumerate(types)}
    bit_ref = broadcast(bit_of)
    n_buckets = default_buckets()

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                                 "bit": pd.Series([], dtype=np.int64),
                                 "_ub": pd.Series([], dtype=np.int64)})
        lk = ray.get(bit_ref)
        out = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "bit": df["event_type"].map(lk).to_numpy(np.int64),
            }
        ).drop_duplicates()
        out["_ub"] = _user_bucket(out["user_id"].to_numpy(np.int64), n_buckets)
        return out

    def bucket_hist(g: pd.DataFrame) -> pd.DataFrame:
        masks = (
            g.drop_duplicates(["user_id", "bit"])
            .groupby("user_id")["bit"].sum()          # distinct bits -> OR
        )
        h = masks.value_counts()
        return pd.DataFrame(
            {"mask": h.index.to_numpy(np.int64),
             "n": h.to_numpy(np.int64)}
        )

    hist = (
        ds.map_batches(slim, batch_format="pandas")
        .groupby("_ub")
        .map_groups(bucket_hist, batch_format="pandas")
        .to_pandas()  # <= n_buckets x 2^|types| rows
    )
    hist = hist.groupby("mask", as_index=False)["n"].sum()
    masks = hist["mask"].to_numpy(np.int64)
    counts = hist["n"].to_numpy(np.int64)
    rows = []
    for i, ta in enumerate(types):
        for j in range(i + 1, len(types)):
            both = (masks & (1 << i) > 0) & (masks & (1 << j) > 0)
            n = int(counts[both].sum())
            if n:
                rows.append((ta, types[j], n))
    out = pd.DataFrame(rows, columns=["type_a", "type_b", "n_users"])
    out["n_users"] = out["n_users"].astype(np.int64)
    return rd_from(out)


# --- marker-reset running total ----------------------------------------------

def q_reset_running_total(sf_dir: str):
    """Running total that RESETS at a marker event — the balance-replay /
    meter-reset window (``sessionize`` resets on a time GAP; this resets
    on a domain event: every ``error`` row opens a new accumulation
    segment, itself included). Output: (event_id, user_id, run_cents),
    the cumulative cents within the user's current segment in
    (ts, event_id) order.

    Scale shape: the ``q_event_gaps`` discipline — ONE hash-bucketed-by-
    user shuffle of slim int64 rows; each bucket sorts once and computes
    segment ids (inclusive cumsum of marker flags) and the within-
    segment running sum (cumsum minus the segment-start offset, gathered
    vectorized) for every user at once."""
    ds = read(sf_dir, "events",
              ["event_id", "user_id", "ts", "event_type", "value"])
    n_buckets = default_buckets()

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["event_id", "user_id", "ts_us", "cents", "is_mark", "_ub"]
        if len(df) == 0:
            return pd.DataFrame(
                {c: pd.Series([], dtype=np.int64) for c in cols})[cols]
        u = df["user_id"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "user_id": u,
                "ts_us": df["ts"].astype("datetime64[us]").astype("int64"),
                "cents": cents(df["value"]),
                "is_mark": (df["event_type"] == "error").to_numpy()
                .astype(np.int64),
                "_ub": _user_bucket(u, n_buckets),
            }
        )[cols]

    def bucket_run(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        c = g["cents"].to_numpy(np.int64)
        mark = g["is_mark"].to_numpy(np.int64)
        new_user = np.empty(len(g), dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        # global segment id: new segment at every user start or marker row
        seg_start = new_user | (mark == 1)
        seg_id = np.cumsum(seg_start) - 1
        cs = np.cumsum(c)
        # offset = cumulative sum just BEFORE each segment's first row
        starts = np.flatnonzero(seg_start)
        seg_offset = np.where(starts > 0, cs[starts - 1], 0)
        run = cs - seg_offset[seg_id]
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(np.int64),
                "user_id": u,
                "run_cents": run.astype(np.int64),
            }
        )

    return (
        ds.map_batches(slim, batch_format="pandas")
        .groupby("_ub")
        .map_groups(bucket_run, batch_format="pandas")
    )


# --- declarative data-quality checks -----------------------------------------

def q_dq_checks(sf_dir: str):
    """Declarative DATA-QUALITY expectation suite (the Great-Expectations
    shape): a fixed rule list — range, domain, uniqueness, non-null —
    each evaluated over its table in one pass, reporting checked and
    violating row counts. The per-release gate a lake pipeline runs
    before publishing a snapshot.

    Output: (rule, n_checked, n_violations).

    Scale shape: every rule is a pruned-column read + vectorized
    predicate with per-batch (n, viol) partials; the uniqueness rule is
    the one non-map rule and reuses ``distinct_column`` (distinct count
    vs row count — no value list ever collects). Output is bounded by
    the rule list."""
    import ray.data as rd

    rows = []

    def scan(table: str, cols: list, viol_fn) -> tuple:
        ds = read(sf_dir, table, cols)

        def part(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame({"n": pd.Series([], dtype=np.int64),
                                     "v": pd.Series([], dtype=np.int64)})
            return pd.DataFrame(
                {"n": [np.int64(len(df))],
                 "v": [np.int64(int(viol_fn(df).sum()))]}
            )

        p = ds.map_batches(part, batch_format="pandas").to_pandas()
        return int(p["n"].sum()), int(p["v"].sum())

    n, v = scan("orders", ["o_totalprice"],
                lambda df: df["o_totalprice"] < 0)
    rows.append(("orders_totalprice_nonneg", n, v))
    n, v = scan("lineitem", ["l_quantity"],
                lambda df: (df["l_quantity"] < 1) | (df["l_quantity"] > 50))
    rows.append(("lineitem_qty_range", n, v))
    # uniqueness: row count minus distinct count, both distributed
    cds = read(sf_dir, "customer", ["c_custkey"])
    n_rows = cds.count()
    n_distinct = distinct_column(cds, "c_custkey").count()
    rows.append(("customer_key_unique", n_rows, n_rows - n_distinct))
    n, v = scan("events", ["value"], lambda df: df["value"].isna())
    rows.append(("events_value_nonnull", n, v))

    out = pd.DataFrame(rows, columns=["rule", "n_checked", "n_violations"])
    out["n_checked"] = out["n_checked"].astype(np.int64)
    out["n_violations"] = out["n_violations"].astype(np.int64)
    return rd.from_pandas(out)


# --- per-user activity-day gap detection -------------------------------------

def q_user_day_gaps(sf_dir: str):
    """Per-user ACTIVITY GAPS: the missing-day runs between each user's
    consecutive active days — the churn-risk / sensor-outage islands
    complement of ``q_segment_runs`` (which reports the present runs;
    this reports the holes, as explicit [gap_start, gap_end] day
    intervals).

    Output: (user_id, gap_start, gap_end) in epoch days.

    Scale shape: per-batch distinct (user, day) partials bound the
    exchange at one row per (user, day, batch); one user-bucketed
    combine sorts, dedups, and finds every user's gaps with a shifted
    comparison masked at user boundaries — no per-user dispatch."""
    ds = read(sf_dir, "events", ["user_id", "ts"])
    n_buckets = default_buckets()

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "day", "_ub"]
        if len(df) == 0:
            return pd.DataFrame(
                {c: pd.Series([], dtype=np.int64) for c in cols})[cols]
        us = df["ts"].astype("datetime64[us]").astype("int64")
        out = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "day": us // 86_400_000_000,
            }
        ).drop_duplicates()
        out["_ub"] = _user_bucket(out["user_id"].to_numpy(np.int64), n_buckets)
        return out[cols]

    gap_schema = pa.schema(
        [("user_id", pa.int64()), ("gap_start", pa.int64()),
         ("gap_end", pa.int64())]
    )

    def bucket_gaps(g: pd.DataFrame) -> pa.Table:
        # pa.Table with an EXPLICIT schema: an all-gap-free bucket emits
        # an empty block, and pandas empty frames can drop column schema
        # on the block boundary (observed: the driver compare then sees a
        # column-less empty result where the oracle has named columns)
        g = g.drop_duplicates(["user_id", "day"]).sort_values(
            ["user_id", "day"], kind="mergesort"
        )
        u = g["user_id"].to_numpy(np.int64)
        d = g["day"].to_numpy(np.int64)
        same = np.empty(len(g), dtype=bool)
        same[:-1] = u[1:] == u[:-1]
        same[-1] = False
        nxt = np.empty(len(g), dtype=np.int64)
        nxt[:-1] = d[1:]
        nxt[-1] = 0
        m = same & (nxt > d + 1)
        return pa.Table.from_pydict(
            {
                "user_id": u[m],
                "gap_start": d[m] + 1,
                "gap_end": nxt[m] - 1,
            },
            schema=gap_schema,
        )

    return (
        ds.map_batches(slim, batch_format="pandas")
        .groupby("_ub")
        .map_groups(bucket_gaps, batch_format="pandas")
    )


# --- join-size estimation from degree sketches -------------------------------

def q_join_size_estimate(sf_dir: str):
    """JOIN-SIZE computation WITHOUT running the join — the cost-based-
    optimizer primitive: |A ⋈_k B| = Σ_k d_A(k)·d_B(k) exactly, from the
    two per-key degree tables (orders ⋈ lineitem on orderkey here). An
    optimizer consults this before choosing broadcast vs shuffle; the
    same machinery with SKETCHED degrees (the kmv/hll family) gives the
    approximate variant at planning time.

    Output: one row (join_size, n_left_keys, n_right_keys).

    Scale shape: two ``grouped_sums`` count passes (map-side combined),
    then ONE key-bucketed co-group over slim (key, degree, side) rows —
    the product-sum and both key counts come out of the same vectorized
    merge per bucket; the driver folds n_buckets partial rows. The fact
    rows themselves never meet."""
    import ray.data as rd

    do_ = grouped_sums(
        read(sf_dir, "orders", ["o_orderkey"]).map_batches(
            lambda df: pd.DataFrame(
                {"k": df["o_orderkey"].to_numpy(np.int64)}),
            batch_format="pandas"),
        ["k"], sums={}, count_as="d",
    )
    dl = grouped_sums(
        read(sf_dir, "lineitem", ["l_orderkey"]).map_batches(
            lambda df: pd.DataFrame(
                {"k": df["l_orderkey"].to_numpy(np.int64)}),
            batch_format="pandas"),
        ["k"], sums={}, count_as="d",
    )
    n_buckets = default_buckets()

    def tag(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame(
                    {"k": pd.Series([], dtype=np.int64),
                     "d": pd.Series([], dtype=np.int64),
                     "side": pd.Series([], dtype=np.int64),
                     "_kb": pd.Series([], dtype=np.int64)})
            out = pd.DataFrame(
                {"k": df["k"].to_numpy(np.int64),
                 "d": df["d"].to_numpy(np.int64),
                 "side": np.int64(side)}
            )
            out["_kb"] = _user_bucket(out["k"].to_numpy(np.int64), n_buckets)
            return out
        return fn

    both = do_.map_batches(tag(0), batch_format="pandas").union(
        dl.map_batches(tag(1), batch_format="pandas")
    )

    def bucket_product(g: pd.DataFrame) -> pd.DataFrame:
        a = g[g["side"] == 0][["k", "d"]]
        b = g[g["side"] == 1][["k", "d"]]
        m = a.merge(b, on="k", suffixes=("_a", "_b"))
        return pd.DataFrame(
            {
                "js": [np.int64(
                    (m["d_a"].to_numpy(np.int64)
                     * m["d_b"].to_numpy(np.int64)).sum())],
                "nl": [np.int64(len(a))],
                "nr": [np.int64(len(b))],
            }
        )

    p = (
        both.groupby("_kb")
        .map_groups(bucket_product, batch_format="pandas")
        .to_pandas()  # <= n_buckets rows
    )
    return rd.from_pandas(pd.DataFrame(
        {
            "join_size": [np.int64(p["js"].sum())],
            "n_left_keys": [np.int64(p["nl"].sum())],
            "n_right_keys": [np.int64(p["nr"].sum())],
        }
    ))
