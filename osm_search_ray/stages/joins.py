"""Distributed join / indexing primitives the Dataset API doesn't ship.

  hash_bucket_join   both-sides-large equi-join: add ``bucket = key % B`` to
                     both sides, union, groupby(bucket), pandas merge inside
                     the group — the portable partitioned hash join
                     (ray_guide.md 'Joins and lookups'). B chooses the
                     shuffle granularity; skewed keys can be salted upstream.

  zip_with_index     deterministic dense 0..N-1 ids after a sort — replaces
                     the reference's mutex-guarded arrival-order docID
                     counter (pkg/index/indexer.go:196-216), which is
                     nondeterministic under concurrency. Offsets are computed
                     from per-block row counts (O(blocks) driver work, no
                     data movement).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def hash_bucket_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    num_buckets: int = 64,
    how: str = "inner",
    right_on: str | None = None,
    use_native: bool = False,
) -> "ray.data.Dataset":
    """Partitioned hash join of two datasets on an int64 OR string key
    column (string keys bucket by pandas' deterministic hash — stable
    across processes, same function grouped_apply_bounded uses).

    ``use_native=True`` opts into this Ray version's hash-partitioned
    ``Dataset.join`` — ONLY safe when both inputs have clean flat Arrow
    schemas end-to-end (e.g. straight from read_parquet): upstream
    map_groups stages can emit schema-less empty pandas blocks that crash
    acero at EXECUTION time, past any plan-time guard. The explicit
    bucket-union-groupby join below is the portable default (and the
    reference implementation the native path is tested against). Column
    sets of the two sides must be disjoint apart from the key.
    """
    right_on = right_on or on

    def _native_safe(ds) -> bool:
        # acero hash join rejects list/map/struct non-key columns at runtime
        # (inside shuffle actors, past any plan-time try/except) — detect here
        try:
            s = ds.schema()
            for t in s.types:
                if not isinstance(t, pa.DataType) or pa.types.is_nested(t):
                    return False
            return True
        except Exception:
            return False

    if use_native and hasattr(left, "join") and _native_safe(left) and _native_safe(right):
        try:
            joined = left.join(
                right,
                join_type=how,
                num_partitions=num_buckets,
                on=(on,),
                right_on=(right_on,) if right_on != on else None,
            )
            if right_on != on:
                # the native join drops the right key column; the portable
                # fallback keeps it — restore it so both paths share a contract
                joined = joined.map_batches(
                    lambda t, _on=on, _ron=right_on: t.append_column(_ron, t.column(_on)),
                    batch_format="pyarrow",
                )
            return joined
        except Exception:
            pass  # fall through to the portable implementation
    lcols = set(left.schema().names)
    rcols = set(right.schema().names)
    overlap = (lcols & rcols) - {on} if on == right_on else (lcols & rcols)
    if overlap:
        raise ValueError(f"overlapping non-key columns: {overlap}")

    def key_side(side: int, key: str):
        def fn(batch: pa.Table) -> pa.Table:
            col = batch.column(key)
            if pa.types.is_integer(col.type):
                b = col.to_numpy(zero_copy_only=False).astype(np.int64) % num_buckets
            else:  # string / other: deterministic cross-process hash
                h = pd.util.hash_pandas_object(col.to_pandas(), index=False).to_numpy()
                b = (h % num_buckets).astype(np.int64)
            batch = batch.append_column("__bucket", pa.array(b))
            return batch.append_column("__side", pa.array(np.full(len(batch), side, dtype=np.int8)))

        return fn

    l_k = left.map_batches(key_side(0, on), batch_format="pyarrow")
    r_k = right.map_batches(key_side(1, right_on), batch_format="pyarrow")

    # widen to a common column set for union (pandas: missing cols → None,
    # no Arrow type juggling for object/list columns)
    l_names = list(left.schema().names)
    r_names = [n for n in right.schema().names if n not in lcols]
    all_cols = l_names + r_names + ["__bucket", "__side"]

    def widen(fn_cols):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            for n in fn_cols:
                if n not in df.columns:
                    df[n] = None
            return df[all_cols]

        return fn

    both = l_k.map_batches(widen(all_cols), batch_format="pandas").union(
        r_k.map_batches(widen(all_cols), batch_format="pandas")
    )
    out_names = l_names + r_names

    # primitive dtypes to restore after the union (widening with None turns
    # int64 key/value columns into object dtype inside the mixed blocks)
    dtype_map: dict[str, str] = {}
    for side in (left, right):
        s = side.schema()
        for name, t in zip(s.names, s.types):
            if isinstance(t, pa.DataType) and (pa.types.is_integer(t) or pa.types.is_floating(t)):
                dtype_map[name] = t.to_pandas_dtype()

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == 0][l_names]
        rg = g[g["__side"] == 1][[right_on] + r_names] if right_on not in r_names else g[g["__side"] == 1][r_names]
        if right_on == on:
            merged = lg.merge(rg, on=on, how=how)
        else:
            merged = lg.merge(rg, left_on=on, right_on=right_on, how=how)
        merged = merged[out_names]
        for col, dt in dtype_map.items():
            if col in merged.columns and merged[col].notna().all():
                merged[col] = merged[col].astype(dt)
        return merged

    return both.groupby("__bucket").map_groups(join_group, batch_format="pandas")


def attach_columns(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    cols: dict[str, str],
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """Attach ``right``'s payload columns (one row per int64 key) to every
    ``left`` row keyed by ``left[on]`` — INNER join semantics, ONE bucketed
    tagged-union exchange that stays TYPED ARROW end-to-end. ``cols`` maps
    right column → output column name.

    hash_bucket_join widens both sides through pandas with ``None`` filler
    columns, turning a large pair table into object-dtype blocks that get
    pickled through the shuffle twice; for the pair-verify topology
    (100k+ pairs × per-doc gram/signature/vector blobs in the dedup
    family) that costs seconds. Here filler cells are Arrow typed nulls,
    the exchange ships Arrow blocks, and the per-bucket fuse is a
    searchsorted lookup + Arrow ``take``."""
    # pandas-block datasets (from_pandas, incl. EMPTY frames — a
    # hypothesis-found edge) report numpy dtypes from schema(); force
    # Arrow blocks so the typed-null machinery below sees pa.DataType
    def _arrow_blocks(ds):
        if all(isinstance(t, pa.DataType) for t in ds.schema().types):
            return ds
        return ds.map_batches(lambda t: t, batch_format="pyarrow")

    left = _arrow_blocks(left)
    right = _arrow_blocks(right)
    l_names = list(left.schema().names)
    l_types = {n: t for n, t in zip(left.schema().names, left.schema().types)}
    r_types = {n: t for n, t in zip(right.schema().names, right.schema().types)}
    for rc, oc in cols.items():
        if oc in l_names:
            raise ValueError(f"left already has column {oc}")
        if rc not in r_types:
            raise ValueError(f"right has no column {rc}")
        # replicating per-key blobs across many left rows can exceed
        # pa.binary()'s int32 offset range (2 GiB per array) inside one
        # bucket — widen to large_binary (int64 offsets) up front
        if pa.types.is_binary(r_types[rc]):
            r_types[rc] = pa.large_binary()
    out_cols = list(cols.values())

    def tag_left(t: pa.Table) -> pa.Table:
        b = t.column(on).to_numpy(zero_copy_only=False).astype(np.int64) % num_buckets
        for rc, oc in cols.items():
            t = t.append_column(oc, pa.nulls(len(t), r_types[rc]))
        t = t.append_column("__bucket", pa.array(b))
        return t.append_column("__side", pa.array(np.zeros(len(t), np.int8)))

    def tag_right(t: pa.Table) -> pa.Table:
        keys = t.column(on).to_numpy(zero_copy_only=False).astype(np.int64)
        c = {}
        for n in l_names:
            if n == on:
                c[n] = pa.array(keys, pa.int64())
            else:
                c[n] = pa.nulls(len(t), l_types[n])
        for rc, oc in cols.items():
            c[oc] = t.column(rc).cast(r_types[rc])
        c["__bucket"] = pa.array(keys % num_buckets)
        c["__side"] = pa.array(np.ones(len(t), np.int8))
        return pa.table(c)

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    def fuse(t: pa.Table) -> pa.Table:
        side = t.column("__side").to_numpy(zero_copy_only=False)
        lt = t.filter(pa.array(side == 0))
        rt = t.filter(pa.array(side == 1))
        keys = rt.column(on).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(keys, kind="stable")
        ks = keys[order]
        lids = lt.column(on).to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(ks, lids)
        if len(ks):
            ok = (pos < len(ks)) & (ks[np.minimum(pos, len(ks) - 1)] == lids)
        else:
            ok = np.zeros(len(lids), bool)
        lt = lt.filter(pa.array(ok))
        sel = pa.array(order[pos[ok]])
        out = lt.drop_columns(["__bucket", "__side"] + out_cols)
        for oc in out_cols:
            col = rt.column(oc).combine_chunks() if rt.num_rows else rt.column(oc)
            out = out.append_column(oc, col.take(sel))
        return out

    return both.groupby("__bucket").map_groups(fuse, batch_format="pyarrow")


def attach_blob_column(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    blob_col: str,
    out_col: str,
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """Single-binary-column convenience form of :func:`attach_columns`."""

    def to_bin(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index(blob_col), blob_col, t.column(blob_col).cast(pa.binary())
        )

    return attach_columns(
        left,
        right.map_batches(to_bin, batch_format="pyarrow"),
        on,
        {blob_col: out_col},
        num_buckets=num_buckets,
    )


def zip_with_index(ds: "ray.data.Dataset", id_col: str = "row_id") -> "ray.data.Dataset":
    """Add a dense 0..N-1 int64 id following the dataset's current block
    order. Call after ``ds.sort(...)`` for a fully deterministic numbering.

    Implementation: materialize block refs (zero-copy handles, not data),
    read per-block counts from metadata, launch one task per block adding
    the running offset.
    """
    mat = ds.materialize()
    refs = mat.to_arrow_refs()
    if not refs:  # zero-block dataset (e.g. empty corpus) — nothing to number
        return mat

    @ray.remote
    def count_block(t: pa.Table) -> int:
        return t.num_rows

    counts = ray.get([count_block.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)

    @ray.remote
    def add_ids(t: pa.Table, off: int) -> pa.Table:
        return t.append_column(id_col, pa.array(np.arange(off, off + t.num_rows, dtype=np.int64)))

    out_refs = [add_ids.remote(r, int(o)) for r, o in zip(refs, offsets)]
    return ray.data.from_arrow_refs(out_refs)


def default_num_parts() -> int:
    """Adaptive exchange width: 2× the cluster's CPU count, floored at 16.
    Ray's sort-shuffle + map_groups pays a fixed per-partition cost (~50 ms
    on this host), so a hardcoded 64 wastes seconds per exchange in a small
    local session while a 256-node cluster needs thousands of partitions —
    CPU-proportional is the standard heuristic and keeps partition count a
    pure function of the cluster, never of the data (deterministic output
    either way: partition_fn always sees whole key groups)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(16, 2 * cpus)


def default_actor_pool(min_size: int = 1) -> tuple[int, int]:
    """CPU-proportional actor-pool bounds for ``map_batches(Cls,
    concurrency=...)``: autoscale from ``min_size`` up to half the
    cluster's CPUs (floor 8). A hardcoded (1, 8) cap silently starves a
    256-node cluster; Ray's pools ramp lazily from the minimum, so a
    large max costs nothing at suite scale (the actor-ramp pitfall note)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return (min_size, max(8, cpus // 2))


PREFIX_SENTINEL = np.iinfo(np.int64).min


def prefix_max_exclusive(
    ds: "ray.data.Dataset", value_col: str, out_col: str = "prev_max"
) -> "ray.data.Dataset":
    """Distributed EXCLUSIVE running max over a globally-ordered dataset:
    row i gets max(value[0..i-1]), PREFIX_SENTINEL for the first row — the
    prefix-scan primitive behind event-time watermarks (late_events).
    ``ds`` must already be globally sorted in the scan order (``ds.sort``).

    Shape (the zip_with_index machinery): per-block maxima via one tiny task
    per block, the exclusive cummax of those carries on the driver
    (O(blocks), never O(rows)), then one task per block computes the
    in-block exclusive cummax seeded by its carry. No exchange beyond the
    caller's sort."""
    mat = ds.materialize()
    refs = mat.to_arrow_refs()
    if not refs:
        return mat

    @ray.remote
    def block_max(t: pa.Table) -> int:
        # sort can emit schema-less empty blocks (partitions > rows)
        if value_col not in t.column_names or len(t) == 0:
            return PREFIX_SENTINEL
        return int(t.column(value_col).to_numpy().max())

    maxes = np.array(ray.get([block_max.remote(r) for r in refs]), np.int64)
    carries = np.concatenate([[PREFIX_SENTINEL], np.maximum.accumulate(maxes)[:-1]])

    @ray.remote
    def add_prev(t: pa.Table, carry: int) -> pa.Table:
        if value_col not in t.column_names:
            return t.append_column(out_col, pa.array([], pa.int64()))
        v = t.column(value_col).to_numpy().astype(np.int64)
        if len(v):
            shifted = np.concatenate([[PREFIX_SENTINEL], np.maximum.accumulate(v)[:-1]])
            prev = np.maximum(shifted, carry)
        else:
            prev = v
        return t.append_column(out_col, pa.array(prev))

    out_refs = [add_prev.remote(r, int(c)) for r, c in zip(refs, carries)]
    return ray.data.from_arrow_refs(out_refs)


def prefix_sum_inclusive(
    ds: "ray.data.Dataset", value_col: str, out_col: str = "run_sum"
) -> "ray.data.Dataset":
    """Distributed INCLUSIVE running sum over a globally-ordered dataset:
    row i gets sum(value[0..i]) — the scan primitive behind sweep-line
    operators (session_concurrency) and SQL's ``SUM(x) OVER (ORDER BY ...
    ROWS UNBOUNDED PRECEDING)``. ``ds`` must already be globally sorted in
    the scan order (``ds.sort``).

    Same two-pass shape as prefix_max_exclusive: per-block sums via one tiny
    task per block, the exclusive cumsum of those carries on the driver
    (O(blocks), never O(rows)), then one task per block adds its carry to
    the in-block inclusive cumsum. No exchange beyond the caller's sort."""
    mat = ds.materialize()
    refs = mat.to_arrow_refs()
    if not refs:
        return mat

    @ray.remote
    def block_sum(t: pa.Table) -> int:
        # sort can emit schema-less empty blocks (partitions > rows)
        if value_col not in t.column_names or len(t) == 0:
            return 0
        return int(t.column(value_col).to_numpy().sum())

    sums = np.array(ray.get([block_sum.remote(r) for r in refs]), np.int64)
    carries = np.concatenate([[0], np.cumsum(sums)[:-1]])

    @ray.remote
    def add_run(t: pa.Table, carry: int) -> pa.Table:
        if value_col not in t.column_names:
            return t.append_column(out_col, pa.array([], pa.int64()))
        v = t.column(value_col).to_numpy().astype(np.int64)
        return t.append_column(out_col, pa.array(np.cumsum(v) + carry if len(v) else v))

    out_refs = [add_run.remote(r, int(c)) for r, c in zip(refs, carries)]
    return ray.data.from_arrow_refs(out_refs)


def grouped_apply_bounded(
    ds: "ray.data.Dataset",
    key: str | list[str],
    per_group_fn,
    num_parts: int | None = None,
) -> "ray.data.Dataset":
    """groupby(key).map_groups with BOUNDED Ray-group count: Ray's map_groups
    pays ~ms Python overhead per group, catastrophic for >10k tiny groups
    (ways, doc names, LSH buckets). Keys are hash-partitioned into
    ``num_parts`` Ray groups; real per-key grouping happens inside each
    partition as an in-process pandas loop.

    ``per_group_fn(sub_df) -> df`` — same contract as map_groups' fn.
    Key hashing uses pandas' deterministic hash (stable across processes)."""
    if num_parts is None:
        num_parts = default_num_parts()
    keys = [key] if isinstance(key, str) else list(key)

    def add_part(batch: pa.Table) -> pa.Table:
        df_keys = batch.select(keys).to_pandas()
        h = pd.util.hash_pandas_object(df_keys, index=False).to_numpy()
        return batch.append_column("__gpart", pa.array((h % num_parts).astype(np.int32)))

    def apply_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__gpart"])
        outs = [per_group_fn(sub) for _, sub in g.groupby(keys, sort=False)]
        outs = [o for o in outs if o is not None and len(o)]
        if not outs:
            # ALWAYS return the fn's empty-frame schema — a bare DataFrame()
            # emits a schema-less block that breaks downstream Arrow ops
            return per_group_fn(g.iloc[0:0])
        return pd.concat(outs, ignore_index=True)

    return ds.map_batches(add_part, batch_format="pyarrow").groupby("__gpart").map_groups(
        apply_partition, batch_format="pandas"
    )


def hash_partitioned_apply(
    ds: "ray.data.Dataset",
    key: str | list[str],
    partition_fn,
    num_parts: int | None = None,
) -> "ray.data.Dataset":
    """Hash-partition rows by key into ``num_parts`` Ray groups and hand each
    WHOLE partition to ``partition_fn(df) -> df`` — for fully-vectorized
    per-partition kernels (reduceat over group boundaries etc.) where even an
    in-process per-group loop is too slow. ``num_parts=None`` → the adaptive
    CPU-proportional default (default_num_parts)."""
    if num_parts is None:
        num_parts = default_num_parts()
    keys = [key] if isinstance(key, str) else list(key)

    def add_part(batch: pa.Table) -> pa.Table:
        df_keys = batch.select(keys).to_pandas()
        h = pd.util.hash_pandas_object(df_keys, index=False).to_numpy()
        return batch.append_column("__gpart", pa.array((h % num_parts).astype(np.int32)))

    def apply_partition(g: pd.DataFrame) -> pd.DataFrame:
        return partition_fn(g.drop(columns=["__gpart"]))

    return ds.map_batches(add_part, batch_format="pyarrow").groupby("__gpart").map_groups(
        apply_partition, batch_format="pandas"
    )
