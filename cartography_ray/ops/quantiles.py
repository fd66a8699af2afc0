"""Grouped quantiles: an exact reducer-side operator (the oracle-checkable
member) and a mergeable fixed-bin histogram sketch (the 100-TB path).

Exact quantiles are not combinable — every value of a group must reach
one reducer — so ``grouped_quantiles`` is positioned like the engine's
other exact/approximate pairs (exact cosine near-dup vs LSH-ANN): use it
when per-group row volume fits a reducer (bounded group count ×
activity), and switch to ``grouped_quantile_sketch`` when it doesn't.

The sketch is two passes over the data, both combiner-friendly:
pass 1 computes per-group (min, max) with per-batch partials; pass 2
bins every value into ``num_bins`` equal-width buckets of its group's
range and sums (group, bin) counts — a histogram is mergeable by
addition, so hot groups collapse to ≤num_bins rows per input block
before the shuffle. Quantiles are interpolated inside each bucket,
giving a deterministic estimate with absolute error ≤ one bin width
(= group range / num_bins).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from cartography_ray.ops.agg import _to_clean_arrow


def _q_cols(qs: list[float]) -> list[str]:
    return [f"p{int(round(q * 100)):02d}" for q in qs]


def grouped_quantiles(
    ds,
    keys: list[str] | str,
    value_col: str,
    qs: list[float],
    num_buckets: int = 64,
    num_partitions: int | None = None,
    method: str = "linear",
):
    """Exact quantiles per group. ``method='linear'`` is numpy 'linear'
    == SQL ``quantile_cont`` (double output); ``method='disc'`` is numpy
    'inverted_cdf' == SQL ``quantile_disc`` (verified elementwise) and
    returns ACTUAL ELEMENTS, preserving the input dtype — on integer
    cents the disc oracle is integer-exact, no float convention needed.
    One hash shuffle on the group key; every value of a group lands on
    one reducer (exactness requires it).

    Output columns: keys + ``n`` + one ``pNN`` column per requested
    quantile.
    """
    if method not in ("linear", "disc"):
        raise ValueError(f"grouped_quantiles: unknown method {method!r}")
    np_method = "linear" if method == "linear" else "inverted_cdf"
    keys = [keys] if isinstance(keys, str) else list(keys)
    qcols = _q_cols(qs)

    def tag(batch: pd.DataFrame) -> pa.Table:
        h = pd.util.hash_pandas_object(batch[keys], index=False).to_numpy()
        out = batch[keys + [value_col]].copy()
        out["__gb"] = (h % num_buckets).astype("int64")
        return _to_clean_arrow(out)

    def kernel(group: pd.DataFrame) -> pa.Table:
        g = group.groupby(keys, sort=False)
        rows = []
        for gk, sub in g:
            gk = gk if isinstance(gk, tuple) else (gk,)
            v = sub[value_col].to_numpy()
            if method == "linear":
                v = v.astype("float64")
            qv = np.quantile(v, qs, method=np_method)
            rows.append((*gk, len(v), *qv))
        out = pd.DataFrame(rows, columns=keys + ["n"] + qcols)
        out["n"] = out["n"].astype("int64")
        if method == "disc":
            for c in qcols:
                out[c] = out[c].astype(group[value_col].dtype)
        return _to_clean_arrow(out)

    from cartography_ray.runtime import drop_empty_blocks

    tagged = ds.map_batches(tag, batch_format="pandas")
    return drop_empty_blocks(
        tagged.groupby("__gb", num_partitions=num_partitions).map_groups(
            kernel, batch_format="pandas"
        )
    )


def grouped_quantile_sketch(
    ds,
    keys: list[str] | str,
    value_col: str,
    qs: list[float],
    num_bins: int = 4096,
    num_partitions: int | None = None,
):
    """Approximate grouped quantiles via a mergeable equal-width
    histogram sketch; deterministic, absolute error ≤ group range /
    ``num_bins``.

    Group CARDINALITY must be bounded (the per-group (min, max) table is
    broadcast via ``ray.put``); per-group ROW volume is unbounded — a
    group contributes at most ``num_bins`` counter rows per input block
    to the shuffle regardless of its size, which is the whole point.

    Output columns: keys + ``n`` + one ``pNN`` column per quantile.
    """
    import ray

    from cartography_ray.ops.agg import partial_groupby_agg

    keys = [keys] if isinstance(keys, str) else list(keys)
    qcols = _q_cols(qs)
    qs_arr = np.asarray(qs, dtype="float64")

    # pass 1: per-group bounds (combiner-friendly min/max partials)
    mm = partial_groupby_agg(
        ds, keys, {"__min": (value_col, "min"), "__max": (value_col, "max")},
        num_partitions=num_partitions,
    ).to_pandas()
    mm = mm.set_index(keys if len(keys) > 1 else keys[0])
    bounds_ref = ray.put(
        {k: (float(r["__min"]), float(r["__max"])) for k, r in mm.iterrows()}
    )

    # pass 2: per-batch (group, bin) counts — mergeable by addition
    def binize(batch: pd.DataFrame) -> pa.Table:
        bounds = ray.get(bounds_ref)
        bdf = pd.DataFrame(
            [
                ((k if isinstance(k, tuple) else (k,)) + (lo, hi))
                for k, (lo, hi) in bounds.items()
            ],
            columns=keys + ["__lo", "__hi"],
        )
        j = batch[keys + [value_col]].merge(bdf, on=keys, how="left")
        lo = j["__lo"].to_numpy(dtype="float64")
        hi = j["__hi"].to_numpy(dtype="float64")
        v = j[value_col].to_numpy(dtype="float64")
        width = np.where(hi > lo, hi - lo, 1.0)
        b = np.clip(((v - lo) / width * num_bins).astype("int64"), 0, num_bins - 1)
        out = j[keys].copy()
        out["__bin"] = b
        return _to_clean_arrow(out)

    counts = partial_groupby_agg(
        ds.map_batches(binize, batch_format="pandas"),
        keys + ["__bin"],
        {"cnt": (None, "count")},
        num_partitions=num_partitions,
    )

    # finalize: cumulative histogram → within-bin linear interpolation.
    # The (group × num_bins) count table is sketch-sized, not data-sized.
    def interp(group: pd.DataFrame) -> pa.Table:
        bounds = ray.get(bounds_ref)
        rows = []
        for gk, sub in group.groupby(keys, sort=False):
            gk = gk if isinstance(gk, tuple) else (gk,)
            lo, hi = bounds[gk if len(keys) > 1 else gk[0]]
            width = (hi - lo) if hi > lo else 1.0
            s = sub.sort_values("__bin")
            bins = s["__bin"].to_numpy()
            cnt = s["cnt"].to_numpy(dtype="float64")
            n = cnt.sum()
            cum = np.cumsum(cnt)
            ranks = qs_arr * (n - 1) + 1  # 1-based target rank, quantile_cont style
            idx = np.searchsorted(cum, ranks, side="left")
            idx = np.clip(idx, 0, len(bins) - 1)
            prev = np.where(idx > 0, cum[idx - 1], 0.0)
            within = (ranks - prev) / np.maximum(cnt[idx], 1.0)
            est = lo + (bins[idx] + np.clip(within, 0.0, 1.0)) * (width / num_bins)
            rows.append((*gk, int(n), *est))
        out = pd.DataFrame(rows, columns=keys + ["n"] + qcols)
        out["n"] = out["n"].astype("int64")
        return _to_clean_arrow(out)

    # the count table is bounded (groups × num_bins) — a single-partition
    # groupby finalize is a driver-sized step, not a data-sized one
    from cartography_ray.runtime import drop_empty_blocks

    def tag_small(batch: pd.DataFrame) -> pa.Table:
        hh = pd.util.hash_pandas_object(batch[keys], index=False).to_numpy()
        batch = batch.copy()
        batch["__gb2"] = (hh % 16).astype("int64")
        return _to_clean_arrow(batch)

    return drop_empty_blocks(
        counts.map_batches(tag_small, batch_format="pandas")
        .groupby("__gb2", num_partitions=8)
        .map_groups(interp, batch_format="pandas")
    )


def grouped_mad(
    ds,
    keys: list[str] | str,
    value_col: str,
    num_buckets: int = 64,
    num_partitions: int | None = None,
):
    """Exact grouped median absolute deviation — the robust-statistics
    sibling of ``grouped_quantiles``, in PURE int64 (no float convention
    needed): with integer inputs every median is a multiple of ½, so
    the op returns ``med2 = 2·median(v)`` and ``mad4 = 4·MAD =
    2·median(|2v − med2|)``, both exact integers computed by sorted
    middle-element arithmetic (never ``np.quantile``). The SQL twin
    doubles ``quantile_cont`` the same way (a ½-multiple doubled is an
    exactly-representable whole double → BIGINT cast is lossless).

    One hash shuffle on the group key (every value of a group on one
    reducer — the ``grouped_quantiles`` exactness contract); both
    medians and the deviation pass run inside the same kernel, so MAD
    costs the SAME single shuffle as a plain median.

    Output columns: keys + ``n`` + ``med2`` + ``mad4`` (int64).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)

    def _med2(v: np.ndarray) -> int:
        # 2·median as an exact int: middle element(s) of the sort
        v = np.sort(v, kind="stable")
        n = len(v)
        mid = n // 2
        return int(2 * v[mid]) if n % 2 else int(v[mid - 1] + v[mid])

    def tag(batch: pd.DataFrame) -> pa.Table:
        h = pd.util.hash_pandas_object(batch[keys], index=False).to_numpy()
        out = batch[keys + [value_col]].copy()
        out["__gb"] = (h % num_buckets).astype("int64")
        return _to_clean_arrow(out)

    def kernel(group: pd.DataFrame) -> pa.Table:
        g = group.groupby(keys, sort=False)
        rows = []
        for gk, sub in g:
            gk = gk if isinstance(gk, tuple) else (gk,)
            v = sub[value_col].to_numpy().astype("int64")
            med2 = _med2(v)
            dev2 = np.abs(2 * v - med2)
            rows.append((*gk, len(v), med2, _med2(dev2)))
        out = pd.DataFrame(rows, columns=keys + ["n", "med2", "mad4"])
        for c in ("n", "med2", "mad4"):
            out[c] = out[c].astype("int64")
        return _to_clean_arrow(out)

    from cartography_ray.runtime import drop_empty_blocks

    tagged = ds.map_batches(tag, batch_format="pandas")
    return drop_empty_blocks(
        tagged.groupby("__gb", num_partitions=num_partitions).map_groups(
            kernel, batch_format="pandas"
        )
    )
