"""Aggregations over Ray Datasets (SURVEY.md §2.6).

The reference registers every agg in search/SearchModule.java:363 as a
partial-per-shard + final-reduce pair; Ray Data's two-phase
groupby/aggregate is the same shape, so metric and bucket aggs map onto
`groupby().aggregate(...)` (pre-aggregated where useful) and pipeline aggs
are driver-side post-processing on the already-tiny reduced table
(SearchModule.java:479 family).

Every function takes/returns Datasets or small pandas frames and never calls
ray.init. Column naming matches the oracle SQL in __ray_entry__.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def terms_agg(ds, key: str, value: str | None = None, size: int | None = None):
    """`terms` bucket agg (bucket/terms/TermsAggregator.java): doc_count per
    key (+ optional sum of a metric), ordered by count desc then key asc.
    Returns a small pandas frame."""
    from ray.data.aggregate import Count, Sum

    aggs = [Count(alias_name="doc_count")]
    if value is not None:
        aggs.append(Sum(value, alias_name=f"sum_{value}"))
    out = ds.groupby(key).aggregate(*aggs).to_pandas()
    out = out.sort_values(["doc_count", key], ascending=[False, True]).reset_index(drop=True)
    if size is not None:
        out = out.head(size)
    return out


def date_histogram(ds, ts_col: str, interval: str = "day", value: str | None = None):
    """`date_histogram` (bucket/histogram/): floor timestamps to the interval
    (common/rounding/Rounding.java analog via pc.floor_temporal), then count
    (+ optional sum)."""
    from ray.data.aggregate import Count, Sum

    # DateHistogramInterval calendar units (search/aggregations/bucket/
    # histogram/DateHistogramInterval.java)
    unit = {"second": "second", "minute": "minute", "hour": "hour",
            "day": "day", "week": "week", "month": "month",
            "quarter": "quarter", "year": "year"}[interval]

    def bucketize(t: pa.Table) -> pa.Table:
        # int64 epoch keys through the shuffle (datetime keys trip Ray's
        # numpy datetime precision coercion warning per worker); normalized
        # to MICROSECONDS here so the restore below is unit-correct for
        # second/milli/nano source columns too
        floored = pc.floor_temporal(t[ts_col], unit=unit)
        b = pc.cast(pc.cast(floored, pa.timestamp("us")), pa.int64())
        return t.append_column("bucket", b)

    aggs = [Count(alias_name="doc_count")]
    if value is not None:
        aggs.append(Sum(value, alias_name=f"sum_{value}"))
    out = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(*aggs)
        .to_pandas()
    )
    import pandas as _pd

    out["bucket"] = _pd.to_datetime(out["bucket"], unit="us")
    return out.sort_values("bucket").reset_index(drop=True)


def histogram(ds, col: str, width: float):
    """numeric `histogram`: bucket = floor(v / width) * width."""
    from ray.data.aggregate import Count

    def bucketize(t: pa.Table) -> pa.Table:
        v = np.asarray(t[col].to_numpy(zero_copy_only=False), np.float64)
        b = np.floor(v[~np.isnan(v)] / width) * width
        return pa.table({"bucket": pa.array(b)})

    out = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Count(alias_name="doc_count"))
        .to_pandas()
    )
    return out.sort_values("bucket").reset_index(drop=True)


def stats_agg(ds, key: str | None, value: str):
    """`stats` metric agg: count/min/max/sum/avg (per group when key given)."""
    from ray.data.aggregate import Count, Max, Mean, Min, Sum

    aggs = [
        Count(alias_name="cnt"),
        Min(value, alias_name="min_v"),
        Max(value, alias_name="max_v"),
        Sum(value, alias_name="sum_v"),
        Mean(value, alias_name="avg_v"),
    ]
    if key:
        out = ds.groupby(key).aggregate(*aggs).to_pandas()
        out = out.sort_values(key).reset_index(drop=True)
    else:
        out = pd.DataFrame([ds.aggregate(*aggs)])
    return out


def extended_stats(ds, key: str, value: str):
    """`extended_stats`: stats + sum_of_squares/variance/std via mergeable
    (count, sum, sum2) partials computed batch-side then reduced — the
    pre-aggregation pattern (partial per map_batches, tiny final groupby)."""

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.select([key, value]).to_pandas()
        g = df.groupby(key)[value].agg(cnt="count", s="sum", s2=lambda x: float((x**2).sum()))
        g = g.reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    red = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Sum("cnt", alias_name="cnt"), Sum("s", alias_name="s"),
                   Sum("s2", alias_name="s2"))
        .to_pandas()
    )
    red["avg_v"] = red["s"] / red["cnt"]
    red["variance"] = red["s2"] / red["cnt"] - red["avg_v"] ** 2
    red["std_dev"] = np.sqrt(np.maximum(red["variance"], 0))
    return red.sort_values(key).reset_index(drop=True)


def value_count_distinct(ds, key: str, value: str):
    """exact `cardinality` per key: batch-local distinct (combiner — cuts
    the shuffle to unique pairs per block) -> ONE bucketed exchange on
    hash(key, value) (NOT a groupby over the distinct pairs themselves —
    Ray's sort-based groupby pays per-GROUP cost at pair cardinality;
    see functions/exchange.py) -> in-bucket distinct + per-key partial
    counts -> driver folds keys x buckets tiny rows. A pair lands in
    exactly one bucket, so partial counts sum exactly. The HLL++ sketch
    in hll.py is the approximate path."""
    import zlib

    def local_distinct(t):
        return t.group_by([key, value]).aggregate([])

    def bucket(t: "pa.Table") -> "pa.Table":
        n = t.num_rows
        hb = np.zeros(n, np.uint64)
        for col_name in (key, value):
            col = t[col_name]
            if pa.types.is_string(col.type) or pa.types.is_large_string(
                    col.type):
                h = np.fromiter((zlib.crc32(x.encode())
                                 for x in col.to_pylist()), np.uint64, n)
            else:
                h = col.to_numpy(zero_copy_only=False).astype(np.uint64)
            hb = hb * np.uint64(1000003) + h
        return t.append_column("_xb", pa.array((hb % 64).astype(np.int64)))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates([key, value])
        return (d.groupby(key, as_index=False).size()
                .rename(columns={"size": "distinct_count"}))

    parts = (ds.select_columns([key, value])
             .map_batches(local_distinct, batch_format="pyarrow")
             .map_batches(bucket, batch_format="pyarrow")
             .groupby("_xb").map_groups(merge, batch_format="pandas")
             .to_pandas())
    out = parts.groupby(key, as_index=False)["distinct_count"].sum()
    out["distinct_count"] = out["distinct_count"].astype("int64")
    return out.sort_values(key).reset_index(drop=True)


def cardinality_hll(ds, value: str, p: int = 14) -> float:
    """approximate global cardinality via the HLL++ sketch AggregateFn."""
    from .hll import hll_aggregate_fn

    res = ds.aggregate(hll_aggregate_fn(value, alias="cardinality", p=p))
    return float(res["cardinality"] if isinstance(res, dict) else res)


def percentiles(ds, value: str, qs: list[float], compression: float = 100.0):
    """`percentiles` via the T-Digest AggregateFn."""
    from .tdigest import tdigest_aggregate_fn

    res = ds.aggregate(tdigest_aggregate_fn(value, qs, compression=compression))
    return res["percentiles"] if isinstance(res, dict) else res


def composite_agg(ds, keys: list[str], size: int | None = None, after: tuple | None = None):
    """`composite` agg: multi-source buckets in key order with search_after-
    style pagination."""
    from ray.data.aggregate import Count

    out = ds.groupby(keys).aggregate(Count(alias_name="doc_count")).to_pandas()
    out = out.sort_values(keys).reset_index(drop=True)
    if after is not None:
        # vectorized lexicographic tuple > after (no row-wise apply)
        gt = np.zeros(len(out), bool)
        eq = np.ones(len(out), bool)
        for k, a in zip(keys, after):
            col = out[k].to_numpy()
            gt |= eq & (col > a)
            eq &= col == a
        out = out[gt]
    if size is not None:
        out = out.head(size)
    return out.reset_index(drop=True)


def top_hits_per_group(ds, key: str, sort_col: str, n: int = 1, descending: bool = True):
    """`top_hits` / field-collapse analog: best n rows per key
    (search/collapse/CollapseBuilder.java mapping: gb(key).map_groups(head))."""

    def head(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(sort_col, ascending=not descending).head(n)

    return ds.groupby(key).map_groups(head, batch_format="pandas")


# ---------- pipeline aggregations (driver-side over the reduced table) ----------


def cumulative_sum(frame: pd.DataFrame, col: str, out_col: str = "cumulative"):
    frame = frame.copy()
    frame[out_col] = frame[col].cumsum()
    return frame


def derivative(frame: pd.DataFrame, col: str, out_col: str = "deriv"):
    frame = frame.copy()
    frame[out_col] = frame[col].diff()
    return frame


def moving_avg(frame: pd.DataFrame, col: str, window: int = 3, out_col: str = "moving_avg"):
    frame = frame.copy()
    frame[out_col] = frame[col].rolling(window, min_periods=1).mean()
    return frame


def serial_diff(frame: pd.DataFrame, col: str, lag: int = 1, out_col: str = "serial_diff"):
    frame = frame.copy()
    frame[out_col] = frame[col].diff(lag)
    return frame


def bucket_selector(frame: pd.DataFrame, predicate) -> pd.DataFrame:
    return frame[frame.apply(predicate, axis=1)].reset_index(drop=True)


def bucket_sort(frame: pd.DataFrame, by: list[str], ascending=True, size=None):
    out = frame.sort_values(by, ascending=ascending).reset_index(drop=True)
    return out.head(size) if size else out


def missing_agg(ds, key: str, field: str):
    """`missing` bucket agg (bucket/missing/MissingAggregator.java): per-key
    count of docs with no value for `field` (null). Distributed: per-batch
    0/1 indicator + Sum groupby."""
    from ray.data.aggregate import Sum

    def indicator(t: pa.Table) -> pa.Table:
        miss = pc.cast(pc.is_null(t[field]), pa.int64())
        return pa.table({key: t[key], "is_missing": miss})

    out = (
        ds.map_batches(indicator, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Sum("is_missing", alias_name="doc_count"))
        .to_pandas()
    )
    return out.sort_values(key).reset_index(drop=True)


def exact_quantile(ds, col: str, q: float) -> float:
    """Exact quantile with linear interpolation (quantile_cont semantics) via
    a DISTRIBUTED sort + positional row take: sort(col), split at the two
    covering row indices, read only those 1-2 rows. The all-to-all sort is the
    price of exactness; the approximate scale path is the t-digest
    (tdigest.py). Never collects the column to the driver."""
    n = ds.count()
    if n == 0:
        return float("nan")
    pos = q * (n - 1)
    lo, hi = int(np.floor(pos)), int(np.ceil(pos))
    # strip parquet/pandas schema metadata: Ray's sort-shuffle block dedup
    # can't hash dict-valued metadata and logs per-reduce warnings otherwise
    s = ds.map_batches(
        lambda t: t.select([col]).replace_schema_metadata(None),
        batch_format="pyarrow",
    ).sort(col)
    mid = s.split_at_indices([lo, hi + 1])[1]
    vals = [r[col] for r in mid.take(2)]
    if lo == hi:
        return float(vals[0])
    frac = pos - lo
    return float(vals[0]) + frac * (float(vals[1]) - float(vals[0]))


def median_absolute_deviation(ds, col: str) -> float:
    """`median_absolute_deviation` (metrics/MedianAbsoluteDeviationAggregator
    .java semantics, computed EXACTLY): median(|x - median(x)|) as two
    distributed exact-median passes (the reference uses a t-digest sketch;
    the exact form makes the value oracle-checkable)."""
    med = exact_quantile(ds, col, 0.5)

    def dev(t: pa.Table) -> pa.Table:
        return pa.table({"dev": pc.abs(pc.subtract(t[col], med))})

    return exact_quantile(ds.map_batches(dev, batch_format="pyarrow"), "dev", 0.5)


def moving_avg_ewma(frame: pd.DataFrame, col: str, alpha: float = 0.3,
                    out_col: str = "ewma"):
    """moving_avg `ewma` model (pipeline/MovAvgModel EwmaModel): s_0 = x_0,
    s_i = alpha*x_i + (1-alpha)*s_{i-1} — over the (already tiny) reduced
    bucket frame."""
    frame = frame.copy()
    x = frame[col].to_numpy(dtype=np.float64)
    s = np.empty_like(x)
    if x.size:
        s[0] = x[0]
        for i in range(1, x.size):
            s[i] = alpha * x[i] + (1 - alpha) * s[i - 1]
    frame[out_col] = s
    return frame


def moving_avg_holt(frame: pd.DataFrame, col: str, alpha: float = 0.3,
                    beta: float = 0.1, out_col: str = "holt"):
    """moving_avg `holt` (double-exponential) model: level + trend."""
    frame = frame.copy()
    x = frame[col].to_numpy(dtype=np.float64)
    out = np.empty_like(x)
    if x.size:
        level, trend = x[0], 0.0
        out[0] = x[0]
        for i in range(1, x.size):
            prev = level
            level = alpha * x[i] + (1 - alpha) * (level + trend)
            trend = beta * (level - prev) + (1 - beta) * trend
            out[i] = level
    frame[out_col] = out
    return frame


def terms_agg_options(ds, key: str, value: str | None = None, *,
                      order: tuple[str, str] | None = None,
                      min_doc_count: int = 1,
                      include: str | None = None, exclude: str | None = None,
                      missing=None, size: int | None = None):
    """`terms` agg OPTIONS (bucket/terms/TermsAggregationBuilder +
    support/IncludeExclude): `missing` fills null keys into their own bucket,
    include/exclude regexes prune keys BEFORE the shuffle (the reference
    filters ordinals at collect time — same effect, and at scale it shrinks
    the exchange), `min_doc_count` filters the reduced table, `order` is
    ('_key'|'_count'|<metric column>, 'asc'|'desc') with key-asc tie-break."""
    from ray.data.aggregate import Count, Sum

    def bucketize(t: pa.Table) -> pa.Table:
        k = t[key]
        if missing is not None:
            k = pc.fill_null(k, missing)
        cols = {key: k}
        if value is not None:
            cols[value] = t[value]
        t2 = pa.table(cols)
        m = None
        if include is not None:
            m = pc.match_substring_regex(k, f"^(?:{include})$")
        if exclude is not None:
            me = pc.invert(pc.match_substring_regex(k, f"^(?:{exclude})$"))
            m = me if m is None else pc.and_(m, me)
        return t2.filter(m) if m is not None else t2

    aggs = [Count(alias_name="doc_count")]
    if value is not None:
        aggs.append(Sum(value, alias_name=f"sum_{value}"))
    out = (ds.map_batches(bucketize, batch_format="pyarrow")
           .groupby(key).aggregate(*aggs).to_pandas())
    if min_doc_count > 1:
        out = out[out["doc_count"] >= min_doc_count]
    col, direction = order or ("_count", "desc")
    asc = direction == "asc"
    if col == "_key":
        out = out.sort_values(key, ascending=asc)
    elif col == "_count":
        out = out.sort_values(["doc_count", key], ascending=[asc, True])
    else:
        out = out.sort_values([col, key], ascending=[asc, True])
    out = out.reset_index(drop=True)
    if size is not None:
        out = out.head(size)
    return out


def histogram_options(ds, col: str, width: float, *, offset: float = 0.0,
                      min_doc_count: int = 1,
                      extended_bounds: tuple[float, float] | None = None):
    """numeric `histogram` OPTIONS (HistogramAggregationBuilder): bucket =
    floor((v - offset) / width) * width + offset; min_doc_count=0 emits
    empty buckets over [min(data, extended_bounds.lo), max(data,
    extended_bounds.hi)] — the empty-bucket fill happens on the tiny reduced
    table (InternalHistogram#addEmptyBuckets is a reduce-phase step too).
    Buckets travel the shuffle as int64 indices (exact fp-free keys)."""
    from ray.data.aggregate import Count

    def bucketize(t: pa.Table) -> pa.Table:
        v = np.asarray(t[col].to_numpy(zero_copy_only=False), np.float64)
        v = v[~np.isnan(v)]  # docs missing the field fall out, like the ref
        n = np.floor((v - offset) / width).astype(np.int64)
        return pa.table({"n": pa.array(n)})

    out = (ds.map_batches(bucketize, batch_format="pyarrow")
           .groupby("n").aggregate(Count(alias_name="doc_count")).to_pandas())
    if len(out) == 0:
        return pd.DataFrame({"bucket": pd.array([], dtype="float64"),
                             "doc_count": pd.array([], dtype="int64")})
    if min_doc_count == 0:
        lo, hi = int(out["n"].min()), int(out["n"].max())
        if extended_bounds is not None:
            lo = min(lo, int(np.floor((extended_bounds[0] - offset) / width)))
            hi = max(hi, int(np.floor((extended_bounds[1] - offset) / width)))
        out = (out.set_index("n")
               .reindex(range(lo, hi + 1), fill_value=0)
               .rename_axis("n").reset_index())
        out["doc_count"] = out["doc_count"].astype("int64")
    elif min_doc_count > 1:
        out = out[out["doc_count"] >= min_doc_count]
    out["bucket"] = out["n"] * width + offset
    return (out.sort_values("bucket").reset_index(drop=True)
            [["bucket", "doc_count"]])


def date_histogram_tz(ds, ts_col: str, *, interval: str = "day",
                      tz_minutes: int = 0, offset_minutes: int = 0):
    """`date_histogram` time_zone + offset (common/Rounding.java builder:
    fixed-offset zone rounding with the offset subtracted before and added
    back after): bucket = trunc_interval(ts - offset + tz) - tz + offset,
    keys reported back in UTC. Integer epoch-micro arithmetic end to end so
    the DuckDB oracle reproduces it exactly."""
    from ray.data.aggregate import Count

    us = {"day": 86_400_000_000, "hour": 3_600_000_000}[interval]
    tz = tz_minutes * 60_000_000
    off = offset_minutes * 60_000_000

    def bucketize(t: pa.Table) -> pa.Table:
        # normalize to epoch-us first: the tz/offset arithmetic below is in
        # microseconds regardless of the column's native unit
        v = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                    pa.int64()).to_numpy()
        b = (v - off + tz) // us * us - tz + off
        return pa.table({"bucket": pa.array(b)})

    out = (ds.map_batches(bucketize, batch_format="pyarrow")
           .groupby("bucket").aggregate(Count(alias_name="doc_count"))
           .to_pandas())
    out["bucket"] = pd.to_datetime(out["bucket"], unit="us")
    return out.sort_values("bucket").reset_index(drop=True)


def holt_winters_forecast(values, alpha: float, beta: float, gamma: float,
                          period: int):
    """MovingFunctions.holtWinters (server/.../search/aggregations/pipeline/
    MovingFunctions.java:240-321, additive mode): triple-exponential
    smoothing with ES's exact seeding — level = mean of season 1, trend =
    mean of per-period slopes divided by period AGAIN (the Java
    `b += (vs[i+p]-vs[i])/p; b /= p` double division), initial seasonal =
    vs[i]/s0 (a DIVISION even in additive mode), and the reference's
    seasonal-update quirk `vs[i] - (last_s - last_b)` (minus, where
    textbook HW uses the previous level+trend). Returns (one-step
    forecast, final level, final trend) — forecast = s + b +
    seasonal[n - period]."""
    vs = [float(v) for v in values]
    n = len(vs)
    if n < 2 * period:
        raise ValueError("holt_winters needs >= 2*period points")
    s = 0.0
    b = 0.0
    for i in range(period):
        s += vs[i]
        b += (vs[i + period] - vs[i]) / period
    s /= period
    b /= period
    last_s, last_b = s, b
    seasonal = [0.0] * n
    if s != 0.0:
        for i in range(period):
            seasonal[i] = vs[i] / s
    for i in range(period, n):
        s = alpha * (vs[i] - seasonal[i - period]) + (1.0 - alpha) * (last_s + last_b)
        b = beta * (s - last_s) + (1.0 - beta) * last_b
        seasonal[i] = (gamma * (vs[i] - (last_s - last_b))
                       + (1.0 - gamma) * seasonal[i - period])
        last_s, last_b = s, b
    return s + b + seasonal[n - period], s, b
