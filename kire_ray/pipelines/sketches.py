"""Distributed cardinality sketches.

``hll_distinct`` — HyperLogLog (Flajolet et al. 2007) over a key
column, optionally grouped: the classic constant-memory distinct-count
sketch a 100 TB pipeline uses where ``count(DISTINCT …)`` would
shuffle the full key set (the exact counterpart here is
``events_distinct_users``).  The register hash is md5-derived (first
15 hex chars → 60-bit integer, like the repo's simhash/LSH family) so
the whole sketch — registers, harmonic sum, small-range correction —
is reconstructible bit-for-bit in DuckDB SQL and the driver verifies
the *estimate* value-exactly, not just "runs".

Distributed shape: per-batch partial registers (max rho per (group,
bucket) — a Counter-style combiner, output ≤ groups × m rows per
block) → one grouped exchange → per-group finalization.  Shuffle
volume is O(groups × m × blocks), never the data.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray.data

from kire_ray.functions.rounding import round_half_up

HLL_B = 10                 # 2^10 = 1024 registers
HLL_M = 1 << HLL_B
_W_BITS = 60 - HLL_B       # 60-bit hash (15 md5 hex chars: BIGINT-safe in SQL)
_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Vectorized exact bit_length (log2 floats misround near 2^53)."""
    bl = np.zeros(w.shape, dtype=np.int64)
    v = w.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = v >= (np.int64(1) << s)
        bl[m] += s
        v[m] >>= s
    bl[w > 0] += 1
    return bl


def hll_distinct(
    ds: "ray.data.Dataset",
    key_col: str,
    *,
    group_col: str | None = None,
) -> "ray.data.Dataset":
    """HLL distinct-count estimate per ``group_col`` (one global row if
    None). Returns (group, estimate, v_zero): ``estimate`` is the
    bias-corrected harmonic-mean estimate with the standard small-range
    linear-counting correction (E ≤ 2.5m and empty registers present),
    ``v_zero`` the empty-register count."""
    from kire_ray.stages.shuffle import grouped_agg, partitioned_map_groups

    group_keys = [group_col] if group_col else []

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        keys = b[key_col].astype(str)
        codes, uniq = pd.factorize(keys, sort=False)
        h = np.fromiter(
            (
                int(hashlib.md5(str(u).encode("utf-8")).hexdigest()[:15], 16)
                for u in uniq
            ),
            dtype=np.int64,
            count=len(uniq),
        )[codes]
        bucket = h >> _W_BITS
        w = h & ((np.int64(1) << _W_BITS) - 1)
        rho = np.where(w == 0, _W_BITS + 1, _W_BITS + 1 - _bit_length_u64(w))
        out = pd.DataFrame({"bucket": bucket, "rho": rho})
        for g in group_keys:
            out[g] = b[g].to_numpy()
        return (
            out.groupby([*group_keys, "bucket"], sort=False)
            .agg(rho=("rho", "max"))
            .reset_index()
        )

    regs = grouped_agg(
        ds.map_batches(partial, batch_format="pandas"),
        [*group_keys, "bucket"],
        {"rho": ("rho", "max")},
    )

    def finalize(part: pd.DataFrame) -> pd.DataFrame:
        cols = {g: [] for g in group_keys}
        cols.update({"estimate": [], "v_zero": []})
        if part.empty:
            return pd.DataFrame(cols).astype({"estimate": np.float64, "v_zero": np.int64})
        for gkey, grp in (
            part.groupby(group_keys, sort=False) if group_keys else [((), part)]
        ):
            rho = grp["rho"].to_numpy(np.int64)
            n_present = len(rho)
            s = float(np.ldexp(1.0, -rho).sum()) + float(HLL_M - n_present)
            v0 = HLL_M - n_present + int((rho == 0).sum())
            e = _ALPHA * float(HLL_M) * float(HLL_M) / s
            if e <= 2.5 * HLL_M and v0 > 0:
                e = HLL_M * np.log(HLL_M / v0)
            for g, v in zip(group_keys, gkey if isinstance(gkey, tuple) else (gkey,)):
                cols[g].append(v)
            cols["estimate"].append(e)
            cols["v_zero"].append(v0)
        out = pd.DataFrame(cols)
        out["estimate"] = round_half_up(out["estimate"], 6)
        out["v_zero"] = out["v_zero"].astype(np.int64)
        return out

    if group_keys:
        return partitioned_map_groups(regs, group_keys, finalize)
    # global sketch: the register table is m rows — one reduce task.
    # batch_size=None = whole-block batches: finalize counts absent
    # registers as zero, so it MUST see the entire sketch at once (the
    # default 1024-row batching only worked because HLL_M == 1024;
    # review r5)
    return regs.repartition(1).map_batches(
        finalize, batch_format="pandas", batch_size=None
    )


CMS_D = 4                  # hash rows
CMS_W = 2048               # counters per row


def cms_heavy_hitters(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    k: int = 20,
) -> "ray.data.Dataset":
    """Count-Min heavy hitters: estimate every distinct token's count
    from a d×w counter sketch and return the top-``k`` by estimate
    (est desc, word asc) — the constant-memory frequency path beside
    the exact ``word_frequencies``. Estimates only ever over-count
    (min over d rows of colliding sums), and the entire sketch is
    integer arithmetic on md5-derived buckets, so the DuckDB oracle
    reproduces it bit-for-bit with no float rounding at all.

    Distributed shape: per-batch factorized token counts → d×w partial
    counter rows per block → one O(d×w×blocks) grouped exchange; the
    probe side walks the (vocab-bounded) distinct-word table against
    the broadcast counters. At an open web vocabulary, cap the probe
    set (e.g. block-local top candidates) — the sketch itself stays
    O(d×w) regardless.
    """
    from kire_ray.stages.shuffle import grouped_agg

    def _bucket(prefix: str, words) -> np.ndarray:
        return np.fromiter(
            (
                int(hashlib.md5(f"{prefix}_{w}".encode("utf-8")).hexdigest()[:15], 16)
                % CMS_W
                for w in words
            ),
            dtype=np.int64,
            count=len(words),
        )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b[text_col].str.split().explode()
        counts = toks.value_counts()
        words = counts.index.to_numpy(dtype=object)
        n = counts.to_numpy(np.int64)
        rows = []
        for j in range(CMS_D):
            buck = _bucket(str(j), words)
            g = pd.DataFrame({"row": np.int64(j), "bucket": buck, "n": n})
            rows.append(g.groupby(["row", "bucket"], sort=False).sum().reset_index())
        return pd.concat(rows, ignore_index=True)

    counters = (
        grouped_agg(
            ds.map_batches(partial, batch_format="pandas"),
            ["row", "bucket"],
            {"n": ("n", "sum")},
        )
        .to_pandas()  # d×w rows — the sketch, constant-size by design
    )
    C = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    C[counters["row"].to_numpy(np.int64), counters["bucket"].to_numpy(np.int64)] = (
        counters["n"].to_numpy(np.int64)
    )
    c_ref = ray.put(C)

    from kire_ray.pipelines.text_analysis import word_frequencies

    vocab = word_frequencies(ds, text_col=text_col).drop_columns(["n"])

    def probe(b: pd.DataFrame) -> pd.DataFrame:
        Cm = ray.get(c_ref)
        words = b["word"].to_numpy(dtype=object)
        est = np.full(len(words), np.iinfo(np.int64).max, dtype=np.int64)
        for j in range(CMS_D):
            est = np.minimum(est, Cm[j, _bucket(str(j), words)])
        return pd.DataFrame({"word": words, "est": est})

    ests = vocab.map_batches(probe, batch_format="pandas").to_pandas()
    top = (
        ests.sort_values(["est", "word"], ascending=[False, True], kind="stable")
        .head(k)
        .reset_index(drop=True)
    )
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    top["est"] = top["est"].astype(np.int64)
    return ray.data.from_pandas(top)


HIST_BINS = 2048


def hist_quantiles(
    ds: "ray.data.Dataset",
    value_col: str,
    *,
    group_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    bins: int = HIST_BINS,
) -> "ray.data.Dataset":
    """Approximate grouped quantiles from a fixed-width histogram — the
    deterministic, layout-invariant alternative to order-dependent
    digests (t-digest merges depend on insertion order; integer bin
    counts commute). Two passes: a tiny (group, min, max, n) exchange,
    then per-batch ``np.bincount`` partials → one O(groups×bins×blocks)
    exchange → per-group interpolation: for target rank t=q·n, the
    first bin with cum ≥ t gives est = mn + wd·(bin + (t-cum_before)/c).
    Exact-value parity with the SQL oracle (identical float expression
    order; the ±1e-9 rounding guard absorbs sum-order jitter).

    Returns (group, q, est).
    """
    from kire_ray.stages.shuffle import grouped_agg, partitioned_map_groups

    st = (
        grouped_agg(
            ds.map_batches(
                lambda b: b.groupby(group_col, sort=False)
                .agg(mn=(value_col, "min"), mx=(value_col, "max"), n=(value_col, "size"))
                .reset_index(),
                batch_format="pandas",
            ),
            [group_col],
            {"mn": ("mn", "min"), "mx": ("mx", "max"), "n": ("n", "sum")},
        )
        .to_pandas()
        .set_index(group_col)
    )
    ref = ray.put(st)

    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        stats = ray.get(ref)
        out = []
        for g, grp in b.groupby(group_col, sort=False):
            mn, mx = float(stats.loc[g, "mn"]), float(stats.loc[g, "mx"])
            v = grp[value_col].to_numpy(np.float64)
            if mx == mn:
                idx = np.zeros(len(v), dtype=np.int64)
            else:
                wd = (mx - mn) / float(bins)
                idx = np.minimum(
                    np.floor((v - mn) / wd).astype(np.int64), bins - 1
                )
            cnt = np.bincount(idx, minlength=0)
            nz = np.nonzero(cnt)[0]
            out.append(
                pd.DataFrame({group_col: g, "bin": nz, "c": cnt[nz].astype(np.int64)})
            )
        if not out:
            return pd.DataFrame({group_col: [], "bin": [], "c": []}).astype(
                {"bin": np.int64, "c": np.int64}
            )
        return pd.concat(out, ignore_index=True)

    hist = grouped_agg(
        ds.map_batches(hist_partial, batch_format="pandas"),
        [group_col, "bin"],
        {"c": ("c", "sum")},
    )

    def finalize(part: pd.DataFrame) -> pd.DataFrame:
        stats = ray.get(ref)
        rows = {group_col: [], "q": [], "est": []}
        for g, grp in part.groupby(group_col, sort=False):
            grp = grp.sort_values("bin")
            mn, mx = float(stats.loc[g, "mn"]), float(stats.loc[g, "mx"])
            n = int(stats.loc[g, "n"])
            wd = (mx - mn) / float(bins)
            cum = grp["c"].to_numpy(np.int64).cumsum()
            bins_arr = grp["bin"].to_numpy(np.int64)
            cs = grp["c"].to_numpy(np.int64)
            for q in qs:
                t = q * n
                if mx == mn:
                    est = mn
                else:
                    i = int(np.searchsorted(cum.astype(np.float64), t, side="left"))
                    i = min(i, len(cum) - 1)
                    before = int(cum[i]) - int(cs[i])
                    est = mn + wd * (float(bins_arr[i]) + (t - before) / float(cs[i]))
                rows[group_col].append(g)
                rows["q"].append(q)
                rows["est"].append(est)
        out = pd.DataFrame(rows)
        if len(out):
            out["est"] = round_half_up(out["est"], 6)
        return out

    return partitioned_map_groups(hist, [group_col], finalize)


def table_profile(
    ds: "ray.data.Dataset", columns: list[str]
) -> "ray.data.Dataset":
    """Per-column data profile — (column, n, n_null, distinct_est,
    v_zero) — the expectations/quality-report pass a pipeline runs
    before training: exact row/null counts plus the HyperLogLog
    distinct estimate (same md5 register construction as
    ``hll_distinct``, so the whole profile is SQL-verifiable
    value-exactly).

    One streaming pass: each batch emits, per column, its max-rho
    register partials (kind='r') and an exact count partial
    (kind='c': rows + nulls); one grouped exchange reduces both kinds
    (max for registers rides the same column as the count sum — the
    two kinds use disjoint bucket ranges so neither aggregation mixes).
    Exchange volume: O(columns × (m + 1) × blocks).
    """
    from kire_ray.stages.shuffle import grouped_agg, partitioned_map_groups

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for col in columns:
            s = b[col]
            null_mask = s.isna()
            vals = s[~null_mask].astype(str)
            codes, uniq = pd.factorize(vals, sort=False)
            h = np.fromiter(
                (
                    int(hashlib.md5(str(u).encode("utf-8")).hexdigest()[:15], 16)
                    for u in uniq
                ),
                dtype=np.int64,
                count=len(uniq),
            )
            if len(h):
                hh = h[codes]
                bucket = hh >> _W_BITS
                w = hh & ((np.int64(1) << _W_BITS) - 1)
                rho = np.where(w == 0, _W_BITS + 1, _W_BITS + 1 - _bit_length_u64(w))
                regs = (
                    pd.DataFrame({"bucket": bucket, "rho": rho})
                    .groupby("bucket")
                    .max()
                    .reset_index()
                )
            else:
                regs = pd.DataFrame({"bucket": [], "rho": []}).astype(np.int64)
            regs["column"] = col
            # count channel: bucket -1 = total rows, -2 = nulls (the
            # register buckets are >= 0, so max/sum never mix kinds)
            cnt = pd.DataFrame(
                {
                    "column": [col, col],
                    "bucket": [-1, -2],
                    "rho": [len(b), int(null_mask.sum())],
                }
            )
            frames.append(pd.concat([regs[["column", "bucket", "rho"]], cnt]))
        return pd.concat(frames, ignore_index=True)

    # ONE streaming partial pass (block-sized batches — 1024-row
    # default batches would emit a 4k-row register frame per kilobatch
    # and re-md5 repeating values), then a driver merge: the merged
    # state is the fixed-size sketch table (columns × (m+2) rows) —
    # the canonical driver-bounded reduction; max for registers, sum
    # for the count channels (disjoint bucket signs)
    raw = ds.map_batches(
        partial, batch_format="pandas", batch_size=None
    ).to_pandas()
    regs = (
        raw[raw["bucket"] >= 0]
        .groupby(["column", "bucket"], sort=False)["rho"]
        .max()
        .reset_index()
    )
    counts = (
        raw[raw["bucket"] < 0]
        .groupby(["column", "bucket"], sort=False)["rho"]
        .sum()
        .reset_index()
        .pivot(index="column", columns="bucket", values="rho")
    )

    rows = {"column": [], "n": [], "n_null": [], "distinct_est": [], "v_zero": []}
    for col in columns:
        grp = regs[regs["column"] == col]
        rho = grp["rho"].to_numpy(np.int64)
        s = float(np.ldexp(1.0, -rho).sum()) + float(HLL_M - len(rho))
        v0 = HLL_M - len(rho)
        e = _ALPHA * float(HLL_M) * float(HLL_M) / s
        if e <= 2.5 * HLL_M and v0 > 0:
            e = HLL_M * np.log(HLL_M / v0)
        rows["column"].append(col)
        rows["n"].append(int(counts.loc[col, -1]))
        rows["n_null"].append(int(counts.loc[col, -2]))
        rows["distinct_est"].append(e)
        rows["v_zero"].append(v0)
    out = pd.DataFrame(rows)
    out["distinct_est"] = round_half_up(out["distinct_est"], 6)
    for c in ("n", "n_null", "v_zero"):
        out[c] = out[c].astype(np.int64)
    return ray.data.from_pandas(out)


def winsorize(
    ds: "ray.data.Dataset",
    value_col: str,
    *,
    group_col: str,
    id_col: str,
    lo_q: float = 0.01,
    hi_q: float = 0.99,
    bins: int = HIST_BINS,
) -> "ray.data.Dataset":
    """Grouped winsorization (outlier capping) — the numeric-cleaning
    step feature pipelines run before normalization: every value is
    clamped to its group's [P(lo_q), P(hi_q)], with the boundaries from
    the deterministic ``hist_quantiles`` sketch (layout-invariant, so
    two runs cap identically — a t-digest would not).

    Two tiny exchanges build the boundary table (groups × 2 rows),
    which broadcasts; the capping itself is a stateless vectorized
    map — the corpus never shuffles.  Returns (id, group, value)
    rounded to 6dp.
    """
    from kire_ray.functions.rounding import round_half_up

    qs = hist_quantiles(
        ds, value_col, group_col=group_col, qs=(lo_q, hi_q), bins=bins
    ).to_pandas()
    piv = qs.pivot(index=group_col, columns="q", values="est")
    lo = piv[lo_q].to_dict()
    hi = piv[hi_q].to_dict()
    ref = ray.put((lo, hi))

    def clamp(b: pd.DataFrame) -> pd.DataFrame:
        lo_m, hi_m = ray.get(ref)
        g = b[group_col]
        v = np.clip(
            b[value_col].to_numpy(np.float64),
            g.map(lo_m).to_numpy(np.float64),
            g.map(hi_m).to_numpy(np.float64),
        )
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                group_col: g.to_numpy(),
                value_col: round_half_up(v, 6),
            }
        )

    return ds.map_batches(clamp, batch_format="pandas")


def join_size_estimate(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    left_key: str,
    right_key: str,
) -> "ray.data.Dataset":
    """Join-size estimation WITHOUT running the join: the Count-Min
    inner-product estimator (Cormode & Muthukrishnan 2005, §4.2) —
    |A ⋈ B| ≈ min_d Σ_w cmsA[d][w]·cmsB[d][w]. The planner-style
    cardinality probe a pipeline runs before choosing a join strategy;
    collisions only ever OVER-estimate, and the whole sketch is
    integer arithmetic on md5 buckets, so the DuckDB oracle reproduces
    estimate AND exact bit-for-bit.

    ONE streaming pass per side emits BOTH the sketch partials (fixed
    d×w counters; w=65536 because the inner product's additive error is
    |A|·|B|/w per row — at w=2048 the noise floor (~1.1M at sf0.1)
    drowned the 150k signal) and the per-key exact-count partials, and
    everything rides ONE fused tagged exchange (was: two sketch
    exchanges + a count exchange + each input read twice — three
    barriers of pure latency at bench scale). Reducers co-locate every
    (kind, key)'s rows, emit per-partition partial dot-products per
    sketch row and a partial exact sum; the driver folds the
    partition-count-sized result. All integer arithmetic on md5
    buckets, so the DuckDB oracle reproduces estimate AND exact
    bit-for-bit. Returns one row: (exact, estimate).
    """
    JS_D, JS_W = 3, 65536  # 3 × 16-bit slices of the 60-bit md5
    from kire_ray.stages.shuffle import partitioned_map_groups

    def side_partial(key, col, other):
        def partial(b: pd.DataFrame) -> pd.DataFrame:
            counts = b[key].value_counts()
            words = counts.index.to_numpy(dtype=object)
            n = counts.to_numpy(np.int64)
            # ONE md5 per distinct key; the d buckets are disjoint
            # 16-bit slices of the 60-bit hash (Kirsch–Mitzenmacher
            # derived hashing — one hash pass instead of three)
            h = np.fromiter(
                (
                    int(hashlib.md5(str(w).encode("utf-8")).hexdigest()[:15], 16)
                    for w in words
                ),
                dtype=np.int64,
                count=len(words),
            )
            frames = [
                pd.DataFrame(
                    {"k": np.array([f"c:{w}" for w in words], dtype=object), col: n}
                )
            ]
            for j in range(JS_D):
                buck = (h >> (16 * j)) % JS_W
                g = (
                    pd.DataFrame({"buck": buck, col: n})
                    .groupby("buck", sort=False)[col]
                    .sum()
                    .reset_index()
                )
                g["k"] = "s:" + str(j) + ":" + g["buck"].astype(str)
                frames.append(g[["k", col]])
            out = pd.concat(frames, ignore_index=True)
            out[other] = np.int64(0)
            return out[["k", "na", "nb"]]

        return partial

    both = left.map_batches(
        side_partial(left_key, "na", "nb"), batch_format="pandas"
    ).union(
        right.map_batches(side_partial(right_key, "nb", "na"), batch_format="pandas")
    )

    def reduce_part(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("k", sort=False)[["na", "nb"]].sum()
        prod = g["na"].to_numpy(np.int64) * g["nb"].to_numpy(np.int64)
        is_sketch = g.index.str.startswith("s:")
        out_k, out_v = ["exact"], [int(prod[~is_sketch].sum())]
        sk = g.index[is_sketch].str.split(":").str[1]
        if len(sk):
            dots = pd.Series(prod[is_sketch]).groupby(sk.to_numpy()).sum()
            out_k.extend("dot:" + dots.index)
            out_v.extend(int(v) for v in dots.to_numpy())
        return pd.DataFrame({"what": out_k, "v": np.array(out_v, np.int64)})

    parts = partitioned_map_groups(both, ["k"], reduce_part).to_pandas()
    tot = parts.groupby("what")["v"].sum()
    exact = int(tot.get("exact", 0))
    estimate = int(
        min(int(tot.get(f"dot:{j}", 0)) for j in range(JS_D))
    )
    return ray.data.from_pandas(
        pd.DataFrame(
            {"exact": [np.int64(exact)], "estimate": [np.int64(estimate)]}
        )
    )


KMV_K = 256


def kmv_set_ops(
    ds: "ray.data.Dataset",
    *,
    key_cols: tuple[str, ...] = ("user_id",),
    slice_col: str = "event_type",
    slice_a: str = "purchase",
    slice_b: str = "click",
) -> "ray.data.Dataset":
    """Theta/KMV sketch set operations: estimate the distinct-key size
    of two slices, their union and their intersection from k-minimum-
    value sketches (Bar-Yossef et al. 2002; Dasgupta et al. 2016's
    Theta framing) next to the exact counts — the mergeable-sketch
    algebra a 100 TB profile store uses instead of re-scanning for
    every slice combination.

    Per-slice sketch = the KMV_K smallest md5 values of the distinct
    keys (per-block k-min combiner → one sketch-sized exchange to the
    driver; the union sketch is the k-min of the merged sketches,
    intersection via inclusion-exclusion). Estimator: (k−1)/x_k
    normalized to the 60-bit hash space when the sketch saturates,
    else the exact sketch size. md5-integer construction end to end —
    the oracle reproduces every estimate bit-for-bit (the only floats
    are the final divisions, mirrored literally).
    """
    from kire_ray.stages.shuffle import grouped_agg

    SPACE = float(1 << 60)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for tag, sl in (("a", slice_a), ("b", slice_b)):
            sub = b[b[slice_col] == sl]
            if not len(sub):
                continue
            key = sub[key_cols[0]].astype(str)
            for c in key_cols[1:]:
                key = key + "_" + sub[c].astype(str)
            uniq = pd.unique(key.to_numpy(object))
            h = np.fromiter(
                (
                    int(hashlib.md5(str(u).encode("utf-8")).hexdigest()[:15], 16)
                    for u in uniq
                ),
                dtype=np.int64,
                count=len(uniq),
            )
            h = np.unique(h)[:KMV_K]  # block-local k-min combiner
            frames.append(pd.DataFrame({"tag": tag, "h": h}))
        if not frames:
            return pd.DataFrame(
                {"tag": pd.Series([], dtype=object),
                 "h": pd.Series([], dtype=np.int64)}
            )
        return pd.concat(frames, ignore_index=True)

    # sketch-sized collect: ≤ 2 × KMV_K × blocks rows
    sk = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    A = np.unique(sk.loc[sk["tag"] == "a", "h"].to_numpy(np.int64))[:KMV_K]
    B = np.unique(sk.loc[sk["tag"] == "b", "h"].to_numpy(np.int64))[:KMV_K]
    U = np.unique(np.concatenate([A, B]))[:KMV_K]

    def est(h: np.ndarray) -> float:
        if len(h) < KMV_K:
            return float(len(h))
        return (KMV_K - 1) / (float(h[-1]) / SPACE)

    ea, eb, eu = est(A), est(B), est(U)
    ei = ea + eb - eu
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "est_a": round_half_up(np.array([ea]), 6),
                "est_b": round_half_up(np.array([eb]), 6),
                "est_union": round_half_up(np.array([eu]), 6),
                "est_inter": round_half_up(np.array([ei]), 6),
            }
        )
    )


TD_DELTA = 200  # t-digest compression: ≤ ~TD_DELTA clusters per digest


def _td_k1(q: np.ndarray, delta: float) -> np.ndarray:
    """t-digest k1 scale function (Dunning & Ertl 2019): cluster sizes
    shrink toward q→0/1, giving constant RELATIVE rank error at the
    tails — the property quantile gates on heavy-tailed value columns
    actually need."""
    return (delta / (2.0 * np.pi)) * np.arcsin(2.0 * np.clip(q, 0.0, 1.0) - 1.0)


def _td_merge(
    means: np.ndarray, weights: np.ndarray, delta: float
) -> tuple[np.ndarray, np.ndarray]:
    """Merge (mean, weight) clusters into a fresh digest, fully
    vectorized: sort by mean, take each cluster's mid-rank quantile,
    bucket by floor(k1(q)) and weighted-average consecutive clusters
    sharing a bucket (np.add.reduceat on the bucket boundaries).
    Deterministic for a given input multiset — inputs are sorted first,
    so the result is independent of partial arrival order."""
    order = np.lexsort((weights, means))
    m, w = means[order].astype(np.float64), weights[order].astype(np.float64)
    W = w.sum()
    if W <= 0 or len(m) == 0:
        return m[:0], w[:0]
    qmid = (np.cumsum(w) - w / 2.0) / W
    ci = np.floor(_td_k1(qmid, delta)).astype(np.int64)
    starts = np.flatnonzero(np.concatenate([[True], ci[1:] != ci[:-1]]))
    wm = np.add.reduceat(m * w, starts)
    ws = np.add.reduceat(w, starts)
    return wm / ws, ws


def tdigest_quantiles(
    ds: "ray.data.Dataset",
    value_col: str = "value",
    *,
    qs: tuple[float, ...] = (0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99),
    delta: float = TD_DELTA,
    num_partitions: int = 16,
) -> "ray.data.Dataset":
    """Distributed t-digest quantile sketch (Dunning & Ertl 2019) —
    the mergeable-quantile member of the sketch family (HLL = distinct,
    CMS = frequency, KMV = set ops, t-digest = quantiles): estimates
    any quantile from O(delta) state where the exact counterpart
    (hist_quantiles / events_quantile_cont) must see every value.

    Shape: per-block partial digest (vectorized bucket-and-reduceat
    over the sorted batch, ≤ delta+2 rows out per block, plus tagged
    lo/hi extreme rows) → ONE exchange on hash(mean) % P co-locating
    cluster subsets → per-partition re-merge (≤ delta rows each) →
    driver folds P digests and interpolates the quantiles.  Shuffle
    volume is O(blocks × delta), never the data; digest merge is
    order-independent by construction, so the tree depth is free.

    Float-iterative estimate (like ann_ivf / kmeans): driver row is
    rows-only; pytest bounds the rank error vs the exact quantiles.
    """
    from kire_ray.stages.shuffle import partitioned_map_groups

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(b[value_col].to_numpy(np.float64))
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return pd.DataFrame(
                {
                    "mean": pd.Series([], dtype=np.float64),
                    "weight": pd.Series([], dtype=np.float64),
                    "tag": pd.Series([], dtype=object),
                }
            )
        m, w = _td_merge(v, np.ones(len(v)), delta)
        return pd.DataFrame(
            {
                "mean": np.concatenate([m, [v[0], v[-1]]]),
                "weight": np.concatenate([w, [0.0, 0.0]]),
                "tag": ["c"] * len(m) + ["lo", "hi"],
            }
        )

    def merge_part(part: pd.DataFrame) -> pd.DataFrame:
        cl = part[part["tag"] == "c"]
        m, w = _td_merge(
            cl["mean"].to_numpy(np.float64), cl["weight"].to_numpy(np.float64), delta
        )
        lo = part.loc[part["tag"] == "lo", "mean"]
        hi = part.loc[part["tag"] == "hi", "mean"]
        ex_m, ex_w, ex_t = [], [], []
        if len(lo):
            ex_m.append(float(lo.min())); ex_w.append(0.0); ex_t.append("lo")
        if len(hi):
            ex_m.append(float(hi.max())); ex_w.append(0.0); ex_t.append("hi")
        return pd.DataFrame(
            {
                "mean": np.concatenate([m, np.asarray(ex_m, np.float64)]),
                "weight": np.concatenate([w, np.asarray(ex_w, np.float64)]),
                "tag": ["c"] * len(m) + ex_t,
            }
        )

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        if "mean" not in b.columns:  # schema-less empty block
            return pd.DataFrame(
                {
                    "mean": pd.Series([], dtype=np.float64),
                    "weight": pd.Series([], dtype=np.float64),
                    "tag": pd.Series([], dtype=object),
                    "bucket": pd.Series([], dtype=np.int64),
                }
            )
        b = b.copy()
        from kire_ray.functions.hashing import hash64_fast

        b["bucket"] = (
            hash64_fast(b["mean"].astype(str).to_numpy()) % num_partitions
        ).astype(np.int64)
        return b

    parts = ds.map_batches(partial, batch_format="pandas").map_batches(
        add_bucket, batch_format="pandas"
    )
    merged = partitioned_map_groups(
        parts,
        ["bucket"],
        lambda p: merge_part(p.drop(columns=["bucket"])),
        num_partitions=num_partitions,
    ).to_pandas()

    fin = merge_part(merged)
    if fin.empty or "tag" not in fin.columns or not (fin["tag"] == "lo").any():
        # empty / all-NaN value column: a typed empty result, not an
        # IndexError on the missing lo/hi rows (review r5)
        return ray.data.from_pandas(
            pd.DataFrame(
                {"q": pd.Series([], dtype=np.float64),
                 "est": pd.Series([], dtype=np.float64)}
            )
        )
    cl = fin[fin["tag"] == "c"]
    m = cl["mean"].to_numpy(np.float64)
    w = cl["weight"].to_numpy(np.float64)
    vmin = float(fin.loc[fin["tag"] == "lo", "mean"].iloc[0])
    vmax = float(fin.loc[fin["tag"] == "hi", "mean"].iloc[0])
    W = w.sum()
    centers = np.cumsum(w) - w / 2.0
    # interpolation knots: min → cluster centers → max
    knots_x = np.concatenate([[0.0], centers, [W]])
    knots_y = np.concatenate([[vmin], m, [vmax]])
    est = np.interp(np.asarray(qs, np.float64) * W, knots_x, knots_y)
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "q": np.asarray(qs, np.float64),
                "est": round_half_up(est, 6),
                "n_clusters": np.full(len(qs), len(m), dtype=np.int64),
            }
        )
    )


def key_skew_profile(
    sf_dir: str,
    specs: tuple[tuple[str, str], ...] = (
        ("events", "user_id"),
        ("events", "event_type"),
        ("orders", "o_custkey"),
        ("lineitem", "l_orderkey"),
        ("lineitem", "l_partkey"),
        ("documents", "source"),
    ),
) -> "ray.data.Dataset":
    """Key-distribution skew diagnosis — per candidate shuffle key:
    row count, distinct keys, the hottest key's count and its share of
    all rows. The planning pass a 100 TB pipeline runs BEFORE choosing
    partition keys (this repo's own skew story — salting, max_turns
    caps — starts from exactly these numbers).

    Shape per source: block-local key-count combiner → one grouped
    exchange on (source, key) → per-block fold to (n_keys, n_rows,
    max_n) partials → a source-cardinality final combine. The exchange
    carries one row per (key, block); keys are stringified only as
    grouping labels (injective, never output). All outputs are exact
    integers except the final one-division share."""
    from kire_ray.pipelines.relational import _read
    from kire_ray.stages.shuffle import grouped_agg

    parts = []
    for t, c in specs:
        src = f"{t}.{c}"

        def partial(b: pd.DataFrame, _c=c, _src=src) -> pd.DataFrame:
            vc = b[_c].astype(str).value_counts()
            return pd.DataFrame(
                {
                    "source": _src,
                    "key": vc.index.to_numpy(),
                    "n": vc.to_numpy(np.int64),
                }
            )

        parts.append(
            _read(sf_dir, t, [c]).map_batches(partial, batch_format="pandas")
        )
    counts = grouped_agg(
        parts[0].union(*parts[1:]), ["source", "key"], {"n": ("n", "sum")}
    )

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty:
            return pd.DataFrame(
                {
                    "source": pd.Series([], dtype=object),
                    "n_rows": pd.Series([], dtype=np.int64),
                    "n_keys": pd.Series([], dtype=np.int64),
                    "max_n": pd.Series([], dtype=np.int64),
                }
            )
        return (
            b.groupby("source", sort=False)
            .agg(n_rows=("n", "sum"), n_keys=("key", "size"), max_n=("n", "max"))
            .reset_index()
        )

    def post(out: pd.DataFrame) -> pd.DataFrame:
        out = out.astype({"n_rows": np.int64, "n_keys": np.int64, "max_n": np.int64})
        out["top_share"] = round_half_up(
            out["max_n"].to_numpy(np.float64) / out["n_rows"].to_numpy(np.float64),
            6,
        )
        return out

    return grouped_agg(
        counts.map_batches(fold, batch_format="pandas"),
        ["source"],
        {"n_rows": ("n_rows", "sum"), "n_keys": ("n_keys", "sum"), "max_n": ("max_n", "max")},
        post=post,
    )


def column_mi(sf_dir: str) -> "ray.data.Dataset":
    """Mutual information between categorical column pairs — the
    association screen feature pipelines run before encoding (near-zero
    MI → drop a column; MI ≈ min(H) → redundant pair). Computed in
    bits for (documents.lang × documents.source) and
    (events.event_type × day-of-week).

    Shape: block-local joint-count combiner → one cell-bounded grouped
    exchange → the MI/entropy fold runs on the (|X|·|Y|)-sized cell
    table (driver-side, sketch-sized by construction). 6dp rounding
    absorbs the oracle's summation order."""
    from kire_ray.pipelines.relational import _read
    from kire_ray.stages.shuffle import grouped_agg

    def doc_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = (
            b.groupby(["lang", "source"], sort=False)
            .size()
            .rename("c")
            .reset_index()
        )
        return pd.DataFrame(
            {"pair": "documents.lang|source", "x": g["lang"], "y": g["source"],
             "c": g["c"].astype(np.int64)}
        )

    def ev_partial(b: pd.DataFrame) -> pd.DataFrame:
        day = b["ts"].to_numpy("datetime64[us]").astype(np.int64) // 86_400_000_000
        dow = ((day + 4) % 7).astype(str)
        g = (
            pd.DataFrame({"x": b["event_type"], "y": dow})
            .groupby(["x", "y"], sort=False)
            .size()
            .rename("c")
            .reset_index()
        )
        return pd.DataFrame(
            {"pair": "events.event_type|dow", "x": g["x"], "y": g["y"],
             "c": g["c"].astype(np.int64)}
        )

    docs = _read(sf_dir, "documents", ["lang", "source"]).map_batches(
        doc_partial, batch_format="pandas"
    )
    evs = _read(sf_dir, "events", ["event_type", "ts"]).map_batches(
        ev_partial, batch_format="pandas"
    )
    cells = grouped_agg(
        docs.union(evs), ["pair", "x", "y"], {"c": ("c", "sum")}
    ).to_pandas()

    rows = []
    for pair, g in cells.groupby("pair", sort=True):
        g = g.sort_values(["x", "y"], kind="mergesort")
        c = g["c"].to_numpy(np.float64)
        n = c.sum()
        cx = g.groupby("x", sort=True)["c"].sum()
        cy = g.groupby("y", sort=True)["c"].sum()
        px = (cx / n).to_numpy()
        py = (cy / n).to_numpy()
        pj = c / n
        pxj = (cx.reindex(g["x"]) / n).to_numpy(np.float64)
        pyj = (cy.reindex(g["y"]) / n).to_numpy(np.float64)
        mi = float((pj * np.log2(pj / (pxj * pyj))).sum())
        hx = float(-(px * np.log2(px)).sum())
        hy = float(-(py * np.log2(py)).sum())
        rows.append((pair, int(n), mi, hx, hy))
    out = pd.DataFrame(rows, columns=["pair", "n", "mi_bits", "h_x_bits", "h_y_bits"])
    out["n"] = out["n"].astype(np.int64)
    for col in ("mi_bits", "h_x_bits", "h_y_bits"):
        out[col] = round_half_up(out[col].to_numpy(np.float64), 6)
    return ray.data.from_pandas(out)


def dp_histogram(
    sf_dir: str,
    *,
    epsilon: float = 0.5,
    noise_salt: str | None = None,
    uniform_source=None,
) -> "ray.data.Dataset":
    """Differentially-private histogram release (Dwork et al. 2006)
    of event counts per type: Laplace(1/ε) noise on each exact count
    (sensitivity 1 for a count query), released WITHOUT the true
    counts — the third leg of the privacy family next to
    ``k_anonymity`` and ``l_diversity``.

    The default draw is inverse-CDF over the engine's md5 uniform
    (``score01_md5``) keyed only on the public event_type, so the
    release is reproducible and driver-verifiable in SQL — a
    DETERMINISTIC-SEED stand-in with ZERO actual privacy: anyone who
    knows the scheme recovers the exact counts. A real deployment
    MUST pass either ``noise_salt`` (a secret string mixed into the
    md5 basis — same code path, secret key) or ``uniform_source`` (a
    callable ``key -> float in [0,1)``, e.g. backed by
    ``secrets.SystemRandom().random``) — everything else (combiner,
    exchange, rounding) is unchanged.

    Shape: block count combiner → one type exchange → noise applied
    vectorized on the type-bounded result. Exact-int plumbing until
    the final add."""
    from kire_ray.functions.hashing import score01_md5
    from kire_ray.functions.rounding import round_half_up
    from kire_ray.pipelines.relational import _read
    from kire_ray.stages.shuffle import grouped_agg

    b_scale = 1.0 / float(epsilon)
    salt = "" if noise_salt is None else noise_salt + "|"
    draw = uniform_source or (lambda key: score01_md5(key))
    ev = _read(sf_dir, "events", ["event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.groupby("event_type", sort=False)
            .size()
            .rename("n")
            .reset_index()
        )

    def release(out: pd.DataFrame) -> pd.DataFrame:
        u = np.array(
            [draw("dp|" + salt + t) for t in out["event_type"]],
            dtype=np.float64,
        )
        lap = -b_scale * np.sign(u - 0.5) * np.log(1.0 - 2.0 * np.abs(u - 0.5))
        return pd.DataFrame(
            {
                "event_type": out["event_type"],
                "noisy_count": round_half_up(
                    out["n"].to_numpy(np.float64) + lap, 6
                ),
                "epsilon": np.float64(epsilon),
            }
        )

    return grouped_agg(
        ev.map_batches(partial, batch_format="pandas"),
        ["event_type"],
        {"n": ("n", "sum")},
        post=release,
    )
