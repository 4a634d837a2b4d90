"""Mergeable cardinality sketch (HyperLogLog) — the approximate
counterpart of the exact distinct-count operator.

`q_events_distinct_users` moves every distinct (key, id) pair through a
shuffle — exact, but at 10^11 distinct ids per key that is the
dominant exchange. The HLL path moves AT MOST ``m`` register rows per
key per block (constant, independent of cardinality): per-batch
register partials, one tiny (key, register) max-merge, one estimate row
per key. Standard HLL (Flajolet et al. 2007) with the small-range
linear-counting correction; deterministic (the stable 64-bit hash is
pandas ``hash_array``'s fixed-key SipHash, the same primitive the
engine's bucket exchanges use), so the output is byte-stable and can be
oracle-checked against a committed golden while accuracy is separately
tested against the exact count (~1.04/sqrt(m) relative error).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data import Dataset

HLL_P = 10  # 2^10 = 1024 registers: ~3.2% typical error, 8 KiB per key


def _registers(ids: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Nonzero HLL registers of one id batch: (register_idx, rho)."""
    h = pd.util.hash_array(ids, categorize=False)  # stable uint64
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = (h << np.uint64(HLL_P)) | np.uint64((1 << HLL_P) - 1)
    # rho = leading zeros of the remaining 64-P bits + 1; the OR above
    # plants a stop bit so rho is capped at 64-P+1 without a branch
    rho = np.zeros(len(h), np.int64)
    probe = np.uint64(1) << np.uint64(63)
    live = np.ones(len(h), bool)
    for r in range(1, 64 - HLL_P + 2):
        hit = live & ((rest & probe) != 0)
        rho[hit] = r
        live &= ~hit
        if not live.any():
            break
        probe >>= np.uint64(1)
    # per-register max within the batch
    key = idx * 128 + rho
    order = np.argsort(key)
    idx_s = idx[order]
    last = np.ones(len(idx_s), bool)
    last[:-1] = idx_s[:-1] != idx_s[1:]
    return idx_s[last], rho[order][last]


def hll_distinct(
    ds: Dataset, key_col: str, id_col: str
) -> Dataset:
    """Approximate COUNT(DISTINCT id) per key. Returns one row per key:
    (key, est). Exchange volume is <= 1024 register rows per key per
    block — never proportional to the id cardinality."""
    m = 1 << HLL_P

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for k, grp in df.groupby(key_col, sort=False):
            ids = grp[id_col].to_numpy()
            reg, rho = _registers(ids, m)
            outs.append(pd.DataFrame({key_col: k, "reg": reg, "rho": rho}))
        if not outs:
            return pd.DataFrame({key_col: pd.Series([], dtype=object),
                                 "reg": pd.Series([], dtype=np.int64),
                                 "rho": pd.Series([], dtype=np.int64)})
        return pd.concat(outs, ignore_index=True)

    def estimate(df: pd.DataFrame) -> pd.DataFrame:
        out_k, out_e = [], []
        for k, grp in df.groupby(key_col, sort=False):
            regs = np.zeros(m, np.float64)
            np.maximum.at(regs, grp["reg"].to_numpy(np.int64),
                          grp["rho"].to_numpy(np.float64))
            alpha = 0.7213 / (1 + 1.079 / m)
            raw = alpha * m * m / np.sum(np.exp2(-regs))
            zeros = int(np.sum(regs == 0))
            if raw <= 2.5 * m and zeros:
                est = m * np.log(m / zeros)  # linear counting
            else:
                est = raw
            out_k.append(k)
            out_e.append(int(round(est)))
        return pd.DataFrame({key_col: out_k,
                             "est": np.array(out_e, np.int64)})

    # registers merge by MAX, so the same groupby plan the exact
    # operator uses works unchanged — just over <= m rows per key
    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(key_col)
        .map_groups(estimate, batch_format="pandas")
    )


# ------------------------------- mergeable log-histogram quantile sketch

QSK_SUB = 32  # sub-bins per octave: relative error <= 1/32 (~3.1%)


def log_histogram_quantiles(
    ds: Dataset,
    key_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
) -> Dataset:
    """Approximate per-key quantiles via a mergeable log-spaced
    histogram (the DDSketch shape, base-2 with linear sub-bins): each
    value lands in bin (e, j) where e = floor(log2 v) and j indexes
    ``QSK_SUB`` equal-width sub-bins of the octave [2^e, 2^(e+1)).
    Exchange volume is <= (octaves x QSK_SUB) count rows per key per
    block — CONSTANT in row count, unlike the exact grouped percentile
    whose histogram is value-cardinality-sized. Bin assignment is
    integer-exact (values are 2-dp cents; the 0.5 offset keeps every
    integer a safe ~2^-25 log-distance from octave boundaries, ~1e6 x
    the float64 log2 error), so the estimate — the LOWER BOUND of the
    bin holding rank ceil(q*n) — is bit-reproducible and restatable in
    SQL: an honest hash-exact oracle for an approximate operator.
    Guarantee: est <= true quantile < est * (1 + 1/QSK_SUB)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v_c = np.maximum(
            np.floor(df[value_col].to_numpy(np.float64) * 100 + 0.5), 1.0
        ).astype(np.int64)  # cents, zero/negative clamped to first bin
        e = np.floor(np.log2(v_c + 0.5)).astype(np.int64)
        octave = np.exp2(e)  # exact powers of two
        j = np.floor((v_c - octave) * QSK_SUB / octave).astype(np.int64)
        out = (
            pd.DataFrame({key_col: df[key_col], "e": e, "j": j, "n": 1})
            .groupby([key_col, "e", "j"], sort=False).sum().reset_index()
        )
        out["n"] = out["n"].astype(np.int64)
        return out

    def estimate(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, grp in df.groupby(key_col, sort=False):
            g = grp.groupby(["e", "j"], sort=True)["n"].sum().reset_index()
            cum = g["n"].to_numpy(np.int64).cumsum()
            tot = int(cum[-1])
            rep = (
                np.exp2(g["e"].to_numpy(np.float64))
                * (1.0 + g["j"].to_numpy(np.float64) / QSK_SUB)
                / 100.0
            )  # lower bin bound, back in value units
            row = {key_col: k}
            for q in qs:
                rank = int(np.ceil(q * tot))
                row[f"p{int(q * 100)}"] = float(
                    rep[np.searchsorted(cum, rank, side="left")]
                )
            rows.append(row)
        return pd.DataFrame(rows)

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(key_col)
        .map_groups(estimate, batch_format="pandas")
    )


# ---------------------------------- Count-Min frequency sketch

CM_D = 4     # hash rows: P(overestimate > bound) <= 2^-4 per query
CM_W = 2048  # columns per row: expected collision mass <= N / 2048


def _cm_positions(keys: list[str]) -> np.ndarray:
    """(len(keys), CM_D) int64 position matrix. md5 (not a faster
    non-crypto hash) deliberately, so the DuckDB oracle can restate the
    exact same placement (the sampling/fingerprint family's idiom)."""
    import hashlib

    out = np.empty((len(keys), CM_D), np.int64)
    for i, k in enumerate(keys):
        for r in range(CM_D):
            h = hashlib.md5(f"{r}|{k}".encode("utf-8")).hexdigest()[:8]
            out[i, r] = int(h, 16) % CM_W
    return out


def cm_frequencies(
    ds: Dataset, key_col: str, query_keys: list[str]
) -> pd.DataFrame:
    """Approximate per-key occurrence counts via a mergeable Count-Min
    sketch: per-batch partials hash only the batch's DISTINCT keys
    (md5 per distinct value, counts vectorized), emit <= CM_D x
    distinct (row, position, n) rows, and the sketch merges by ADDITION
    through one tiny keyed exchange — never more than CM_D x CM_W
    (8192) cells total, independent of key cardinality. Estimates for
    the (small, fixed) ``query_keys`` read the merged sketch on the
    driver: est(k) = min over rows of the k-cell — an OVERestimate
    only (collisions add, never subtract), with expected excess
    <= CM_D'th-order N/CM_W. The scale path for heavy-hitter frequency
    beside the exact top-k operators (token_topk/docs_topk_per_source).
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[key_col].astype(str).value_counts()
        if not len(vc):
            return pd.DataFrame({"r": pd.Series([], dtype=np.int64),
                                 "p": pd.Series([], dtype=np.int64),
                                 "n": pd.Series([], dtype=np.int64)})
        pos = _cm_positions(list(vc.index))  # (distinct, CM_D)
        n = vc.to_numpy(np.int64)
        out = (
            pd.DataFrame({
                "r": np.tile(np.arange(CM_D, dtype=np.int64), len(n)),
                "p": pos.reshape(-1),
                "n": np.repeat(n, CM_D),
            })
            .groupby(["r", "p"], sort=False).sum().reset_index()
        )
        out["n"] = out["n"].astype(np.int64)
        return out

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["r", "p"], sort=False)["n"].sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return g

    cells = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["r", "p"])
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # sketch-sized: <= CM_D x CM_W rows
    )
    table = np.zeros((CM_D, CM_W), np.int64)
    table[cells["r"].to_numpy(np.int64), cells["p"].to_numpy(np.int64)] = (
        cells["n"].to_numpy(np.int64)
    )
    qpos = _cm_positions([str(k) for k in query_keys])
    est = table[np.arange(CM_D), qpos].min(axis=1)
    return pd.DataFrame({key_col: list(query_keys),
                         "est": est.astype(np.int64)})
