"""Partition-local Algorithm-1 level loop (the joinless WPI miner).

One shared implementation of the reference's mining loop
(src/miner.cpp:24-98: generateCandidates -> filterCandidates ->
genTableInstance -> selectPrevColocations) over an in-memory star index,
used in two modes:

* **serial / oracle mode** (``roots=None``): identical semantics to the
  single-threaded reference, Lemma 3 optional (src/miner.cpp:185-205).
* **subtree mode** (``roots=[f]``): the paper's Algorithm 3 -- mine only
  patterns whose canonically-first (rarest) feature is ``f``; Lemma 3 is
  invalid per-subtree and must be off (paper sec. 5.2).

Instances are int32 codes; the star index is a per-feature CSR
(``StarCSR``: feature -> sorted center codes + offsets + flat neighbor
codes) replacing the reference's O(levels) NR-tree walk
(src/miner.cpp:219-260) with one vectorized searchsorted + range-gather
per (candidate, slot) -- no per-row Python in the expansion hot path.
Row-instance tables are ``pattern -> (n_rows, k) int32 ndarray``; all
outputs (pattern sets, PR/PI/WPI, row counts) are order-insensitive, so
no insertion-order state from the reference needs reproducing.
"""

from __future__ import annotations

import math
from typing import Iterable

import numpy as np

from .canonical import FeatureContext, select_metrics

_EMPTY = np.empty(0, dtype=np.int32)


def _range_gather(starts: np.ndarray, cnts: np.ndarray) -> np.ndarray:
    """Indices covering [starts[i], starts[i]+cnts[i]) for every i,
    concatenated -- the vectorized equivalent of per-row slicing."""
    total = int(cnts.sum())
    if total == 0:
        return np.empty(0, np.int64)
    base = np.repeat(starts.astype(np.int64), cnts)
    csum = np.cumsum(cnts) - cnts
    offs = np.arange(total, dtype=np.int64) - np.repeat(csum, cnts)
    return base + offs


class StarCSR:
    """Per-feature CSR star index: ``feature -> (sorted unique center
    codes, offsets, sorted packed keys)``. Keys pack ``center * n_codes
    + neighbor`` into one int64, globally sorted per feature, so

    * ``lookup(codes, f)`` resolves a whole column of centers at once
      (searchsorted over the center array); neighbor values come back as
      ``keys % n_codes`` (cheap, gathered subsets only);
    * membership of (center, neighbor) pairs -- the hot operation of the
      extended-set intersection -- is ONE searchsorted over the presorted
      key array, with no per-candidate sort anywhere in the level loop.

    Packing is always safe: codes are dense int32 (< 2^31), so
    ``n_codes**2 < 2^62`` -- the guard below enforces the invariant
    instead of silently overflowing (the round-2 counting join packed
    ``row_index * max_code`` which could overflow at 10^10+ rows; keys
    never involve the row count)."""

    __slots__ = ("by_feat", "n_codes")

    def __init__(self, by_feat: dict, n_codes: int):
        self.by_feat = by_feat
        self.n_codes = max(int(n_codes), 1)
        if self.n_codes > (1 << 31):
            raise ValueError(
                f"instance codes must be dense int32 (< 2^31); got "
                f"n_codes={self.n_codes}. Re-encode ids before mining."
            )

    @classmethod
    def from_rows(cls, center_codes, nbr_feats, offsets, flat) -> "StarCSR":
        """Build from row-per-(center, nbr_feature) arrays with Arrow
        list offsets -- fully vectorized (one lexsort + one key sort per
        feature; the sort is paid ONCE per group and removes every sort
        from the per-candidate expansion path). Duplicate
        (feature, center) rows (shard replication) keep the first
        occurrence; their payloads are identical by construction.

        ``nbr_feats`` is either a raw feature array (factorized here) or
        a pre-encoded ``(codes, uniques)`` pair (e.g. from Arrow
        dictionary_encode -- avoids materializing Python strings)."""
        import pandas as pd

        centers = np.asarray(center_codes, np.int64)
        n = len(centers)
        if n == 0:
            return cls({}, 1)
        n_codes = int(max(
            centers.max() if n else -1,
            int(np.max(flat)) if len(flat) else -1,
        )) + 1
        if n_codes > (1 << 31):
            raise ValueError(
                f"instance codes must be dense int32 (< 2^31); got max "
                f"{n_codes - 1}. Re-encode ids before mining."
            )
        flat = np.asarray(flat, np.int32)
        by_feat: dict = {}
        if isinstance(nbr_feats, tuple):
            fcodes, funiq = nbr_feats
            fcodes = np.asarray(fcodes)
        else:
            fcodes, funiq = pd.factorize(nbr_feats, sort=False)
        starts_all = np.asarray(offsets[:-1], np.int64)
        lens_all = np.asarray(offsets[1:], np.int64) - starts_all
        order = np.lexsort((centers, fcodes))
        fo = fcodes[order]
        bounds = np.concatenate(
            [[0], np.nonzero(np.diff(fo))[0] + 1, [n]]
        )
        for gi in range(len(bounds) - 1):
            rows = order[bounds[gi]: bounds[gi + 1]]
            f = funiq[fo[bounds[gi]]]
            cen = centers[rows]
            if len(cen) > 1:
                keep = np.concatenate([[True], cen[1:] != cen[:-1]])
                rows = rows[keep]
                cen = cen[keep]
            lens = lens_all[rows]
            offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
            vals = flat[_range_gather(starts_all[rows], lens)]
            keys = np.repeat(cen, lens) * n_codes + vals
            keys.sort()  # segments stay in place (cen ascending)
            by_feat[f] = (cen, offs, keys)
        return cls(by_feat, n_codes)

    @classmethod
    def from_dict(cls, index: dict) -> "StarCSR":
        """Build from the legacy ``(center, feature) -> array`` dict
        (oracle / test path)."""
        groups: dict = {}
        mx = -1
        for (c, f), arr in index.items():
            groups.setdefault(f, []).append((int(c), arr))
            mx = max(mx, int(c))
            if arr.size:
                mx = max(mx, int(np.max(arr)))
        n_codes = mx + 1
        by_feat: dict = {}
        for f, items in groups.items():
            items.sort(key=lambda t: t[0])
            cen = np.fromiter((c for c, _ in items), np.int64, len(items))
            lens = np.fromiter((a.size for _, a in items), np.int64, len(items))
            offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
            vals = (
                np.concatenate([a for _, a in items]).astype(np.int64)
                if items else np.empty(0, np.int64)
            )
            keys = np.repeat(cen, lens) * n_codes + vals
            keys.sort()
            by_feat[f] = (cen, offs, keys)
        return cls(by_feat, n_codes)

    def lookup(self, codes: np.ndarray, f: str):
        """-> (starts, cnts, keys): for each code, its neighbor range
        [starts, starts+cnts) into the feature's sorted key array (cnt 0
        when absent). Neighbor values of a gathered subset are
        ``keys[idx] % self.n_codes``."""
        entry = self.by_feat.get(f)
        codes = np.asarray(codes, np.int64)
        if entry is None:
            z = np.zeros(len(codes), np.int64)
            return z, z, np.empty(0, np.int64)
        cen, offs, keys = entry
        pos = np.searchsorted(cen, codes)
        pos_c = np.minimum(pos, len(cen) - 1)
        ok = cen[pos_c] == codes
        starts = offs[pos_c]
        cnts = np.where(ok, offs[pos_c + 1] - starts, 0)
        return starts, cnts, keys

    def member(self, centers: np.ndarray, vals: np.ndarray, f: str) -> np.ndarray:
        """Boolean mask: is ``vals[i]`` an ordered neighbor of
        ``centers[i]`` under feature ``f``? One searchsorted over the
        presorted packed keys -- the sort-free core of the extended-set
        intersection (reference findExtendedSet, src/miner.cpp:264-310)."""
        entry = self.by_feat.get(f)
        if entry is None or not len(entry[2]):
            return np.zeros(len(vals), bool)
        keys = entry[2]
        q = np.asarray(centers, np.int64) * self.n_codes + vals
        pos = np.minimum(np.searchsorted(keys, q), len(keys) - 1)
        return keys[pos] == q


def as_csr(index) -> StarCSR:
    return index if isinstance(index, StarCSR) else StarCSR.from_dict(index)


def gen_candidates(
    prev_patterns: list[tuple[str, ...]], ctx: FeatureContext
) -> list[tuple[str, ...]]:
    """apriori-gen join (src/miner.cpp:102-149): join two (k-1)-patterns
    sharing their first k-2 features; the two distinct last features are
    appended in canonical order (count asc -- with the lex tiebreak this
    equals the reference's emission order, see SURVEY.md P2). Dedup+sort."""
    by_prefix: dict[tuple[str, ...], list[str]] = {}
    for p in prev_patterns:
        by_prefix.setdefault(p[:-1], []).append(p[-1])
    out = set()
    for prefix, lasts in by_prefix.items():
        if len(lasts) < 2:
            continue
        lasts_sorted = ctx.sort_pattern(lasts)
        for i in range(len(lasts_sorted)):
            for j in range(i + 1, len(lasts_sorted)):
                out.add(prefix + (lasts_sorted[i], lasts_sorted[j]))
    return sorted(out)


def filter_candidates(
    candidates: list[tuple[str, ...]],
    prev_prevalent: list[tuple[str, ...]],
    prev_tables: dict[tuple[str, ...], np.ndarray],
    min_prev: float,
    ctx: FeatureContext,
    use_lemma3: bool,
    branch_depth: int = 0,
) -> list[tuple[str, ...]]:
    """Lemma-2 / Lemma-3 prune (src/miner.cpp:152-215). Called only for
    k >= 3 (the k==2 skip lives in the level loop, src/miner.cpp:69-71).

    Lemma 2: every (k-1)-subset that keeps f_min (= removal index != 0)
    must be in P_{k-1}.
    Lemma 3 (serial only): for the subset dropping f_min, prune when
    ``PI(subset over T_{k-1}) * (1/RI(f_max, C)) < min_prev``; mirrors the
    reference's IEEE quirks (RI==0 -> w=inf; PI 0 * inf = NaN -> no prune).

    ``branch_depth``: a branch task mines one prefix (root, f_1, ...,
    f_branch_depth) of the subtree; the subsets dropping positions
    1..branch_depth live in SIBLING branches whose prevalent sets this
    task cannot see -- skip those checks. A skipped prune only costs an
    extra expansion -- the exact WPI test still decides prevalence -- so
    the branch-parallel decomposition (``mine_branch`` and its deeper
    splits) emits the identical pattern set.
    """
    if not candidates or not prev_prevalent:
        return []
    prev_set = set(prev_prevalent)
    kept = []
    for cand in candidates:
        valid = True
        for drop in range(len(cand)):
            subset = cand[:drop] + cand[drop + 1 :]
            if drop != 0:
                if 1 <= drop <= branch_depth:
                    continue  # cross-branch subset: unknowable here
                if subset not in prev_set:
                    valid = False
                    break
            elif use_lemma3:
                ri = ctx.rare_intensity(cand[-1], cand)
                w = (1.0 / ri) if ri != 0.0 else math.inf
                pi_subset = _pi_of(subset, prev_tables, ctx)
                bound = pi_subset * w  # may be NaN (0*inf); NaN < x is False
                if bound < min_prev:
                    valid = False
                    break
        if valid:
            kept.append(cand)
    return kept


def _pi_of(
    pattern: tuple[str, ...],
    tables: dict[tuple[str, ...], np.ndarray],
    ctx: FeatureContext,
) -> float:
    """calculatePI semantics (src/utils.cpp:249-274): min over slots of
    distinct/total; a pattern absent from the table map yields 0."""
    rows = tables.get(pattern)
    dist = (
        [int(np.unique(rows[:, i]).size) for i in range(rows.shape[1])]
        if rows is not None and rows.size
        else [0] * len(pattern)
    )
    return select_metrics(pattern, dist, ctx)["pi"]


def expand_tables(
    candidates: list[tuple[str, ...]],
    prev_tables: dict[tuple[str, ...], np.ndarray],
    index,
) -> dict[tuple[str, ...], np.ndarray]:
    """genTableInstance (src/miner.cpp:312-379): for candidate prefix+f,
    extend every prefix row I by S(I, f) = intersection of Neigh(o_i, f)
    (findExtendedSet, src/miner.cpp:264-310). Candidates with zero rows
    get NO entry (drives the PI=0-when-absent behavior). ``index`` may be
    a StarCSR or the legacy dict (converted once here)."""
    csr = as_csr(index)
    out: dict[tuple[str, ...], np.ndarray] = {}
    for cand in candidates:
        prefix, f_new = cand[:-1], cand[-1]
        prev_rows = prev_tables.get(prefix)
        if prev_rows is None or prev_rows.size == 0:
            continue
        rows = _expand_one(prev_rows, f_new, csr)
        if rows is not None:
            out[cand] = rows
    return out


def _expand_one(
    prev_rows: np.ndarray,
    f_new: str,
    csr: StarCSR,
) -> np.ndarray | None:
    """Vectorized S(I, f) = intersection of Neigh(o_i, f) over all members
    of each prefix row (findExtendedSet semantics, src/miner.cpp:264-310).

    Per slot: ONE searchsorted resolves every prefix row's neighbor range;
    rows with any empty slot are dropped before gathering. The slot with
    the smallest total expansion is gathered as candidate (row, value)
    pairs; every other slot then filters those pairs with a presorted-key
    membership probe (``StarCSR.member``) -- no concatenated expansion
    array and no sort per candidate (the round-2 counting join sorted the
    full multi-slot expansion with np.unique per candidate per level,
    which saturated DRAM bandwidth with 16+ concurrent miners). Output
    rows are ordered by (prefix row, new value), same as the counting
    join produced."""
    n, km1 = prev_rows.shape
    n_codes = csr.n_codes
    starts_l, cnts_l = [], []
    alive = np.ones(n, dtype=bool)
    keys = None
    for i in range(km1):
        starts, cnts, keys = csr.lookup(prev_rows[:, i], f_new)
        alive &= cnts > 0
        starts_l.append(starts)
        cnts_l.append(cnts)
    if not alive.any():
        return None
    live = np.nonzero(alive)[0]
    if km1 == 1:
        # k=2: rows are (center, each ordered neighbor of f_new)
        s = starts_l[0][live]
        c = cnts_l[0][live]
        vals = keys[_range_gather(s, c)] % n_codes
        centers = np.repeat(prev_rows[live, 0], c)
        return np.column_stack([centers, vals]).astype(np.int32, copy=False)

    totals = np.array([int(cnts_l[i][live].sum()) for i in range(km1)])
    b = int(np.argmin(totals))
    s = starts_l[b][live]
    c = cnts_l[b][live]
    vals = keys[_range_gather(s, c)] % n_codes
    rows_local = np.repeat(np.arange(len(live), dtype=np.int64), c)
    # probe remaining slots smallest-first: the pair set only shrinks
    for i in np.argsort(totals, kind="stable"):
        i = int(i)
        if i == b:
            continue
        if not rows_local.size:
            return None
        centers_i = prev_rows[live, i].astype(np.int64)
        hit = csr.member(centers_i[rows_local], vals, f_new)
        rows_local = rows_local[hit]
        vals = vals[hit]
    if not rows_local.size:
        return None
    hit_rows = live[rows_local]
    return np.column_stack(
        [prev_rows[hit_rows], vals]
    ).astype(np.int32, copy=False)


_FLAGS_MAX = 50_000_000  # bool scratch cap; beyond this fall back to sort


def _distinct_count(col: np.ndarray, flags: np.ndarray | None) -> int:
    """Distinct-value count for one row-table column (the PR numerator,
    src/utils.cpp:249-274). With a bool scratch buffer: two passes over
    the column plus one count -- no sort. Duplicate-free reset (only
    touched entries are cleared) keeps the buffer reusable."""
    if flags is None or col.size < 2048:
        return int(np.unique(col).size)
    flags[col] = True
    n = int(np.count_nonzero(flags))
    flags[col] = False
    return n


def _select_level(
    candidates: list[tuple[str, ...]],
    tables: dict[tuple[str, ...], np.ndarray],
    ctx: FeatureContext,
    min_prev: float,
    measure: str,
    k: int,
    flags: np.ndarray | None,
    results: list[dict],
) -> list[tuple[str, ...]]:
    """selectPrevColocations for one level (src/miner.cpp:74-90): score
    every candidate from its exact instance table, append prevalent
    records to ``results``, return the level's prevalent patterns."""
    prev_prevalent: list[tuple[str, ...]] = []
    for cand in candidates:
        rows = tables.get(cand)
        dist = (
            [_distinct_count(rows[:, i], flags) for i in range(len(cand))]
            if rows is not None
            else [0] * len(cand)
        )
        m = select_metrics(cand, dist, ctx)
        score = m["wpi"] if measure == "wpi" else m["pi"]
        if score >= min_prev:
            prev_prevalent.append(cand)
            results.append(
                {
                    "pattern": cand,
                    "k": k,
                    "wpi": m["wpi"],
                    "pi": m["pi"],
                    "prs": m["prs"],
                    "n_rows": int(rows.shape[0]) if rows is not None else 0,
                }
            )
    return prev_prevalent


def mine_k2(
    index,
    root_centers: np.ndarray,
    ctx: FeatureContext,
    min_prev: float,
    root: str,
    measure: str = "wpi",
) -> tuple[list[dict], list[str]]:
    """The exact level-2 pass of ``root``'s ordered NR-subtree: metrics
    for every candidate (root, g), rank(g) > rank(root). Returns the
    prevalent records plus the prevalent second features -- the shared
    input every ``mine_branch`` task needs for its k=3 candidate set."""
    csr = as_csr(index)
    flags = np.zeros(csr.n_codes, bool) if csr.n_codes <= _FLAGS_MAX else None
    t1 = {(root,): root_centers.reshape(-1, 1).astype(np.int32, copy=False)}
    ri = ctx.rank[root]
    candidates = [(root, g) for g in ctx.order[ri + 1 :]]
    tables = expand_tables(candidates, t1, csr)
    results: list[dict] = []
    prevalent = _select_level(
        candidates, tables, ctx, min_prev, measure, 2, flags, results
    )
    return results, [p[1] for p in prevalent]


def prefix_table(
    root_centers: np.ndarray, prefix: tuple[str, ...], csr: "StarCSR"
) -> np.ndarray | None:
    """Instance table T(prefix) by chaining the extended-set expansion
    over prefix[1:] (prefix[0] is the subtree root)."""
    t = root_centers.reshape(-1, 1).astype(np.int32, copy=False)
    for f in prefix[1:]:
        t = _expand_one(t, f, csr)
        if t is None:
            return None
    return t


def mine_branch_level(
    index,
    t_prefix: np.ndarray,
    ctx: FeatureContext,
    min_prev: float,
    prefix: tuple[str, ...],
    prevalent_lasts: list[str],
    measure: str = "wpi",
):
    """One exact level k = len(prefix)+1 of the branch rooted at
    ``prefix``: candidates are prefix+(g,) for each later-ranked g in
    ``prevalent_lasts`` (the prevalent extensions of prefix[:-1], i.e.
    both within-branch Lemma-2 subsets hold by construction). Returns
    (records, prevalent candidates, their tables) so the caller can
    either continue the level loop inline or split further."""
    csr = as_csr(index)
    flags = np.zeros(csr.n_codes, bool) if csr.n_codes <= _FLAGS_MAX else None
    rank = ctx.rank
    candidates = [
        prefix + (g,) for g in prevalent_lasts if rank[g] > rank[prefix[-1]]
    ]
    results: list[dict] = []
    tables = expand_tables(candidates, {prefix: t_prefix}, csr)
    prevalent = _select_level(
        candidates, tables, ctx, min_prev, measure, len(prefix) + 1, flags,
        results,
    )
    return results, prevalent, tables


def continue_branch(
    index,
    ctx: FeatureContext,
    min_prev: float,
    measure: str,
    tables: dict[tuple[str, ...], np.ndarray],
    prevalent: list[tuple[str, ...]],
    k: int,
    branch_depth: int,
) -> list[dict]:
    """Run the level loop from level ``k+1`` given level-k prevalent
    patterns and their tables (the inline tail of a branch task)."""
    csr = as_csr(index)
    flags = np.zeros(csr.n_codes, bool) if csr.n_codes <= _FLAGS_MAX else None
    results: list[dict] = []
    prev_tables = tables
    prev_prevalent = prevalent
    candidates = gen_candidates(prev_prevalent, ctx)
    k += 1
    while candidates:
        candidates = filter_candidates(
            candidates, prev_prevalent, prev_tables, min_prev, ctx,
            use_lemma3=False, branch_depth=branch_depth,
        )
        if not candidates:
            break
        tables = expand_tables(candidates, prev_tables, csr)
        prev_prevalent = _select_level(
            candidates, tables, ctx, min_prev, measure, k, flags, results
        )
        if not prev_prevalent:
            break
        prev_tables = tables
        candidates = gen_candidates(prev_prevalent, ctx)
        k += 1
    return results


def mine_branch(
    index,
    root_centers: np.ndarray,
    ctx: FeatureContext,
    min_prev: float,
    root: str,
    second: str,
    prevalent_seconds: list[str],
    measure: str = "wpi",
) -> list[dict]:
    """Mine ONE branch of ``root``'s subtree: all prevalent patterns
    (root, second, ...) with k >= 3.

    The level loop decomposes exactly at the second feature: apriori-gen
    joins two (k-1)-patterns sharing their first k-2 features, so every
    k >= 4 candidate's generating prefixes live in the same branch, and
    the k=3 candidate set {(root, second, g)} needs only the prevalent
    SECOND features (computed once by ``mine_k2``, broadcast here). Both
    k=3 Lemma-2 subsets containing root are therefore checked exactly;
    at k >= 4 the subset dropping ``second`` is cross-branch and its
    check is skipped (``filter_candidates`` branch_depth -- a lost
    prune, never a lost/spurious pattern). Emits k >= 3 records only;
    level 2 is the prep task's output."""
    csr = as_csr(index)
    t12 = prefix_table(root_centers, (root, second), csr)
    if t12 is None:
        return []
    results, prevalent, tables = mine_branch_level(
        csr, t12, ctx, min_prev, (root, second), prevalent_seconds, measure
    )
    if prevalent:
        results += continue_branch(
            csr, ctx, min_prev, measure, tables, prevalent, 3,
            branch_depth=1,
        )
    return results


def mine_local(
    index: dict[tuple[int, str], np.ndarray],
    t1: dict[str, np.ndarray],
    ctx: FeatureContext,
    min_prev: float,
    roots: Iterable[str] | None = None,
    use_lemma3: bool = False,
    measure: str = "wpi",
) -> list[dict]:
    """Run the full level loop; returns one record per prevalent pattern:
    ``{pattern, k, wpi, pi, prs, n_rows}``.

    ``roots=None`` reproduces the serial reference exactly (P1 = all
    features canonically sorted, k=2 candidates = all pairs).
    ``roots=[f]`` mines the ordered NR-subtree of ``f`` only (k=2
    candidates = {(f, g): rank(g) > rank(f)}).
    """
    index = as_csr(index)  # convert once, not per level
    all_feats = ctx.order
    root_set = set(all_feats if roots is None else roots)
    flags = (
        np.zeros(index.n_codes, bool)
        if index.n_codes <= _FLAGS_MAX else None
    )

    prev_tables: dict[tuple[str, ...], np.ndarray] = {
        (f,): idxs.reshape(-1, 1).astype(np.int32) for f, idxs in t1.items()
    }
    # k=2 candidates: canonical pairs rooted in root_set (src/miner.cpp
    # generates all pairs from P1; partitioned by root this is the same set)
    candidates = [
        (a, b)
        for ai, a in enumerate(all_feats)
        if a in root_set
        for b in all_feats[ai + 1 :]
    ]
    prev_prevalent: list[tuple[str, ...]] = []
    results: list[dict] = []
    k = 2
    while candidates:
        if k > 2:
            candidates = filter_candidates(
                candidates, prev_prevalent, prev_tables, min_prev, ctx, use_lemma3
            )
            if not candidates:
                break
        tables = expand_tables(candidates, prev_tables, index)
        prev_prevalent = _select_level(
            candidates, tables, ctx, min_prev, measure, k, flags, results
        )
        if not prev_prevalent:
            break
        prev_tables = tables
        candidates = gen_candidates(prev_prevalent, ctx)
        k += 1
    return results
