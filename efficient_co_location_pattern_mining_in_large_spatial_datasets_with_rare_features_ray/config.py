"""Mining configuration.

Mirrors the reference AppConfig (include/config.h:20-46) plus the knobs a
distributed engine needs (tile size, bucket counts, parallelism hints).
The reference's ``min_cond_prob`` is parsed but unused there
(src/config.cpp:42); we keep it for config-file parity only.
"""

from __future__ import annotations

from dataclasses import dataclass, field

EPSILON_SMALL = 1e-9  # reference include/constants.h EPSILON_SMALL
EPSILON_DELTA = 1e-9  # reference include/constants.h EPSILON_DELTA


@dataclass
class MiningConfig:
    # Algorithm thresholds (reference include/config.h:39-45 defaults)
    neighbor_distance: float = 5.0
    min_prevalence: float = 0.6
    min_cond_prob: float = 0.5  # parsed-but-unused in the reference; kept for parity

    # Grid / shuffle knobs (ours)
    tile_cells: int = 32        # cells per tile side; halo overhead ~ 2/tile_cells
    # hash buckets for the pair/star exchanges. None (default) adapts to
    # BOTH cluster size (>= ~4 per cpu for balance) and input size (keep
    # per-bucket rows bounded so one task's working set stays inside a
    # worker's warm allocator arena -- measured: 16 buckets on the 1.6M
    # fixture ballooned the star stage's CPU 22 s -> 127 s purely from
    # first-touch page faults on the 4x working set). Measured at 16
    # cpus / 1.6M rows: 64 best, 128 ~20% slower (4x the inter-stage
    # slice objects -> arg-resolution latency between waves), 32 worse
    # (bucket skew stragglers).
    star_buckets: int | None = None
    mining_concurrency: int | None = None  # cap on concurrent subtree groups
    # split each subtree's k>=3 level loop into one task per prevalent
    # second feature (exact decomposition; breaks the rarest-subtree
    # straggler that otherwise bounds scaling)
    branch_split: bool = True
    # split a BRANCH again at the third feature when its exact k=3
    # tables exceed this many rows (the heaviest branch is otherwise one
    # task bounding the job tail). None -> adaptive default; 0 -> never.
    branch_split_rows: int | None = None

    # Interest measure: "wpi" (rare-feature weighted, reference default) or "pi"
    measure: str = "wpi"

    # Lemma 3 (reference src/miner.cpp:185-205) is only valid when the whole
    # level loop runs in one partition (paper Alg. 3 disables it per-subtree).
    use_lemma3: bool = False

    # Optional fixed grid origin; None -> global (min x, min y) scan like the
    # reference (src/spatial_index.cpp:52-61).
    grid_origin: tuple[float, float] | None = None

    # Checkpointing
    checkpoint_dir: str | None = None

    extra: dict = field(default_factory=dict)

    def cell_size(self) -> float:
        return float(self.neighbor_distance)

    # target instance rows per exchange bucket when adapting star_buckets
    # to input size (1.6M rows / 25k = 64 buckets, the measured optimum)
    ROWS_PER_BUCKET = 25_000

    def resolved_star_buckets(self, n_rows: int | None = None) -> int:
        """Bucket count for the pair/star exchanges: the configured
        value, or adapt to cluster + input size (see field comment):
        ``min(64, max(16, 4*cpus, n_rows/25k))`` -- the data term keeps
        each bucket task's working set bounded (page-fault locality),
        the cpu term keeps small jobs from under-fanning."""
        if self.star_buckets is not None:
            return int(self.star_buckets)
        try:
            import ray

            cpus = (
                int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized()
                else 8
            )
        except Exception:
            cpus = 8
        size_term = (n_rows or 0) // self.ROWS_PER_BUCKET
        return min(64, max(16, 4 * cpus, size_term))

    def resolved_branch_split_rows(self) -> int:
        """Row threshold for the third-feature branch split (0 = off).
        Default 250k exact-k3 rows: below it the inline level loop
        finishes in well under a second, so a deeper split would only
        add task/plasma overhead; above it the branch is a potential
        job-tail straggler worth decomposing (the 1.6M-row bench
        fixture's slowest branches, 3-5 s each, carry 300-600k k3
        rows)."""
        if self.branch_split_rows is not None:
            return int(self.branch_split_rows)
        return 250_000


def load_config_file(path: str) -> MiningConfig:
    """Parse the reference's ``key=value`` config format
    (src/config.cpp:20-49): ``#`` comments, unknown keys ignored,
    missing file -> defaults."""
    cfg = MiningConfig()
    try:
        with open(path) as f:
            lines = f.readlines()
    except OSError:
        return cfg
    for line in lines:
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        key, _, val = line.partition("=")
        key, val = key.strip(), val.strip()
        if key == "neighbor_distance":
            cfg.neighbor_distance = float(val)
        elif key == "min_prevalence":
            cfg.min_prevalence = float(val)
        elif key == "min_cond_prob":
            cfg.min_cond_prob = float(val)
        elif key in ("dataset_path", "output_path", "debug_mode"):
            cfg.extra[key] = val
    return cfg
