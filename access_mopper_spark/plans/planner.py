"""Logical→physical planner: the reference's setup phase re-expressed as
DataFrame transformations.

Three capabilities (SURVEY.md §3.1 steps 4-5, §2.5 file interval planning):

- ``nearest_frequency``: when a requested (variable, frequency) has no
  exact source, fall back to the nearest *finer* frequency on the ordered
  ladder and synthesize a resample instruction (reference ``find_nearest``,
  mop_setup.py:108-153; ladder :136-140).
- ``plan_output_files``: split each variable's timeline into output-file
  intervals so estimated file size respects ``max_size`` (reference
  ``compute_fsize``/``define_files``, setup_utils.py:428-482, :591-644).
  At 100 TB this is the sink partitioning policy: rows-per-file chosen
  from bytes-per-step, not a fixed count.
- ``TaskLedger``: the ``filelist`` work-queue semantics (setup_utils.py:
  168-204) — idempotent status transitions over a plan DataFrame, so a
  restarted job re-selects only unprocessed rows.

Everything is a pure DataFrame plan; catalogs are small and broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Coarse → fine, exactly the reference ladder (mop_setup.py:136-140).
FREQ_LADDER = ["10yr", "yr", "mon", "10day", "7day", "day",
               "12hr", "6hr", "3hr", "1hr", "30min", "10min"]

#: Timesteps per day for each output frequency — the reference's
#: ``nstep_day`` table verbatim (compute_fsize, setup_utils.py:446-449).
NSTEP_DAY = {"10min": 144.0, "30min": 48.0, "1hr": 24.0, "3hr": 8.0,
             "6hr": 4.0, "day": 1.0, "10day": 0.1, "mon": 1.0 / 30.0,
             "yr": 1.0 / 365.0, "dec": 1.0 / 3652.0, "fx": 1.0 / 5000.0}

#: Candidate file intervals, longest → shortest, as (label, days) — the
#: reference's selection order (setup_utils.py:478-481).  The reference
#: builds each size from size['days=1'] (months=1 → ×30, years=1 → ×360,
#: years=10 → ×3600, years=100 → ×36000), so the multipliers below are
#: its *approximate-calendar* days, not astronomical ones.
INTERVAL_LADDER = [("years=100", 36000.0), ("years=10", 3600.0),
                   ("years=1", 360.0), ("months=1", 30.0),
                   ("days=7", 7.0), ("days=1", 1.0),
                   ("days=0.5", 0.5), ("days=0.25", 0.25)]


def ladder_rank() -> DataFrame | None:
    """Returned as a list of (freq, rank); callers build a broadcast dim."""
    return list(enumerate(FREQ_LADDER))


def nearest_frequency(requests: DataFrame, available: DataFrame,
                      key_cols: list[str], freq_col: str = "frequency") -> DataFrame:
    """For each request, pick the exact-frequency source if present, else
    the nearest finer (higher-rate) frequency, marking ``needs_resample``.

    Both inputs carry ``key_cols + [freq_col]``.  Output: one row per
    request with ``src_frequency`` and ``needs_resample``; requests with
    no finer-or-equal source get a null src (the reference's ``no_match``
    tier).  Plan shape: two broadcast rank joins + one min_by aggregate —
    a single shuffle on the request key.
    """
    spark = requests.sparkSession
    rank = spark.createDataFrame(
        [(f, i) for i, f in enumerate(FREQ_LADDER)], ["__f", "__rank"])

    req = requests.join(F.broadcast(rank), requests[freq_col] == rank["__f"]) \
                  .select(*key_cols, F.col(freq_col), F.col("__rank").alias("__req_rank"))
    avail = available.join(F.broadcast(rank), available[freq_col] == rank["__f"]) \
                     .select(*[F.col(c).alias(f"__a_{c}") for c in key_cols],
                             F.col(freq_col).alias("__a_freq"),
                             F.col("__rank").alias("__a_rank"))

    cond = None
    for c in key_cols:
        eq = F.col(c) == F.col(f"__a_{c}")
        cond = eq if cond is None else cond & eq
    # finer-or-equal candidates only (same-or-higher rate on the ladder)
    joined = req.join(avail, cond & (F.col("__a_rank") >= F.col("__req_rank")), "left")
    return (
        joined.groupBy(*key_cols, freq_col, "__req_rank")
        .agg(F.min_by("__a_freq", "__a_rank").alias("src_frequency"),
             F.min("__a_rank").alias("__src_rank"))
        .select(*key_cols, freq_col, "src_frequency",
                F.when(F.col("__src_rank").isNull(), F.lit(None).cast("boolean"))
                 .otherwise(F.col("__src_rank") != F.col("__req_rank"))
                 .alias("needs_resample"))
    )


def adjust_plev_size(size_col, calc_col, levnum_col):
    """Calculation-aware per-step size estimate — reference ``adjust_size``
    (setup_utils.py:405-424): when the mapping's calculation is a
    level-changing ``plevinterp(var, plev, N)`` macro, the output grid has
    N pressure levels instead of the source's ``levnum`` model levels, so
    the byte estimate rescales by ``N / levnum`` *before* the file-interval
    choice.  Any other calculation leaves the estimate unchanged (the
    reference returns ``insize`` untouched for them).

    Pure Column math (no UDF): the target level count is the last
    comma-separated token of the calculation string with the closing
    paren stripped — exactly the reference's
    ``float(calc.split(',')[-1].replace(')', ''))``.  ``try_cast`` keeps
    malformed calculations NULL-safe under ANSI mode.
    """
    plevnum = F.regexp_replace(
        F.element_at(F.split(F.col(calc_col), ","), -1), r"[)\s]", ""
    ).try_cast("double")
    return F.when(
        F.col(calc_col).contains("plevinterp"),
        F.col(size_col) / F.col(levnum_col) * plevnum,
    ).otherwise(F.col(size_col))


def choose_file_interval(vars_df: DataFrame, grid_size_col: str,
                         freq_col: str, span_days_col: str,
                         max_size: float) -> DataFrame:
    """Pick the output-file calendar interval per variable — reference
    ``compute_fsize`` (setup_utils.py:428-482): per-timestep size in MB is
    ``int(grid_size) / 1024**2`` (bytes, truncated); a whole-span single
    file wins if its size fits ``max_size * 1.1``; otherwise the first
    interval from longest to shortest (years=100 … days=0.25) that fits;
    if nothing fits the reference's loop falls through holding days=0.25.

    Adds ``interval`` (label) and ``interval_size_mb``.  ``span_days_col``
    is the whole-run extent in days (the reference's ``delta``).  All
    selection logic is one chained CASE per row — map-only at any scale.
    """
    thresh = F.lit(max_size * 1.1)
    nstep = F.lit(None).cast("double")
    for f, n in NSTEP_DAY.items():
        nstep = F.when(F.col(freq_col) == f, F.lit(n)).otherwise(nstep)
    size_tstep = F.floor(F.col(grid_size_col)).cast("double") / F.lit(1048576.0)
    size_day1 = size_tstep * nstep
    span_size = size_day1 * F.col(span_days_col).cast("double")

    label = F.when(span_size <= thresh,
                   F.concat(F.lit("days="), F.col(span_days_col).cast("string")))
    size = F.when(span_size <= thresh, span_size)
    for name, days in INTERVAL_LADDER:
        cand = size_day1 * F.lit(days)
        label = label.when(cand <= thresh, F.lit(name))
        size = size.when(cand <= thresh, cand)
    # reference for-loop exhausts leaving interval='days=0.25'
    label = label.otherwise(F.lit("days=0.25"))
    size = size.otherwise(size_day1 * F.lit(0.25))
    return vars_df.withColumn("interval", label) \
                  .withColumn("interval_size_mb", size)


def plan_output_files(vars_df: DataFrame, size_col: str, nsteps_col: str,
                      max_size: float, key_cols: list[str]) -> DataFrame:
    """Split each variable's ``nsteps`` timeline into file intervals of
    ``floor(max_size / size_per_step)`` steps (≥1), emitting one plan row
    per output file with [step_start, step_end) — ``compute_fsize`` /
    ``define_files`` semantics without the calendar (steps are abstract
    indices; callers map them to timestamps).

    Distributed: explode over a per-variable ``sequence`` — no driver loop,
    so a million-variable catalog plans in parallel.
    """
    steps_per_file = F.greatest(
        F.lit(1).cast("long"),
        F.floor(F.lit(float(max_size)) / F.col(size_col)).cast("long"))
    nfiles = F.ceil(F.col(nsteps_col).cast("double") / steps_per_file).cast("long")
    return (
        vars_df.withColumn("__spf", steps_per_file)
        .withColumn("__nfiles", nfiles)
        .select(*key_cols, F.col(size_col), F.col(nsteps_col), "__spf",
                F.explode(F.sequence(F.lit(0).cast("long"), F.col("__nfiles") - 1))
                 .alias("file_idx"))
        .withColumn("step_start", F.col("file_idx") * F.col("__spf"))
        .withColumn("step_end", F.least(F.col(nsteps_col).cast("long"),
                                        (F.col("file_idx") + 1) * F.col("__spf")))
        .select(*key_cols, "file_idx", "step_start", "step_end",
                ((F.col("step_end") - F.col("step_start")) * F.col(size_col))
                .alias("est_size"))
    )


class TaskLedger:
    """``filelist`` work-queue semantics as idempotent DataFrame ops.

    The reference mutates a SQLite row per task (status unprocessed →
    processed/failed, mopper.py:98-112, update_db.py).  Here the ledger is
    a DataFrame keyed by ``task_id``; updates are expressed as joins so the
    whole thing stays declarative and merge-able into any table format
    that supports upsert.
    """

    def __init__(self, plan: DataFrame, task_id: str = "task_id"):
        self.task_id = task_id
        self.df = plan.withColumn("status", F.lit("unprocessed"))

    def pending(self) -> DataFrame:
        """Rows still to run — the reference's ``status=='unprocessed'``
        selection (mopper.py:98-99)."""
        return self.df.where(F.col("status") == "unprocessed")

    def mark(self, results: DataFrame, status_col: str = "status") -> "TaskLedger":
        """Apply a batch of (task_id, status) outcomes; unknown ids are
        ignored, unlisted rows keep their status (idempotent restart)."""
        updates = results.select(F.col(self.task_id).alias("__uid"),
                                 F.col(status_col).alias("__new"))
        merged = (
            self.df.join(F.broadcast(updates),
                         self.df[self.task_id] == F.col("__uid"), "left")
            .withColumn("status", F.coalesce(F.col("__new"), F.col("status")))
            .drop("__uid", "__new")
        )
        out = TaskLedger.__new__(TaskLedger)
        out.task_id = self.task_id
        out.df = merged
        return out
