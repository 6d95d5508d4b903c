"""End-to-end pipeline: the reference's ``mop setup`` + ``mop run``
lifecycle (SURVEY.md §3.1-§3.2) as a library.

Flow, mirroring the reference stage for stage:

1. **Resolve** (setup: var_map/find_matches, mop_setup.py:206-310):
   requested variables ⋈ mapping catalog (broadcast); missing exact
   frequencies fall back down the ladder and gain a ``resample``
   instruction (``nearest_frequency``).
2. **Plan** (setup: define_files): one task row per (variable); file
   splitting policy lives in ``plan_output_files`` / the sink's record
   caps.  Tasks go into a :class:`TaskLedger` (the ``filelist`` table).
3. **Execute** (run: mop_process, mopper.py:174-351): per task —
   bind ``var[i]`` inputs by joining source frames on their shared dims
   (the reference's implicit grid alignment, mop_utils.py:887-899),
   compile the calculation string to a Column plan (never eval),
   resample if instructed, stamp metadata, conform to the registered
   output schema, write through the templated sink.
4. **Ledger update** (run: status write-back, mopper.py:108-112).

The per-task loop is DRIVER-side iteration over a catalog-sized plan —
exactly the reference's work-queue semantics; each task body is a fully
distributed Spark job.  Nothing collects data rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from access_mopper_spark.functions.calc_dsl import CalcContext, compile_calc
from access_mopper_spark.operators.resample import start_day_origin, time_resample
from access_mopper_spark.plans.planner import TaskLedger, nearest_frequency
from access_mopper_spark.sinks.writer import SchemaRegistry, write_dataset


@dataclass
class MappingRow:
    """One mapping-catalog row (mopdb_utils.py:82-106 DDL, minus the
    CMOR-specific attrs carried in ``attrs``)."""

    cmor_var: str
    input_vars: list[str]
    calculation: str | None = None          # calc-DSL string; None = passthrough
    frequency: str = "mon"                  # target frequency
    resample: str | None = None             # '1 hour' / '1 month' / None
    reducer: str = "mean"                   # resample reducer
    units: str | None = None
    attrs: dict = field(default_factory=dict)


def bind_inputs(sources: dict[str, DataFrame], input_vars: list[str],
                dim_cols: list[str], value_col: str = "value") -> DataFrame:
    """Join the input variables' frames on their shared dimension columns
    into a tall frame with ``var0..varN`` value columns — the reference's
    positional ``var[]`` binding + implicit coordinate alignment
    (mop_utils.py:887-899).  Equi-join on dims; Catalyst picks
    sort-merge/broadcast per side size."""
    out = None
    for i, name in enumerate(input_vars):
        if name not in sources:
            raise KeyError(f"input variable {name!r} not found in sources")
        df = sources[name].select(*dim_cols, F.col(value_col).alias(f"var{i}"))
        out = df if out is None else out.join(df, dim_cols, "inner")
    return out


def execute_mapping(spark: SparkSession, row: MappingRow,
                    sources: dict[str, DataFrame], dim_cols: list[str],
                    ts_col: str = "time") -> DataFrame:
    """Run one mapping row to a result frame (extract_var semantics,
    mop_utils.py:868-927): bind → calc → optional resample → stamped
    output columns (dims + ``value``)."""
    from access_mopper_spark.functions.macros import default_macros

    bound = bind_inputs(sources, row.input_vars, dim_cols)
    if row.calculation:
        ctx = CalcContext(dim_cols=list(dim_cols), macros=default_macros())
        plan = compile_calc(row.calculation, ctx)
        computed = plan.apply(bound, out_col="value")
    else:
        computed = bound.select(*dim_cols, F.col("var0").alias("value"))
    if row.resample:
        other_dims = [d for d in dim_cols if d != ts_col and d in computed.columns]
        agg = getattr(F, "avg" if row.reducer == "mean" else row.reducer)
        computed = time_resample(
            computed, ts_col, row.resample,
            [agg("value").alias("value")],
            group_cols=other_dims, closed="right",
            origin=start_day_origin(computed, ts_col),
        ).select(*[c for c in dim_cols if c in other_dims + [ts_col]], "value")
    return computed


def resolve_requests(requests: DataFrame, catalog: DataFrame,
                     available: DataFrame, key: str = "cmor_var") -> DataFrame:
    """Setup-phase resolution: requested (var, frequency) ⋈ catalog, with
    the nearest-finer-frequency fallback marking ``needs_resample``."""
    matched = requests.join(F.broadcast(catalog.drop("frequency")), key, "left")
    return nearest_frequency(matched, available, [key])


def run_pipeline(spark: SparkSession, rows: list[MappingRow],
                 sources: dict[str, DataFrame], dim_cols: list[str],
                 registry: SchemaRegistry, base_dir: str,
                 path_template: str = "{table}/{cmor_var}",
                 ts_col: str = "time",
                 resume: TaskLedger | None = None) -> TaskLedger:
    """Execute every mapping row through the sink, maintaining the task
    ledger (pool_handler + status write-back, mopper.py:472-504).

    ``resume``: a ledger from a previous (partial) run — tasks already
    marked ``processed`` are skipped (the reference's skip-if-exists
    idempotent restart, mopper.py:393, :434-437); pass ``override`` by
    simply not passing the old ledger."""
    if resume is not None:
        ledger = resume
        done = {r["task_id"] for r in
                resume.df.where("status = 'processed'").collect()}
        rows = [r for r in rows if r.cmor_var not in done]
    else:
        plan = spark.createDataFrame(
            [(r.cmor_var,) for r in rows], ["task_id"])
        ledger = TaskLedger(plan)
    outcomes = []
    for row in rows:
        try:
            result = execute_mapping(spark, row, sources, dim_cols, ts_col)
            registry.register(
                row.cmor_var,
                registry.get(row.cmor_var)[0] if _registered(registry, row.cmor_var)
                else result.schema,
                {"table": row.attrs.get("table", "tbl"), "cmor_var": row.cmor_var,
                 **row.attrs},
            )
            write_dataset(result, registry, row.cmor_var, base_dir, path_template)
            outcomes.append((row.cmor_var, "processed"))
        except Exception:       # noqa: BLE001 — task failures land in the ledger
            outcomes.append((row.cmor_var, "failed"))
    if not outcomes:
        return ledger
    status = spark.createDataFrame(outcomes, ["task_id", "status"])
    return ledger.mark(status)


def _registered(registry: SchemaRegistry, name: str) -> bool:
    try:
        registry.get(name)
        return True
    except KeyError:
        return False
