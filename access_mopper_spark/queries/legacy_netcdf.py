"""§2.10 legacy composite remainder + NetCDF ingest bridge.

Split from the monolithic queries.py registry (r9 verdict item 6):
same @query registrations, byte-identical bodies; shared helpers
live in queries._core.
"""

from access_mopper_spark.queries._core import *  # noqa: F401,F403
from access_mopper_spark.queries.composites2 import _STRAITS  # noqa: F401


# =====================================================================
# §2.10 legacy composite remainder: tslsi family, depth100, rsdoabsorb,
# ocnrmadvect_offine, areacello/volcello/deptho, ice/snow transports
# =====================================================================

@query(
    "q_calc_tslsi",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND((l_extendedprice * 1e-3
                  - l_quantity * ((1 - (l_tax + 0.05)) * (1 - l_discount)))
                 / ((l_tax + 0.05) + (1 - (l_tax + 0.05)) * l_discount), 6) AS tslsi
    FROM lineitem
    """,
)
def q_calc_tslsi(spark, sf_dir):
    """Land-or-sea-ice surface temperature (calc_tslsi,
    app_functions.py:370-378): subtract the open-ocean contribution from
    the total and renormalize by the land+ice fraction.  Pure Column
    math — map-only, codegen, zero shuffle.  land_frac is offset +0.05
    so the A_lsi denominator is structurally positive (the all-open-
    ocean 0/0 cell is undefined in the reference too)."""
    from access_mopper_spark.functions.legacy import calc_tslsi
    li = load_table(spark, sf_dir, "lineitem")
    ts = F.col("l_extendedprice") * 1e-3
    ts_sea = F.col("l_quantity")
    sic = F.col("l_discount")
    land = F.col("l_tax") + 0.05
    return li.select("l_orderkey", "l_linenumber",
                     R6(calc_tslsi(ts, ts_sea, sic, land)).alias("tslsi"))


@query(
    "q_tslsi_tiles",
    oracle="""
    WITH tf(tile, frac) AS (
      VALUES (1, 0.30), (2, 0.25), (3, 0.15), (4, 0.12),
             (5, 0.10), (6, 0.05), (7, 0.03)
    ),
    src AS (
      SELECT l_orderkey, l_linenumber, l_quantity,
             CAST(l_orderkey % 10 AS DOUBLE) / 10.0 + 0.05 AS land_frac,
             CASE WHEN l_orderkey % 3 = 0 THEN 271.35
                  ELSE 260.0 + CAST(l_orderkey % 7 AS DOUBLE) END AS si_temp
      FROM lineitem
    )
    SELECT l_orderkey,
           ROUND(SUM(l_quantity * frac) * MAX(land_frac)
                 + COALESCE(MAX(CASE WHEN si_temp <> 271.35 THEN si_temp END), 0.0),
                 6) AS tslsi
    FROM src JOIN tf ON tile = l_linenumber
    GROUP BY l_orderkey
    """,
)
def q_tslsi_tiles(spark, sf_dir):
    """Tile-summed land temperature + sentinel-masked sea-ice temperature
    (tslsi + tileFraci317 + apply_landfrac, app_functions.py:266-287,
    354-366): the pft tile-fraction ancillary is a BROADCAST dim table,
    the per-tile loop collapses to one map-side-combined groupBy, the
    CICE open-water sentinel (271.35) masks to null before the combine.
    land_frac and si_temp derive from the group key so they are
    group-constant (the reference's 2-D ancillary fields)."""
    from access_mopper_spark.functions.legacy import tslsi_tiles
    li = load_table(spark, sf_dir, "lineitem")
    tf = spark.createDataFrame(
        [(1, 0.30), (2, 0.25), (3, 0.15), (4, 0.12), (5, 0.10), (6, 0.05), (7, 0.03)],
        ["l_linenumber", "frac"])
    src = (li.withColumn("land_frac", (F.col("l_orderkey") % 10).cast("double") / 10.0 + 0.05)
             .withColumn("si_temp",
                         F.when(F.col("l_orderkey") % 3 == 0, F.lit(271.35))
                          .otherwise(260.0 + (F.col("l_orderkey") % 7).cast("double"))))
    out = tslsi_tiles(src, tf, ["l_orderkey"], temp_col="l_quantity",
                      tile_key="l_linenumber", frac_col="frac",
                      land_frac_col="land_frac", si_temp_col="si_temp")
    return out.select("l_orderkey", R6(F.col("tslsi")).alias("tslsi"))


@query(
    "q_depth100",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(CASE WHEN l_discount > 0
                      THEN (l_extendedprice * 1e-3
                            + (l_extendedprice * 1e-3 + l_quantity)) / 2.0 END,
                 6) AS depth100
    FROM lineitem
    """,
)
def q_depth100(spark, sf_dir):
    """100 m layer mid-point depth (depth100, app_functions.py:452-455):
    (d95+d105)/2 with the deeper field's mask transplanted — the
    CASE-null rendering of the numpy masked mean.  Map-only."""
    from access_mopper_spark.functions.legacy import depth100
    li = load_table(spark, sf_dir, "lineitem")
    d95 = F.col("l_extendedprice") * 1e-3
    d105 = F.when(F.col("l_discount") > 0, d95 + F.col("l_quantity"))
    return li.select("l_orderkey", "l_linenumber",
                     R6(depth100(d95, d105)).alias("depth100"))


@query(
    "q_rsdoabsorb",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(CASE WHEN l_linenumber = 1
                      THEN l_quantity + o_totalprice * 1e-4
                      ELSE l_quantity END, 6) AS rsdoabsorb
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
)
def q_rsdoabsorb(spark, sf_dir):
    """Absorbed shortwave (calcrsdoabsorb, app_functions.py:457-466):
    the 2-D surface flux (orders level) adds into the 3-D heating ONLY
    at the top level; deeper levels pass through.  The reference's
    per-level numpy loop is one level-conditional Column expression
    after an equi-join on the column key."""
    from access_mopper_spark.functions.legacy import rsdoabsorb
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    out = rsdoabsorb(F.col("l_quantity"), F.col("o_totalprice") * 1e-4,
                     F.col("l_linenumber"), 1)
    return j.select("l_orderkey", "l_linenumber", R6(out).alias("rsdoabsorb"))


@query(
    "q_ocnrmadvect",
    oracle="""
    WITH t AS (
      SELECT l_orderkey, l_linenumber,
             CAST(l_quantity AS DOUBLE) AS var0,
             l_discount * 10.0 AS var1,
             l_tax * 10.0 AS var2,
             l_extendedprice * 1e-4 AS var3,
             CAST(l_linenumber AS DOUBLE) AS var4,
             l_quantity * 0.1 AS var5,
             CAST(l_partkey % 5 AS DOUBLE) AS var6,
             CAST(l_suppkey % 3 AS DOUBLE) AS var7,
             1.0 AS var8,
             l_quantity * 2.0 AS var9
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber,
           ROUND((var9 - ((var0 - var1) + var2 + (var3 + var4) + var5
                          + (var1 + var6) + var7 + var8))
                 + var3 + var5, 6) AS adv_residual
    FROM t
    """,
)
def q_ocnrmadvect(spark, sf_dir):
    """Offline residual advection (ocnrmadvect_offine,
    app_functions.py:468-494, salt variant): named linear combination of
    ten tendency terms, ADV = NET − RHS, result = ADV + EIT_a + SUB.
    One projection, zero shuffles — the reference's sequence of numpy
    temporaries fuses into a single codegen stage."""
    from access_mopper_spark.functions.legacy import ocnrmadvect_offine
    li = load_table(spark, sf_dir, "lineitem")
    v = {
        "var0": F.col("l_quantity").cast("double"),
        "var1": F.col("l_discount") * 10.0,
        "var2": F.col("l_tax") * 10.0,
        "var3": F.col("l_extendedprice") * 1e-4,
        "var4": F.col("l_linenumber").cast("double"),
        "var5": F.col("l_quantity") * 0.1,
        "var6": (F.col("l_partkey") % 5).cast("double"),
        "var7": (F.col("l_suppkey") % 3).cast("double"),
        "var8": F.lit(1.0),
        "var9": F.col("l_quantity") * 2.0,
    }
    return li.select("l_orderkey", "l_linenumber",
                     R6(ocnrmadvect_offine(v, "salt")).alias("adv_residual"))


@query(
    "q_ancillary_grids",
    oracle="""
    SELECT p_partkey,
           ROUND(CASE WHEN p_retailprice <= 1500
                      THEN CAST(p_size AS DOUBLE) * 10.0 ELSE 0.0 END, 6) AS areacello,
           ROUND(CAST(p_size AS DOUBLE) * 10.0 * (p_retailprice * 1e-2), 6) AS volcello,
           ROUND(CAST(p_size AS DOUBLE) * 5.0, 6) AS deptho
    FROM part
    """,
)
def q_ancillary_grids(spark, sf_dir):
    """Static grid ancillaries (calc_areacello / calc_volcello_om2 /
    getdeptho, app_functions.py:610-630): the cell-area field takes the
    land mask of a companion field and fills 0; volume = area × layer
    thickness; depth is a plain ancillary projection.  All map-only over
    the (small) grid dim table — at scale these broadcast to every
    consumer, never shuffle."""
    from access_mopper_spark.functions.legacy import calc_areacello, calc_volcello
    part = load_table(spark, sf_dir, "part")
    area = F.col("p_size") * 10.0
    mask_v = F.when(F.col("p_retailprice") <= 1500, F.col("p_retailprice"))
    dht = F.col("p_retailprice") * 1e-2
    return part.select(
        "p_partkey",
        R6(calc_areacello(area, mask_v)).alias("areacello"),
        R6(calc_volcello(area, dht)).alias("volcello"),
        R6(F.col("p_size") * 5.0).alias("deptho"),
    )


@query(
    "q_ice_transports",
    oracle=f"""
    WITH straits(strait, key_lo, key_hi, line_lo, line_hi) AS (
      VALUES {", ".join(f"('{s}', {a}, {b}, {c}, {d})" for s, a, b, c, d in _STRAITS)}
    ),
    grid(line, cell_len) AS (
      VALUES (1, 1100.0), (2, 1200.0), (3, 1300.0), (4, 1400.0),
             (5, 1500.0), (6, 1600.0), (7, 1700.0)
    )
    SELECT strait,
           ROUND(SUM(900.0 * (l_quantity * 0.1) * (l_discount * 10.0) * cell_len) * 1e-9, 6)
             AS ice_mass,
           ROUND(SUM(300.0 * (l_quantity * 0.05) * (l_discount * 10.0) * cell_len) * 1e-9, 6)
             AS snow_mass,
           ROUND(SUM(l_tax * (l_discount * 10.0) * cell_len) * 1e-9, 6) AS ice_area
    FROM straits
    JOIN lineitem ON l_partkey BETWEEN key_lo AND key_hi
                 AND l_linenumber BETWEEN line_lo AND line_hi
    JOIN grid ON line = l_linenumber
    GROUP BY strait
    """,
)
def q_ice_transports(spark, sf_dir):
    """Ice/snow/ice-area strait transports (iceTransport / snowTransport /
    iceareaTransport + fill_transports, calculations.py:323-430):
    ρ·thickness·velocity·cell-length expressions summed across strait
    boxes.  The grid cell-length ancillary and the strait table are both
    BROADCAST; all three transport variants come out of ONE scan (the
    reference recomputes the masked box sum per strait per variant)."""
    from access_mopper_spark.functions.legacy import (ice_transport,
                                                      icearea_transport,
                                                      snow_transport)
    li = load_table(spark, sf_dir, "lineitem")
    straits = spark.createDataFrame(
        _STRAITS, ["strait", "key_lo", "key_hi", "line_lo", "line_hi"])
    grid = spark.createDataFrame(
        [(i, 1000.0 + 100.0 * i) for i in range(1, 8)], ["line", "cell_len"])
    thickness = F.col("l_quantity") * 0.1
    snow_th = F.col("l_quantity") * 0.05
    vel = F.col("l_discount") * 10.0
    L = F.col("cell_len")
    return (
        li.join(F.broadcast(straits),
                F.col("l_partkey").between(F.col("key_lo"), F.col("key_hi"))
                & F.col("l_linenumber").between(F.col("line_lo"), F.col("line_hi")))
        .join(F.broadcast(grid), F.col("line") == F.col("l_linenumber"))
        .groupBy("strait")
        .agg(R6(F.sum(ice_transport(thickness, vel, L)) * 1e-9).alias("ice_mass"),
             R6(F.sum(snow_transport(snow_th, vel, L)) * 1e-9).alias("snow_mass"),
             R6(F.sum(icearea_transport(F.col("l_tax"), vel, L)) * 1e-9).alias("ice_area"))
    )


# =====================================================================
# §2.1 NetCDF ingest bridge: filename pruning → mapInPandas decode →
# tall layout (sources/netcdf_io.py)
# =====================================================================

@query(
    "q_netcdf_ingest",
    oracle="""
    WITH files AS (
      SELECT DISTINCT 'ocean_daily_' || strftime(o_orderdate, '%Y%m%d') || '.nc' AS path,
             o_orderdate AS d
      FROM orders
      WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'
    ),
    grid AS (
      SELECT t.t, l.lev, j.j, i.i
      FROM generate_series(0, 1) t(t), generate_series(0, 1) l(lev),
           generate_series(0, 2) j(j), generate_series(0, 3) i(i)
    )
    SELECT CAST(d + t * INTERVAL 1 DAY AS TIMESTAMP) AS time, lev, j, i,
           ROUND(CAST(datediff('day', DATE '1970-01-01', d) % 100 AS DOUBLE)
                 + t * 100.0 + lev * 10.0 + j * 2.0 + i * 0.5, 6) AS temp,
           ROUND(CAST(datediff('day', DATE '1970-01-01', d) % 100 AS DOUBLE)
                 + 1000.0 + t * 100.0 + lev * 10.0 + j * 2.0 + i * 0.5, 6) AS salt
    FROM files, grid
    """,
)
def q_netcdf_ingest(spark, sf_dir):
    """NetCDF ingest end-to-end (open_mfdataset + check_timestamp +
    _preselect, mop_utils.py:116-122,238-295,330-346): a path-list
    DataFrame is filename-stamp PRUNED before any I/O, repartitioned for
    file-level parallelism, and decoded to the tall (time,lev,j,i)
    layout inside one Arrow-batched mapInPandas.  The decode uses the
    deterministic synthetic opener (xarray isn't shipped here), whose
    values are a pure function of (stamp, indices) — so DuckDB replays
    the ENTIRE ingest, pruning included, and the driver value-hashes it.
    Swapping in xarray_opener changes no plumbing."""
    from access_mopper_spark.sources.netcdf_io import scan_netcdf, synthetic_opener
    orders = load_table(spark, sf_dir, "orders")
    files = orders.select(
        F.concat(F.lit("ocean_daily_"), F.date_format("o_orderdate", "yyyyMMdd"),
                 F.lit(".nc")).alias("path")).distinct()
    out = scan_netcdf(files, ["temp", "salt"],
                      tstart="1995-01-01", tend="1995-03-31 23:59:59",
                      opener=synthetic_opener)
    return out.select("time", "lev", "j", "i",
                      R6(F.col("temp")).alias("temp"),
                      R6(F.col("salt")).alias("salt"))


@query(
    "q_netcdf3_decode",
    oracle="""
    WITH files AS (
      SELECT DATE '1996-01-02' + g.i * INTERVAL 1 DAY AS d
      FROM generate_series(0, 5) g(i)   -- 8 files written, 2 pruned
    ),
    grid AS (
      SELECT t.t, l.lev, j.j, i.i
      FROM generate_series(0, 1) t(t), generate_series(0, 1) l(lev),
           generate_series(0, 2) j(j), generate_series(0, 3) i(i)
    )
    SELECT CAST(d + t * INTERVAL 1 DAY AS TIMESTAMP) AS time, lev, j, i,
           ROUND(CAST(datediff('day', DATE '1970-01-01', CAST(d AS DATE)) % 100
                      AS DOUBLE)
                 + t * 100.0 + lev * 10.0 + j * 2.0 + i * 0.5, 6) AS temp,
           ROUND(CAST(datediff('day', DATE '1970-01-01', CAST(d AS DATE)) % 100
                      AS DOUBLE)
                 + 1000.0 + t * 100.0 + lev * 10.0 + j * 2.0 + i * 0.5, 6) AS salt
    FROM files, grid
    """,
)
def q_netcdf3_decode(spark, sf_dir):
    """REAL NetCDF decode end-to-end: classic NetCDF-3 files are
    materialized on disk (write_nc3_fixture — same SQL-replayable value
    formula as the synthetic opener) and then read back byte-for-byte
    through the vendored pure-numpy codec (sources/netcdf3.py): header
    parse, big-endian record slabs, CF 'days since' time decode — the
    seam the synthetic opener could not exercise (open_mfdataset,
    mop_utils.py:330-346).  Filename pruning drops 2 of the 8 real
    files before any byte is read; the survivors decode inside the same
    Arrow-batched mapInPandas as every other opener.  The driver-side
    fixture write is bounded (8 tiny files standing in for pre-existing
    shared storage), not a data-path collect."""
    import os
    import tempfile

    from access_mopper_spark.sources.netcdf_io import (nc3_opener,
                                                       scan_netcdf,
                                                       write_nc3_fixture)
    fix_dir = _pid_scratch("access_mopper_spark_nc3_fixtures")
    os.makedirs(fix_dir, exist_ok=True)
    paths = []
    for day in range(1, 9):  # 19960101..19960108
        p = os.path.join(fix_dir, f"ocean_daily_199601{day:02d}.nc")
        write_nc3_fixture(p, ["temp", "salt"])
        paths.append(p)
    files = spark.createDataFrame([(p,) for p in paths], ["path"])
    out = scan_netcdf(files, ["temp", "salt"],
                      tstart="1996-01-02", tend="1996-01-07 23:59:59",
                      opener=nc3_opener)
    return out.select("time", "lev", "j", "i",
                      R6(F.col("temp")).alias("temp"),
                      R6(F.col("salt")).alias("salt"))


@query(
    "q_mop_process_e2e",
    oracle="""
    WITH files AS (
      SELECT DATE '1996-01-01' + g.i * INTERVAL 1 DAY AS d
      FROM generate_series(0, 3) g(i)
    ),
    grid AS (
      SELECT t.t, l.lev, j.j, i.i
      FROM generate_series(0, 1) t(t), generate_series(0, 1) l(lev),
           generate_series(0, 2) j(j), generate_series(0, 3) i(i)
    ),
    tall AS (
      SELECT CAST(d + t * INTERVAL 1 DAY AS TIMESTAMP) AS time, lev, j, i,
             CAST(datediff('day', DATE '1970-01-01', CAST(d AS DATE)) % 100
                  AS DOUBLE) + t * 100.0 + lev * 10.0 + j * 2.0 + i * 0.5
               AS temp,
             CAST(datediff('day', DATE '1970-01-01', CAST(d AS DATE)) % 100
                  AS DOUBLE) + 1000.0 + t * 100.0 + lev * 10.0 + j * 2.0
               + i * 0.5 AS salt
      FROM files, grid
    )
    SELECT time, lev, j, i, ROUND(AVG(temp - 0.5 * salt), 6) AS sst,
           CAST(1.0 - 0.5 * lev AS DOUBLE) AS b,
           CAST(10 * j + i AS DOUBLE) AS orog
    FROM tall GROUP BY time, lev, j, i
    """,
)
def q_mop_process_e2e(spark, sf_dir):
    """The reference's whole ``mop_process`` workflow as ONE plan
    (mopper/mopper.py:174-351): REAL classic-NetCDF ingest (vendored
    codec, filename layout per check_timestamp) → calc-DSL derived
    variable (mop_utils.py:899) → calendar resample (daily bins,
    mop_utils time averaging) → CV-validated NATIVE NetCDF-3 write
    (one file per day, executor-side, the chunked cmor_write shape) →
    read-back of the written files through the same real decoder.  The
    returned rows' bytes round-tripped through two genuine NetCDF
    files; DuckDB replays the arithmetic end-to-end, so the driver
    value-hash proves the entire splice.  Overlapping file stamps make
    the daily mean non-trivial (interior days average two source
    files)."""
    import os
    import tempfile

    from access_mopper_spark.operators.resample import time_resample
    from access_mopper_spark.sinks.writer import write_netcdf3_dataset
    from access_mopper_spark.sources.netcdf_io import (nc3_opener,
                                                       scan_netcdf,
                                                       write_nc3_fixture)
    fix_dir = _pid_scratch("access_mopper_spark_nc3_fixtures")
    out_dir = _pid_scratch("access_mopper_spark_nc3_out")
    os.makedirs(fix_dir, exist_ok=True)
    paths = []
    for day in range(1, 5):
        p = os.path.join(fix_dir, f"ocean_daily_199601{day:02d}.nc")
        write_nc3_fixture(p, ["temp", "salt"])
        paths.append(p)
    files = spark.createDataFrame([(p,) for p in paths], ["path"])
    tall = scan_netcdf(files, ["temp", "salt"], opener=nc3_opener)

    ctx = CalcContext(dim_cols=["time", "lev", "j", "i"],
                      var_cols=["temp", "salt"])
    sst = compile_calc("var[0] - 0.5*var[1]", ctx).apply(tall)

    daily = time_resample(sst, "time", "1 day",
                          aggs=[F.mean("value").alias("sst")],
                          group_cols=["lev", "j", "i"],
                          closed="left", label="left")

    # hybrid-height z-factors ride along into the written files: the
    # per-level b coefficient and per-cell orography attach as broadcast
    # ancillary joins (hybrid_axis, mop_utils.py:518-537) and become
    # companion variables in each NetCDF file
    from access_mopper_spark.sinks.writer import attach_zfactors
    b_table = spark.createDataFrame(
        [(l, 1.0 - 0.5 * l, 0.75 - 0.5 * l, 1.25 - 0.5 * l)
         for l in range(2)],
        "lev int, b double, b_lo double, b_hi double")
    orog = spark.createDataFrame(
        [(j, i, float(10 * j + i)) for j in range(3) for i in range(4)],
        "j int, i int, orog double")
    withz = attach_zfactors(daily.select("time", "lev", "j", "i", "sst"),
                            "hybrid_height", b_table, orog,
                            expected_levels=[0, 1])

    manifest = write_netcdf3_dataset(
        withz.withColumn("__fk", F.date_format("time", "yyyyMMdd"))
             .select("__fk", "time", "lev", "j", "i", "sst", "b", "orog"),
        out_dir=out_dir, file_col="__fk", var_cols=["sst", "b", "orog"],
        attrs={"source_id": "SPARK-GRAFT", "source": "access_mopper_spark",
               "experiment_id": "e2e", "frequency": "day", "realm": "ocean",
               "calendar": "proleptic_gregorian", "table_id": "Oday",
               "variant_label": "r1i1p1f1"},
        path_template="{source_id}/{frequency}", cv=True,
    )

    back = scan_netcdf(manifest.select("path"), ["sst", "b", "orog"],
                       opener=nc3_opener)
    return back.select("time", "lev", "j", "i",
                       R6(F.col("sst")).alias("sst"), "b", "orog")


