"""LIVE-POSTGRES validation of the JDBC sinks' server-side SQL (r12 —
closes the VERDICT residual "the statements have never executed against
a real server").

No Postgres JDBC jar ships with this Spark build, so the distributed
write path (``df.write.jdbc``) stays env-gated in test_jdbc.py — but the
server-side STATEMENTS the sinks issue are plain strings
(``JdbcSink._keys_query``, ``JdbcUpsertSink._promote_sql`` /
``_drop_sql``, golden-locked in test_jdbc.py), and the container ships
postgres binaries.  This module boots a real throwaway server
(initdb + pg_ctl as the unprivileged ``nobody`` user, unix socket only —
no TCP, no config outside the test tmpdir) and executes those EXACT
strings through ``psql``, asserting the semantics the loader depends
on: day-scoped uuid-only key reads, set-based ON CONFLICT DO NOTHING
promotion that is idempotent under re-runs and correct under
cross-batch conflicts, and staging-table cleanup.

Everything is skipped cleanly where the binaries, the ``nobody`` user,
or ``setpriv`` are unavailable.
"""

from __future__ import annotations

import shutil
import subprocess

import pytest

_REQUIRED = ["initdb", "pg_ctl", "psql", "setpriv"]


def _missing_tools() -> list[str]:
    missing = [t for t in _REQUIRED if shutil.which(t) is None]
    if not missing:
        probe = subprocess.run(
            ["id", "nobody"], capture_output=True, text=True
        )
        if probe.returncode != 0:
            missing.append("user:nobody")
    return missing


pytestmark = pytest.mark.skipif(
    bool(_missing_tools()), reason=f"needs {_missing_tools()}"
)


def _as_nobody(args: list[str]) -> list[str]:
    return [
        "setpriv",
        "--reuid=nobody",
        "--regid=nogroup",
        "--clear-groups",
    ] + args


@pytest.fixture(scope="module")
def pg(tmp_path_factory):
    """A throwaway single-user Postgres on a unix socket; yields a
    ``run_sql(sql) -> list[str]`` callable (psql -At rows).

    The datadir lives directly under /tmp (not pytest's tmp tree, whose
    root-owned 0700 ancestors the unprivileged server user cannot
    traverse) and is removed on teardown."""
    import pathlib
    import tempfile

    base = pathlib.Path(tempfile.mkdtemp(prefix="pglive_", dir="/tmp"))
    data, sock = base / "data", base / "sock"
    data.mkdir()
    sock.mkdir()
    base.chmod(0o777)
    subprocess.run(["chown", "-R", "nobody:nogroup", str(base)], check=True)
    r = subprocess.run(
        _as_nobody(
            [
                shutil.which("initdb"),
                "-D", str(data), "-U", "hfp", "--no-sync", "-A", "trust",
            ]
        ),
        capture_output=True, text=True,
    )
    if r.returncode != 0:
        pytest.skip(f"initdb failed: {r.stderr[-300:]}")
    r = subprocess.run(
        _as_nobody(
            [
                shutil.which("pg_ctl"), "-D", str(data), "-w",
                "-l", str(base / "log"),
                "-o", f"-k {sock} -c listen_addresses=''",
                "start",
            ]
        ),
        capture_output=True, text=True,
    )
    if r.returncode != 0:
        pytest.skip(f"pg_ctl start failed: {r.stderr[-300:]}")

    def run_sql(sql: str) -> list[str]:
        out = subprocess.run(
            [
                "psql", "-X", "-At", "-v", "ON_ERROR_STOP=1",
                "-h", str(sock), "-U", "hfp", "-d", "postgres",
                "-c", sql,
            ],
            capture_output=True, text=True,
        )
        assert out.returncode == 0, f"psql failed on {sql!r}: {out.stderr}"
        return [line for line in out.stdout.splitlines() if line]

    try:
        yield run_sql
    finally:
        subprocess.run(
            _as_nobody(
                [shutil.which("pg_ctl"), "-D", str(data), "-m", "immediate", "stop"]
            ),
            capture_output=True, text=True,
        )
        shutil.rmtree(base, ignore_errors=True)


def test_keys_query_is_day_scoped_and_uuid_only_on_live_server(pg):
    """JdbcSink._keys_query — the pushed-down remote dedup read
    (utils/getEvents.ts:10-15 parity) — executed verbatim as the
    subselect Spark's JDBC reader wraps: only the requested day's uuids
    come back, one column wide."""
    from hfp_loader_spark.sink import JdbcSink

    pg(
        "CREATE TABLE public.vehicleposition ("
        "uuid uuid UNIQUE, oday date, lat double precision)"
    )
    pg(
        "INSERT INTO public.vehicleposition VALUES "
        "('00000000-0000-0000-0000-000000000001','2021-02-09',60.1),"
        "('00000000-0000-0000-0000-000000000002','2021-02-09',60.2),"
        "('00000000-0000-0000-0000-000000000003','2021-02-10',60.3)"
    )
    q = JdbcSink._keys_query("vehicleposition", "2021-02-09")
    rows = pg(f"SELECT * FROM {q} ORDER BY 1")
    assert rows == [
        "00000000-0000-0000-0000-000000000001",
        "00000000-0000-0000-0000-000000000002",
    ]
    # the dedup identity: each row is the bare uuid, nothing else
    assert all("|" not in r for r in rows)
    with pytest.raises(ValueError):
        JdbcSink._keys_query("vehicleposition", "2021-02-09'; DROP TABLE x--")


def test_upsert_promotion_is_idempotent_and_conflict_safe_live(pg):
    """JdbcUpsertSink._promote_sql / _drop_sql executed verbatim on a
    live server: first promotion inserts everything, a crash-retry
    re-promotion of the SAME staging table inserts nothing (the
    exactly-once property the sink exists for), a later batch sharing a
    uuid inserts only its new rows, and the staging drop works."""
    from hfp_loader_spark.sink import JdbcUpsertSink

    sink = JdbcUpsertSink(url="jdbc:ignored://unit")
    cols = ["uuid", "oday", "lat"]
    pg(
        "CREATE TABLE public.stopevent ("
        "uuid uuid UNIQUE, oday date, lat double precision)"
    )
    # stage DDL is the sink's own statement (empty CTAS off the target)
    pg(sink._stage_create_sql("stopevent", "stopevent__stage_aaa"))
    pg(
        'INSERT INTO public."stopevent__stage_aaa" VALUES '
        "('00000000-0000-0000-0000-00000000000a','2021-02-09',1.0),"
        "('00000000-0000-0000-0000-00000000000b','2021-02-09',2.0)"
    )
    promote = sink._promote_sql("stopevent", "stopevent__stage_aaa", cols)
    pg(promote)
    assert pg("SELECT count(*) FROM public.stopevent") == ["2"]
    # crash between promote and drop → the re-run re-promotes: no dupes
    pg(promote)
    assert pg("SELECT count(*) FROM public.stopevent") == ["2"]

    # a second batch overlapping on uuid 'b' adds only uuid 'c'
    pg(sink._stage_create_sql("stopevent", "stopevent__stage_bbb"))
    pg(
        'INSERT INTO public."stopevent__stage_bbb" VALUES '
        "('00000000-0000-0000-0000-00000000000b','2021-02-09',99.0),"
        "('00000000-0000-0000-0000-00000000000c','2021-02-09',3.0)"
    )
    pg(sink._promote_sql("stopevent", "stopevent__stage_bbb", cols))
    assert pg("SELECT count(*) FROM public.stopevent") == ["3"]
    # the conflicting row kept its ORIGINAL payload (DO NOTHING, not
    # DO UPDATE — reference semantics: first write wins, upsert.ts:49-52)
    assert pg(
        "SELECT lat FROM public.stopevent WHERE uuid = "
        "'00000000-0000-0000-0000-00000000000b'"
    ) == ["2"]

    pg(sink._drop_sql("stopevent__stage_aaa"))
    pg(sink._drop_sql("stopevent__stage_bbb"))
    assert pg(
        "SELECT count(*) FROM information_schema.tables "
        "WHERE table_name LIKE 'stopevent__stage%'"
    ) == ["0"]
    # DROP IF EXISTS is retry-safe too
    pg(sink._drop_sql("stopevent__stage_aaa"))


def test_full_day_load_lands_in_live_postgres_and_keys_query_round_trips(
    pg, spark, tmp_path
):
    """The whole reference-parity pipeline against a REAL database:
    run the golden-fixture day load (CSV scan → typed coercion → dedup
    → routing) to parquet, CREATE the four sink tables from the
    engine's generated DDL (schema.postgres_ddl — typed columns incl.
    native uuid/date/timestamptz/boolean), land every table via COPY,
    and verify server-side: row counts match, the net falsy→NULL
    coercion is visible as SQL NULLs (the SURVEY §1.2 trap), and
    JdbcSink._keys_query returns EXACTLY the loaded day's uuid set —
    the dedup read path proven on real loaded data, not a synthetic
    two-row table."""
    import sys

    import duckdb

    sys.path.insert(0, "tests")
    from hfp_fixtures import write_fixture

    from hfp_loader_spark.job import hfp_load
    from hfp_loader_spark.schema import SINK_TABLES, postgres_ddl
    from hfp_loader_spark.sink import JdbcSink, ParquetSink

    work = tmp_path / "day"
    write_fixture(work, date="2021-02-09")
    stage = tmp_path / "stage"
    report = hfp_load(
        spark, str(work), "2021-02-09", ParquetSink(str(stage))
    )
    assert report.total_inserted > 0

    con = duckdb.connect()
    loaded = {
        t: n for t, n in report.inserted_by_table.items() if n > 0
    }
    csv_dir = tmp_path / "csv"
    csv_dir.mkdir()
    from hfp_loader_spark.schema import HFP_COLUMNS

    ddl_cols = ", ".join(f'"{c}"' for c in ["id", *HFP_COLUMNS])
    for table, n in loaded.items():
        # the module-scoped server is shared with the unit-SQL tests,
        # which create skinny tables under the same names
        pg(f'DROP TABLE IF EXISTS public."{table}"')
        pg(postgres_ddl(table))
        # export through duckdb so NULLs stay empty-unquoted and
        # timestamps render ISO — the COPY wire format; explicit DDL
        # column order (the staging parquet is oday-partitioned, which
        # reorders SELECT *)
        out = csv_dir / f"{table}.csv"
        con.execute(
            f"COPY (SELECT {ddl_cols} FROM read_parquet("
            f"'{stage}/{table}/**/*.parquet', hive_partitioning=1)) "
            f"TO '{out}' (FORMAT csv, HEADER false)"
        )
        pg(
            f"\\copy public.{table} FROM '{out}' "
            "WITH (FORMAT csv, NULL '')"
        )
        assert pg(f"SELECT count(*) FROM public.{table}") == [str(n)]

    # the net falsy→NULL trap, observed in the DATABASE like the
    # reference's: zero/empty/false never stored (upsert.ts:36)
    assert pg(
        "SELECT count(*) FROM public.vehicleposition "
        "WHERE lat = 0 OR drst = false OR desi = ''"
    ) == ["0"]
    assert int(
        pg("SELECT count(*) FROM public.vehicleposition WHERE lat IS NULL")[0]
    ) > 0
    # id is never populated (dead column, SURVEY §1.3)
    assert pg(
        "SELECT count(*) FROM public.vehicleposition WHERE id IS NOT NULL"
    ) == ["0"]

    # the pushed-down dedup read returns exactly the loaded day's keys
    q = JdbcSink._keys_query("vehicleposition", "2021-02-09")
    live_keys = set(pg(f"SELECT * FROM {q}"))
    parquet_keys = {
        r["uuid"]
        for r in spark.read.parquet(f"{stage}/vehicleposition")
        .select("uuid")
        .collect()
    }
    assert live_keys == parquet_keys and len(live_keys) > 0
    # ... and the other day's scope is empty
    q2 = JdbcSink._keys_query("vehicleposition", "2021-02-10")
    assert pg(f"SELECT count(*) FROM {q2}") == ["0"]
