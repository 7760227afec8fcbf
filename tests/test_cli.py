"""CLI regression checks that don't need a SparkSession (the Spark
subcommands are driven end-to-end by the verify workflow — an
in-process test would stop the shared test session)."""

from __future__ import annotations

import subprocess
import sys


def test_cli_list_names_every_registered_query():
    out = subprocess.run(
        [sys.executable, "-m", "i3cols_spark.cli", "list"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
        check=True,
    ).stdout
    listed = {line.split("\t")[0] for line in out.strip().splitlines()}
    from i3cols_spark.operators import ORACLES, QUERIES

    assert listed == set(QUERIES)
    # oracle/rows-only tags faithful to the registry
    for line in out.strip().splitlines():
        name, kind = line.split("\t")
        assert kind == ("oracle" if name in ORACLES else "rows-only")


def test_cli_unknown_subcommand_exits_nonzero():
    proc = subprocess.run(
        [sys.executable, "-m", "i3cols_spark.cli", "frobnicate"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=60,
    )
    assert proc.returncode != 0
    assert "invalid choice" in proc.stderr


def test_cli_npy_bridge_round_trip(tmp_path):
    from i3cols_spark.cli import main

    src = "/root/testdata/sf0.001/nation.parquet"
    npy = str(tmp_path / "npy")
    back = str(tmp_path / "back")
    assert main(["--cpus", "4", "export-npy", src, "--out", npy]) == 0
    import os

    assert os.path.isfile(os.path.join(npy, "n_name", "data.npy"))
    assert main(["--cpus", "4", "import-npy", npy, "--out", back]) == 0
    import duckdb

    n_src, n_back = (
        duckdb.sql(f"SELECT count(*) FROM '{src}'").fetchone()[0],
        duckdb.sql(f"SELECT count(*) FROM '{back}/*.parquet'").fetchone()[0],
    )
    assert n_src == n_back


def test_cli_compact_zstd_round_trip(tmp_path):
    """SURVEY S8 (compress/decompress ≙ parquet codec): `compact` must
    rewrite with the zstd codec actually applied on disk and preserve
    every value through the round trip."""
    from i3cols_spark.cli import main

    src = "/root/testdata/sf0.001/orders.parquet"
    out = str(tmp_path / "compacted")
    assert main(["--cpus", "4", "compact", src, "--out", out, "--target-files", "1"]) == 0

    import glob

    import duckdb
    import pyarrow.parquet as pq

    files = glob.glob(f"{out}/*.parquet")
    assert len(files) == 1  # --target-files honored
    md = pq.ParquetFile(files[0]).metadata
    codecs = {
        md.row_group(g).column(c).compression
        for g in range(md.num_row_groups)
        for c in range(md.row_group(g).num_columns)
    }
    assert codecs == {"ZSTD"}
    diff = duckdb.sql(
        f"SELECT count(*) FROM ((SELECT * FROM '{src}' EXCEPT SELECT * FROM '{out}/*.parquet')"
        f" UNION ALL (SELECT * FROM '{out}/*.parquet' EXCEPT SELECT * FROM '{src}'))"
    ).fetchone()[0]
    assert diff == 0


def test_cli_sql_over_dataset_views(tmp_path, capsys):
    """`sql` registers every fixture table as a view and runs arbitrary
    spark.sql, writing parquet with --out."""
    import json

    from i3cols_spark.cli import main

    out = str(tmp_path / "sqlout")
    rc = main([
        "sql",
        "SELECT lang, count(*) AS n FROM documents GROUP BY lang",
        "--sf-dir", "/root/testdata/sf0.001",
        "--out", out,
    ])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["written"] == out and payload["rows"] == 5


def test_cli_index_builds_and_is_idempotent(spark, sf_dir, capsys):
    """`index` must build the fingerprinted IVF index and print its
    location + nlist; a second call hits the cache (same path)."""
    import json

    from i3cols_spark.cli import main

    assert main(["--cpus", "4", "index", "--sf-dir", sf_dir]) in (0, None)
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["nlist"] > 0
    assert main(["--cpus", "4", "index", "--sf-dir", sf_dir]) in (0, None)
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["index"] == out1["index"]


def test_cli_vacuum_reclaims_snapshots(tmp_path):
    """`i3cols-spark vacuum <dir>` walks the arrowipc manifest protocol
    without paying for a Spark session and prints the reclaim stats."""
    import json
    import os

    import pyarrow as pa

    from i3cols_spark.sources.arrow_ipc import ArrowIPCWriter, _Committed

    root = str(tmp_path / "t")
    os.makedirs(root)
    for fname, overwrite in [("part-one.arrow", False), ("part-two.arrow", True)]:
        with pa.OSFile(os.path.join(root, fname), "wb") as s, pa.ipc.new_file(
            s, pa.schema([pa.field("k", pa.int64())])
        ) as w:
            w.write_table(pa.table({"k": [1]}))
        ArrowIPCWriter({"path": root}, None, overwrite=overwrite).commit(
            [_Committed(fname)]
        )
    r = subprocess.run(
        [sys.executable, "-m", "i3cols_spark.cli", "vacuum", root,
         "--retain-last", "1"],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 0, r.stderr
    stats = json.loads(r.stdout)
    assert stats == {"removed_manifests": 1, "removed_parts": 1,
                     "retained_versions": [2]}
    assert "part-one.arrow" not in os.listdir(root)
