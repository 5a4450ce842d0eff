"""Deterministic smoke of the DML-sequence differ (scripts/
fuzz_dml_vs_duckdb.py): one fixed-seed randomized INSERT / ANSI-UPDATE /
DELETE / UPSERT-KEYED-ON sequence applied to a parquet target through
the SQL surface and mirrored into DuckDB, with full-state comparison
after every statement. Longer multi-seed sweeps run via the script."""
import sys


def test_dml_sequence_matches_duckdb(ray_session):
    sys.path.insert(0, "/root/repo/scripts")
    import fuzz_dml_vs_duckdb as F
    from qwery_ray.engine.session import QweryEngine

    sess = QweryEngine()
    bad = F.run_sequence(run=0, seed=7, steps=25, sess=sess)
    bad += F.run_sequence(run=1, seed=13, steps=25, sess=sess)
    assert bad == 0


def test_lake_sequence_matches_lww_oracle(ray_session):
    """Fixed-seed smoke of the lake-sequence differ (scripts/
    fuzz_lake_vs_oracle.py): multi-statement UPSERT INTO ... WITH LAKE
    with watermark resume, state checked after every transaction."""
    sys.path.insert(0, "/root/repo/scripts")
    import fuzz_lake_vs_oracle as L
    from qwery_ray.engine.session import QweryEngine

    sess = QweryEngine()
    assert L.run_sequence(run=0, seed=7, steps=8, sess=sess) == 0
