import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from horizon_etl_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="horizon-etl-spark-tests",
        master=os.environ.get("SPARK_TEST_MASTER", "local[4]"),
        shuffle_partitions=8,
    )
    yield s
    s.stop()


@pytest.fixture()
def tmp_table_dir(tmp_path):
    return str(tmp_path)


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def assert_disjoint_bucket_ranges(table, require_split=False):
    """Every bucket's files must hold pairwise-disjoint, ordered key
    ranges — the clustered-compaction layout contract.  With
    ``require_split`` at least one bucket must actually hold >1 file
    (the rewrite really range-split something)."""
    from horizon_etl_spark.tables.lake import FileEntry

    by_bucket = {}
    for f in (FileEntry.from_json(j) for j in table.snapshot()["files"]):
        by_bucket.setdefault(f.bucket, []).append(f)
    if require_split:
        assert any(len(fs) > 1 for fs in by_bucket.values())
    for fs in by_bucket.values():
        fs.sort(key=lambda f: f.min_key)
        for a, b in zip(fs, fs[1:]):
            assert a.max_key < b.min_key
    return by_bucket
