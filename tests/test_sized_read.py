"""sized_read contract: the block-count override only ever engages
DOWNWARD (small tables), so at 100 TB Ray's byte-based splitting is
untouched."""

import numpy as np
import pandas as pd
import pytest

import ray

from kire_ray.sources.parquet import sized_read


@pytest.fixture(scope="module")
def small_parquet(tmp_path_factory):
    p = tmp_path_factory.mktemp("sr") / "t.parquet"
    pd.DataFrame({"a": np.arange(10_000), "b": np.arange(10_000)}).to_parquet(p)
    return str(p)


def test_small_table_gets_few_blocks(ray_session, small_parquet):
    ds = sized_read(small_parquet, ["a"], rows_per_block=4096)
    # 10k rows / 4096 + 1 = 3 blocks, far below the CPU-derived default
    m = ds.materialize()
    assert m.num_blocks() <= 4
    assert m.count() == 10_000
    # column pruning still applies
    assert m.schema().names == ["a"]


def test_large_table_keeps_ray_default(small_parquet, monkeypatch):
    """When the row-derived target meets the CPU default, sized_read
    must NOT pass override_num_blocks — big inputs keep Ray's
    byte-based splitting (spied, no execution)."""
    import kire_ray.sources.parquet as P

    calls = {}

    def spy_read(path, columns=None, **kw):
        calls.update(kw)
        return "DS"

    monkeypatch.setattr(P.ray.data, "read_parquet", spy_read)
    monkeypatch.setattr(P, "_nrows", lambda path: 10_000_000_000)
    assert P.sized_read(small_parquet, rows_per_block=65536) == "DS"
    assert "override_num_blocks" not in calls

    # and a small table DOES get the override, floored at min_blocks
    calls.clear()
    monkeypatch.setattr(P, "_nrows", lambda path: 100)
    P.sized_read(small_parquet, rows_per_block=65536)
    assert calls.get("override_num_blocks") == 2
