"""process_cached (stages/taskpool.py): instance reuse, key isolation
between configurations, and broadcast-ref identity keying. (The
distributed path is exercised end-to-end by every flagship/subword/
minhash test — this covers the cache contract itself; classes defined
in test modules aren't importable by Ray workers, so these run the
returned callable driver-side, which executes the identical code.)"""
import pandas as pd

import ray

from kire_ray.stages.taskpool import _CACHE, process_cached


class CountingStage:
    def __init__(self, tag: str = "a", ref=None):
        self.tag = tag
        self.extra = ray.get(ref) if ref is not None else ""

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["tag"] = self.tag + self.extra
        return b


def test_process_cached_reuses_and_isolates(ray_session):
    df = pd.DataFrame({"x": [1, 2, 3]})

    fn_a = process_cached(CountingStage, tag="a")
    fn_a2 = process_cached(CountingStage, tag="a")
    fn_b = process_cached(CountingStage, tag="b")

    _CACHE.clear()
    out = fn_a(df)
    assert (out["tag"] == "a").all()
    fn_a2(df)
    assert len(_CACHE) == 1  # same kwargs → same key → reused instance
    inst = next(iter(_CACHE.values()))
    fn_a(df)
    assert next(iter(_CACHE.values())) is inst  # not rebuilt
    fn_b(df)
    assert len(_CACHE) == 2  # different config → different instance

    # broadcast refs key by ref identity: the same ray.put ref reuses,
    # a fresh ray.put (even of equal content) builds a new instance —
    # exactly the per-corpus isolation the flagship stages need
    r1 = ray.put("x")
    f1 = process_cached(CountingStage, tag="c", ref=r1)
    f2 = process_cached(CountingStage, tag="c", ref=r1)
    f3 = process_cached(CountingStage, tag="c", ref=ray.put("x"))
    _CACHE.clear()
    f1(df)
    f2(df)
    assert len(_CACHE) == 1
    f3(df)
    assert len(_CACHE) == 2
    assert (f3(df)["tag"] == "cx").all()  # ref content reaches __init__
