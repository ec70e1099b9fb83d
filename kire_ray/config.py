"""Dataset profiles — the reference's per-corpus capacity constants.

One config surface for the DocRED / DWIE constant sets scattered through
the reference (/root/reference/ATLOP+KIRE/knowledge_injection_layer/
kg_data_loader.py:76-95: max_attr_len / max_entity_size / max_attr_size /
max_length / max_coref_mention_size / max_pair_cnt;
gen_coref_data.py:220-233: the same caps at coref-generation time;
GLRE+KIRE/data_processing/docRedProcess.py:7-9: max_length /
max_sen_length / max_sen_cnt). Stages take a profile instead of
hard-coding one corpus's numbers; caps are deterministic truncations in
emission order, matching the reference's fixed-size numpy rectangles.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class DatasetProfile:
    name: str
    max_len: int  # document length cap in (sub)words
    max_entity_size: int  # entities per document
    max_coref_mention_size: int  # coref mentions per document
    max_pair_cnt: int  # coref pairs per document
    max_attr_len: int  # attribute value length (tokens)
    max_attr_size: int  # attribute tokens per batch
    coref_top_k: int = 8  # scored partners kept per mention (gen_coref_data.py:40)


DOCRED = DatasetProfile(
    name="docred",
    max_len=512,
    max_entity_size=42,
    max_coref_mention_size=250,
    max_pair_cnt=3200,
    max_attr_len=128,
    max_attr_size=12000,
)

DWIE = DatasetProfile(
    name="dwie",
    max_len=1800,
    max_entity_size=100,
    max_coref_mention_size=800,
    max_pair_cnt=9000,
    max_attr_len=128,
    max_attr_size=15000,
)

PROFILES = {p.name: p for p in (DOCRED, DWIE)}


def profile(name: str) -> DatasetProfile:
    return PROFILES[name]


def tune_data_context(num_cpus: int | None = None) -> None:
    """Width-aware Ray Data executor tuning — call AFTER ray.init by
    whoever owns the session (bench.py, CLI scripts, scaling children;
    never at import, the driver owns its own session).

    Measured r5 on the fused flagship DAG (read → combine → exchange →
    link → score, 64×-sf0.1, packed segments):

    - 8 CPUs: op resource reservation throttles the deep operator
      chain to near-serial phases — 77.7 s with the default
      reservation vs 38.4 s without (the r1–r4 "super-linear scaling"
      ratios were exactly this artifact halving the narrow leg).
    - 32 CPUs: reservation HELPS (15.1 s vs 16.7 s) — with plenty of
      slots it keeps every stage of the pipeline resourced.

    Policy: disable reservation when the session is narrower than 16
    CPUs (fewer than ~2 slots per operator of the deepest DAG).
    """
    import ray
    import ray.data

    if num_cpus is None:
        try:
            num_cpus = int(ray.cluster_resources().get("CPU", 4))
        except Exception:
            num_cpus = 4
    # two-directional: DataContext is process-global, so a wide session
    # tuned after an earlier narrow one must get reservation BACK
    ctx = ray.data.DataContext.get_current()
    ctx.op_resource_reservation_enabled = num_cpus >= 16
