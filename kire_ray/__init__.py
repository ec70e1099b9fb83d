"""kire_ray — a Ray-Data-native knowledge-graph-construction engine.

Re-expresses the data-processing capabilities of nju-websoft/KIRE
(document-level relation extraction with entity knowledge injection,
reference at /root/reference) as streaming Ray Data pipelines over
Parquet transcript shards ``(conv_id, turn_idx, role, text, tool, ts)``.

Design rules (see SURVEY.md §7):
- every stage is a ``Dataset`` transform (``map_batches`` over Arrow /
  pandas batches); stateful stages are actor pools;
- no stage calls ``ray.init()`` / ``ray.shutdown()`` — sessions are
  owned by bench.py / CLI entry points / the test fixture;
- wide operations (groupby / sort) are explicit and keyed; small side
  tables are broadcast via ``ray.put``, never re-shipped per batch.
"""

__version__ = "0.1.0"
