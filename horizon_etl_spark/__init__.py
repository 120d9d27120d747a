"""horizon_etl_spark — a PySpark-native CDC / incremental-ingest engine.

Brand-new implementation (NOT a port) reproducing the semantics of the
reference `ifesserra-lab/horizon_etl` (see SURVEY.md): change capture,
(doc_id, lsn) dedup, last-writer-wins keyed upsert, schema evolution,
quarantine/dead-letter, per-batch lineage + per-partition metrics, and
exactly-once replay — re-expressed as DataFrame/Catalyst plans over an
ACID snapshot table format (`horizon_etl_spark.tables.lake.LakeTable`).

Reference lifecycle being reproduced (citations into /root/reference):
  - ingest path   src/flows/sigpesq/all.py:38-60 → cdc.apply.apply_batch
  - upsert sink   src/core/logic/initiative_handlers.py:54-106 → LakeTable.merge
  - LWW readback  src/core/logic/canonical_exporter.py:733-753 → cdc.lww
  - run tracking  src/tracking/recorder.py:91-127 → cdc.lineage
"""

__version__ = "0.1.0"
